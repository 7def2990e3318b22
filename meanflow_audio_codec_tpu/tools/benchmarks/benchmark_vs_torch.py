"""Data-loader comparison vs a PyTorch DataLoader pipeline
(reference: tools/benchmarks/benchmark_audio_vs_torch.py +
documentation throughput_comparison.md — the reference measured its JAX
pipeline 1.80x faster than a torch/librosa loader on M1).

Compares three loaders over the same WAV corpus and frame contract:
  1. this framework's native C++ loader,
  2. this framework's Python pipeline,
  3. a torch.utils.data DataLoader with an IterableDataset doing the same
     decode + framing work.
"""

from __future__ import annotations

import argparse
import tempfile
import time
from pathlib import Path

import numpy as np


def make_corpus(out_dir: Path, num_files: int = 8,
                seconds: float = 4.0) -> None:
    from meanflow_audio_codec_tpu.data.audio import write_wav
    rng = np.random.default_rng(0)
    for i in range(num_files):
        audio = rng.uniform(-0.4, 0.4,
                            (int(seconds * 44100), 2)).astype(np.float32)
        write_wav(out_dir / f"bench_{i:03d}.wav", audio)


def bench_iterator(make_iter, warmup: int, timed: int) -> dict:
    t0 = time.perf_counter()
    iterator = make_iter()
    batch = next(iterator)
    first = time.perf_counter() - t0
    for _ in range(warmup):
        next(iterator)
    t0 = time.perf_counter()
    for _ in range(timed):
        batch = next(iterator)
    elapsed = time.perf_counter() - t0
    samples = batch.shape[0] * batch.shape[1] * batch.shape[2]
    return {"first_sec": first, "batches_per_sec": timed / elapsed,
            "samples_per_sec": timed * samples / elapsed}


def torch_loader(data_dir: Path, frame_size: int, batch_size: int):
    """torch DataLoader counterpart: decode + frame in an IterableDataset."""
    import torch
    from torch.utils.data import DataLoader, IterableDataset

    from meanflow_audio_codec_tpu.data.audio import load_audio_file

    files = sorted(data_dir.glob("*.wav"))

    class FrameDataset(IterableDataset):
        def __iter__(self):
            rng = np.random.default_rng(0)
            while True:
                for path in files:
                    audio = load_audio_file(path)
                    if audio is None:
                        continue
                    channels, length = audio.shape
                    offset = int(rng.integers(0, frame_size))
                    total = -(-(offset + length) // frame_size) * frame_size
                    buf = np.zeros((channels, total), dtype=np.float32)
                    buf[:, offset:offset + length] = audio
                    frames = buf.reshape(channels, -1, frame_size)
                    for i in range(frames.shape[1]):
                        yield torch.from_numpy(
                            np.ascontiguousarray(frames[:, i, :].T))

    loader = DataLoader(FrameDataset(), batch_size=batch_size, num_workers=0)
    for batch in loader:
        yield batch.numpy()


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", type=Path, default=None)
    parser.add_argument("--frame-size", type=int, default=65536)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--timed", type=int, default=30)
    args = parser.parse_args(argv)

    from meanflow_audio_codec_tpu.data import native
    from meanflow_audio_codec_tpu.data.audio import build_audio_pipeline

    with tempfile.TemporaryDirectory() as tmp:
        data_dir = args.data_dir
        if data_dir is None or not Path(data_dir).exists():
            data_dir = Path(tmp)
            print("generating synthetic WAV corpus...")
            make_corpus(data_dir)

        rows = []
        if native.available():
            rows.append(("native C++", lambda: build_audio_pipeline(
                data_dir, frame_size=args.frame_size,
                batch_size=args.batch_size, native=True)))
        rows.append(("python pipeline", lambda: build_audio_pipeline(
            data_dir, frame_size=args.frame_size,
            batch_size=args.batch_size, native=False)))
        try:
            import torch  # noqa: F401
            rows.append(("torch DataLoader", lambda: torch_loader(
                data_dir, args.frame_size, args.batch_size)))
        except ImportError:
            print("torch not installed; skipping DataLoader comparison")

        results = {}
        for name, make_iter in rows:
            stats = bench_iterator(make_iter, args.warmup, args.timed)
            results[name] = stats
            print(f"{name:18s}: first {stats['first_sec']*1e3:7.1f} ms | "
                  f"{stats['batches_per_sec']:7.2f} batches/s | "
                  f"{stats['samples_per_sec']/1e6:8.2f} M samples/s")
        if "native C++" in results and "torch DataLoader" in results:
            speedup = (results["native C++"]["samples_per_sec"]
                       / results["torch DataLoader"]["samples_per_sec"])
            print(f"native vs torch: {speedup:.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
