"""Audio loader benchmark (reference: tools/benchmarks/
benchmark_audio_loader.py + benchmark_prefetch.py): cold-start latency and
steady-state throughput of the streaming pipeline, prefetch on/off."""

from __future__ import annotations

import argparse
import tempfile
import time
from pathlib import Path

import numpy as np

from meanflow_audio_codec_tpu.data.audio import build_audio_pipeline, write_wav


def make_corpus(out_dir: Path, num_files: int = 8,
                seconds: float = 4.0) -> None:
    rng = np.random.default_rng(0)
    rate = 44100
    for i in range(num_files):
        audio = rng.uniform(-0.4, 0.4,
                            (int(seconds * rate), 2)).astype(np.float32)
        write_wav(out_dir / f"bench_{i:03d}.wav", audio, rate)


def bench(data_dir: Path, frame_size: int, batch_size: int, prefetch: int,
          warmup: int, timed: int) -> dict:
    pipeline = build_audio_pipeline(data_dir, frame_size=frame_size,
                                    batch_size=batch_size, prefetch=prefetch,
                                    buffer_size=8)
    t0 = time.perf_counter()
    first = next(pipeline)
    first_latency = time.perf_counter() - t0
    for _ in range(warmup):
        next(pipeline)
    t0 = time.perf_counter()
    for _ in range(timed):
        batch = next(pipeline)
    elapsed = time.perf_counter() - t0
    samples_per_batch = batch.shape[0] * batch.shape[1] * batch.shape[2]
    return {
        "first_batch_sec": first_latency,
        "batches_per_sec": timed / elapsed,
        "samples_per_sec": timed * samples_per_batch / elapsed,
    }


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", type=Path, default=None)
    parser.add_argument("--frame-size", type=int, default=65536)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--timed", type=int, default=50)
    args = parser.parse_args(argv)

    with tempfile.TemporaryDirectory() as tmp:
        data_dir = args.data_dir
        if data_dir is None or not Path(data_dir).exists():
            data_dir = Path(tmp)
            print("generating synthetic WAV corpus...")
            make_corpus(data_dir)
        for prefetch in (0, 2, 4):
            stats = bench(data_dir, args.frame_size, args.batch_size,
                          prefetch, args.warmup, args.timed)
            print(f"prefetch={prefetch}: first batch "
                  f"{stats['first_batch_sec']*1e3:7.1f} ms | "
                  f"{stats['batches_per_sec']:7.2f} batches/s | "
                  f"{stats['samples_per_sec']/1e6:8.2f} M samples/s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
