"""Prefetch on/off ablation for the audio loader (reference:
tools/benchmarks/benchmark_prefetch.py:1-60).

One-pass decode+frame of a synthetic WAV corpus through the *Python* stage
pipeline (``native=False`` isolates the prefetch-thread effect from the C++
core, which has its own producer pool). Emits one JSON row per
configuration: ``{"prefetch": N, "n_files": F, "frames": K, "sec": S,
"frames_per_sec": R}``.
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time
from pathlib import Path

import numpy as np

from meanflow_audio_codec_tpu.data.audio import (
    audio_to_frames,
    glob_audio_files,
    load_audio_files,
    write_wav,
)


def make_corpus(out_dir: Path, num_files: int, seconds: float = 1.0) -> None:
    rng = np.random.default_rng(0)
    rate = 44100
    for i in range(num_files):
        audio = rng.uniform(-0.4, 0.4,
                            (int(seconds * rate), 2)).astype(np.float32)
        write_wav(out_dir / f"bench_{i:04d}.wav", audio, rate)


def bench(data_dir: Path, prefetch: int, frame_size: int) -> dict:
    files = glob_audio_files(data_dir, seed=42)
    stream = load_audio_files(files, prefetch=prefetch, loop=False)
    stream = audio_to_frames(stream, frame_size, seed=42)
    t0 = time.perf_counter()
    n_frames = sum(1 for _ in stream)
    elapsed = time.perf_counter() - t0
    return {
        "prefetch": prefetch,
        "n_files": len(files),
        "frames": n_frames,
        "sec": round(elapsed, 4),
        "frames_per_sec": round(n_frames / elapsed, 1),
    }


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data-dir", type=Path, default=None,
                        help="existing corpus; default: synthetic tmp corpus")
    parser.add_argument("--frame-size", type=int, default=16384)
    parser.add_argument("--file-counts", type=int, nargs="+",
                        default=[10, 50])
    parser.add_argument("--prefetch-levels", type=int, nargs="+",
                        default=[0, 1, 2, 4])
    args = parser.parse_args(argv)

    with tempfile.TemporaryDirectory() as tmp:
        for n_files in args.file_counts:
            if args.data_dir and Path(args.data_dir).exists():
                data_dir = Path(args.data_dir)
            else:
                data_dir = Path(tmp) / f"corpus_{n_files}"
                data_dir.mkdir()
                make_corpus(data_dir, n_files)
            for prefetch in args.prefetch_levels:
                row = bench(data_dir, prefetch, args.frame_size)
                print(json.dumps(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
