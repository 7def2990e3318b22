"""Synthesize an on-disk audio corpus from the synthetic families.

Writes N clips from the ``tonal`` or ``rich`` generator family
(data/audio.py) as WAV or FLAC files, producing a real file-based corpus
for `config.data_dir` training — the closest honest stand-in for the
reference's downloaded music corpus (reference tools/download_wavegen.py,
egress-blocked in this image). The FLAC path exercises the native
compressed-container decoder end-to-end.

    python -m meanflow_audio_codec_tpu.tools.make_corpus \
        --out-dir /tmp/corpus --family rich --num-clips 64 \
        --seconds 4.46 --format flac
"""

from __future__ import annotations

import argparse
from pathlib import Path

from meanflow_audio_codec_tpu.data.audio import (SYNTHETIC_FAMILIES,
                                                 TARGET_SAMPLE_RATE,
                                                 synthetic_pipeline_for_family,
                                                 write_wav)


def make_corpus(out_dir: Path, family: str = "tonal", num_clips: int = 64,
                seconds: float = 4.46, fmt: str = "wav",
                sample_rate: int = TARGET_SAMPLE_RATE,
                seed: int = 0) -> list[Path]:
    """Write ``num_clips`` stereo clips; returns the file paths."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    frame_size = int(seconds * sample_rate)
    batch = min(num_clips, 16)  # generator batch; keeps host memory bounded
    stream = synthetic_pipeline_for_family(
        family, seed=seed, frame_size=frame_size, batch_size=batch,
        sample_rate=sample_rate)
    if fmt == "flac":
        from meanflow_audio_codec_tpu.data.flac_write import write_flac_pcm16
        writer = write_flac_pcm16
    elif fmt == "wav":
        writer = write_wav
    else:
        raise ValueError(f"format must be wav or flac, got {fmt!r}")
    paths: list[Path] = []
    written = 0
    for clips in stream:  # [B, T, 2]
        for clip in clips:
            path = out_dir / f"{family}_{written:05d}.{fmt}"
            writer(path, clip, sample_rate)
            paths.append(path)
            written += 1
            if written >= num_clips:
                return paths
    return paths


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out-dir", type=Path, required=True)
    parser.add_argument("--family", default="tonal",
                        choices=sorted(SYNTHETIC_FAMILIES))
    parser.add_argument("--num-clips", type=int, default=64)
    parser.add_argument("--seconds", type=float, default=4.46)
    parser.add_argument("--format", dest="fmt", default="wav",
                        choices=("wav", "flac"))
    parser.add_argument("--sample-rate", type=int,
                        default=TARGET_SAMPLE_RATE)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    paths = make_corpus(args.out_dir, args.family, args.num_clips,
                        args.seconds, args.fmt, args.sample_rate, args.seed)
    total_bytes = sum(p.stat().st_size for p in paths)
    print(f"Wrote {len(paths)} {args.fmt} clips ({args.family} family, "
          f"{args.seconds:.2f}s @ {args.sample_rate} Hz) to {args.out_dir} "
          f"({total_bytes / 1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
