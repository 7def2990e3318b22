"""Audio decoder-backend comparison (reference: tools/benchmarks/
benchmark_mp3_loaders.py — np3 vs librosa vs pymp3 vs minimp3py).

The rebuild's decode surface is WAV-first (zero-egress corpus) with MP3
optional, so the comparison is across the decode backends this framework
can actually route to: the stdlib ``wave`` parser (data/audio.py:44), the
native C++ parser (native/dataloader.cpp via data/native.py), and any
optional third-party decoders present in the environment (minimp3py,
soundfile, librosa — all gated on import, as the reference gates
minimp3py). Emits one JSON row per backend:
``{"backend": B, "files": N, "sec": T, "files_per_sec": R,
"msamples_per_sec": S}`` (+ ``{"backend": B, "skipped": reason}`` rows).
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time
from pathlib import Path
from typing import Callable

import numpy as np

from meanflow_audio_codec_tpu.data.audio import glob_audio_files, write_wav
from meanflow_audio_codec_tpu.tools.benchmarks.benchmark_pipeline_stages import (
    make_corpus,
)


def _decode_stdlib_wave(path: Path) -> int:
    from meanflow_audio_codec_tpu.data.audio import _decode_wav
    audio, _ = _decode_wav(path)
    return audio.size


def _decode_native_cpp(path: Path) -> int:
    from meanflow_audio_codec_tpu.data.native import decode_wav_native
    decoded = decode_wav_native(path)
    if decoded is None:
        raise RuntimeError("native loader core unavailable")
    return decoded[0].size


def _decode_minimp3(path: Path) -> int:
    import minimp3py
    data, _ = minimp3py.read(str(path))
    return int(np.asarray(data).size)


def _decode_sdl_mixer(path: Path) -> int:
    from meanflow_audio_codec_tpu.data.audio import _decode_mp3_sdl
    decoded = _decode_mp3_sdl(path)
    if decoded is None:
        raise RuntimeError("SDL_mixer (pygame) unavailable")
    return decoded[0].size


#: real MP3 asset baked into the image (pygame example data); used when a
#: corpus has no .mp3 files, since this image cannot encode MP3.
IN_IMAGE_MP3 = Path("/opt/venv/lib/python3.12/site-packages/pygame/"
                    "examples/data/house_lo.mp3")


def _decode_soundfile(path: Path) -> int:
    import soundfile
    data, _ = soundfile.read(str(path), dtype="float32")
    return int(np.asarray(data).size)


def _decode_librosa(path: Path) -> int:
    import librosa
    data, _ = librosa.load(str(path), sr=None, mono=False)
    return int(np.asarray(data).size)


#: backend name -> (decode fn, file suffix it handles)
BACKENDS: dict[str, tuple[Callable[[Path], int], str]] = {
    "stdlib_wave": (_decode_stdlib_wave, ".wav"),
    "native_cpp": (_decode_native_cpp, ".wav"),
    "native_cpp_flac": (_decode_native_cpp, ".flac"),
    "soundfile": (_decode_soundfile, ".wav"),
    "librosa": (_decode_librosa, ".wav"),
    "minimp3py": (_decode_minimp3, ".mp3"),
    "sdl_mixer": (_decode_sdl_mixer, ".mp3"),
}


def bench_backend(name: str, files: list[Path], repeats: int) -> dict:
    fn, suffix = BACKENDS[name]
    files = [f for f in files if f.suffix.lower() == suffix]
    if not files:
        return {"backend": name, "skipped": f"no {suffix} files"}
    try:
        samples = fn(files[0])  # warm caches / fail fast on missing deps
    except Exception as exc:
        return {"backend": name, "skipped": f"{type(exc).__name__}: {exc}"}
    t0 = time.perf_counter()
    total = 0
    for _ in range(repeats):
        for f in files:
            total += fn(f)
    elapsed = time.perf_counter() - t0
    n = repeats * len(files)
    return {"backend": name, "files": n, "sec": round(elapsed, 4),
            "files_per_sec": round(n / max(elapsed, 1e-9), 1),
            "msamples_per_sec": round(total / max(elapsed, 1e-9) / 1e6, 2),
            "samples_per_file": samples}


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data-dir", type=Path, default=None,
                        help="existing corpus (default: synthetic WAVs)")
    parser.add_argument("--n-files", type=int, default=16)
    parser.add_argument("--seconds", type=float, default=2.0)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--backends", nargs="+", default=list(BACKENDS),
                        choices=list(BACKENDS))
    args = parser.parse_args(argv)

    with tempfile.TemporaryDirectory() as tmp:
        if args.data_dir and Path(args.data_dir).exists():
            data_dir = Path(args.data_dir)
        else:
            data_dir = Path(tmp)
            make_corpus(data_dir, args.n_files, seconds=args.seconds)
            if "native_cpp_flac" in args.backends:
                from meanflow_audio_codec_tpu.tools.make_corpus import (
                    make_corpus as make_family_corpus)
                make_family_corpus(data_dir, family="tonal",
                                   num_clips=args.n_files,
                                   seconds=args.seconds, fmt="flac")
        files = glob_audio_files(data_dir, seed=0)
        if (not any(f.suffix == ".mp3" for f in files)
                and IN_IMAGE_MP3.exists()):
            files = files + [IN_IMAGE_MP3]
        for name in args.backends:
            print(json.dumps(bench_backend(name, files, args.repeats)),
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
