"""Audio decoder comparison (reference: tools/benchmarks/
benchmark_mp3_loaders.py — np3 vs librosa vs pymp3 vs minimp3py).

This image has no MP3 decoder libraries (zero egress), so the comparison
covers the decoders actually wired into the framework: the pure-Python WAV
parser, the native C++ parser, and any optional MP3 backend that imports
(minimp3py / librosa — skipped cleanly when absent, like the reference's
optional tiers). Emits one JSON row per decoder.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import tempfile
import time
from pathlib import Path

import numpy as np

from meanflow_audio_codec_tpu.data.audio import load_audio_file, write_wav


def make_corpus(out_dir: Path, num_files: int, seconds: float) -> list[Path]:
    rng = np.random.default_rng(0)
    rate = 44100
    files = []
    for i in range(num_files):
        audio = rng.uniform(-0.4, 0.4,
                            (int(seconds * rate), 2)).astype(np.float32)
        path = out_dir / f"bench_{i:04d}.wav"
        write_wav(path, audio, rate)
        files.append(path)
    return files


def bench_decoder(name: str, decode, files: list[Path],
                  repeats: int = 3) -> dict:
    # warmup (first call may build/compile)
    out = decode(files[0])
    if out is None:
        return {"decoder": name, "skipped": "decode returned None"}
    t0 = time.perf_counter()
    total_samples = 0
    for _ in range(repeats):
        for f in files:
            audio = decode(f)
            total_samples += audio.size
    elapsed = time.perf_counter() - t0
    return {"decoder": name, "files": len(files) * repeats,
            "sec": round(elapsed, 4),
            "msamples_per_sec": round(total_samples / elapsed / 1e6, 1)}


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data-dir", type=Path, default=None)
    parser.add_argument("--n-files", type=int, default=16)
    parser.add_argument("--seconds", type=float, default=4.0)
    args = parser.parse_args(argv)

    with tempfile.TemporaryDirectory() as tmp:
        if args.data_dir and Path(args.data_dir).exists():
            files = sorted(Path(args.data_dir).glob("*.wav"))
        else:
            files = make_corpus(Path(tmp), args.n_files, args.seconds)

        print(json.dumps(bench_decoder(
            "python_wave", lambda f: load_audio_file(f), files)))

        from meanflow_audio_codec_tpu.data import native
        if native.available():
            def native_decode(f):
                out = native.decode_wav_native(f)
                return out[0] if out else None
            print(json.dumps(bench_decoder("native_cpp", native_decode,
                                           files)))
        else:
            print(json.dumps({"decoder": "native_cpp",
                              "skipped": str(native.load_error())}))

        for mod in ("minimp3py", "librosa"):
            if importlib.util.find_spec(mod) is None:
                print(json.dumps({"decoder": mod,
                                  "skipped": "not installed"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
