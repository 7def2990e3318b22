"""Codec CLI: compress a WAV/AIFF file to a .macb bitstream and back.

The end-user surface of the trained codec (the reference stops at the
training/eval harness; this is the missing ffmpeg-shaped front end):

    python -m meanflow_audio_codec_tpu.tools.codec_cli encode song.wav \
        --workdir outputs/imf_audio_quality_v2 -o song.macb
    python -m meanflow_audio_codec_tpu.tools.codec_cli decode song.macb \
        --workdir outputs/imf_audio_quality_v2 -o recon.wav
    python -m meanflow_audio_codec_tpu.tools.codec_cli info song.macb

Encode runs tokenize -> encoder -> per-frame scalar quantization -> native
rANS entropy coding (ops/latent_quant.py); decode runs the 1-NFE dual-time
flow as the dequantization post-filter. Decoded audio carries the codec's
frame padding: its length is the frame-implied ``(nf-1)*hop + 2W`` — up to
one window longer than the input (standard codec encoder-delay behavior).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def _load_codec(workdir: str, quantized: bool = False):
    from meanflow_audio_codec_tpu.codec import AudioCodec
    return AudioCodec.from_workdir(workdir, quantized=quantized)


def _read_audio(path: Path) -> np.ndarray:
    from meanflow_audio_codec_tpu.data.audio import load_audio_file
    audio = load_audio_file(path, resample=True)  # any input rate
    if audio is None:
        raise SystemExit(f"cannot decode {path} (unsupported format)")
    return audio.T[None]  # (2, T) -> [1, T, 2]


def cmd_encode(args) -> int:
    codec = _load_codec(args.workdir)
    audio = _read_audio(Path(args.input))
    data = codec.encode_bytes(audio, bits=args.bits,
                              step_frac=args.latent_step)
    out = Path(args.output or Path(args.input).with_suffix(".macb"))
    out.write_bytes(data)
    seconds = audio.shape[1] / 44100.0
    kbps = len(data) * 8 / seconds / 1000.0
    print(f"{args.input}: {seconds:.1f}s -> {out} "
          f"({len(data)} bytes, {kbps:.1f} kbps)")
    return 0


def cmd_decode(args) -> int:
    import jax
    codec = _load_codec(args.workdir, quantized=args.quantized)
    from meanflow_audio_codec_tpu.data.audio import write_wav
    data = Path(args.input).read_bytes()
    audio = np.asarray(codec.decode_bytes(
        data, nfe=args.nfe, key=jax.random.PRNGKey(args.seed)))[0]
    out = Path(args.output or Path(args.input).with_suffix(".wav"))
    write_wav(out, audio)
    print(f"{args.input} -> {out} ({audio.shape[0] / 44100.0:.1f}s, "
          f"nfe={args.nfe})")
    return 0


def cmd_info(args) -> int:
    from meanflow_audio_codec_tpu.ops.latent_quant import describe_bitstream
    try:
        h = describe_bitstream(Path(args.input).read_bytes())
    except ValueError as exc:
        raise SystemExit(f"{args.input}: {exc}")
    print(f"{args.input}: MACB v{h['version']}, {h['bits']}-bit "
          f"{h['coding']} codes ({h['quantizer']}), batch={h['batch']} "
          f"frames={h['n_frames']} latent_dim={h['latent_dim']}, "
          f"{h['total_bytes']} bytes")
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="codec_cli", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    enc = sub.add_parser("encode", help="WAV/AIFF -> .macb bitstream")
    enc.add_argument("input")
    enc.add_argument("-o", "--output", default=None)
    enc.add_argument("--workdir", required=True,
                     help="trained run directory (config + checkpoints)")
    enc.add_argument("--bits", type=int, default=8, choices=(4, 8, 16))
    enc.add_argument("--latent-step", type=float, default=None,
                     help="rate-aware ECSQ mode (MACB v2): quantization "
                          "step as a fraction of the per-frame residual "
                          "std — the continuous rate/quality knob "
                          "(e.g. 1.0 ~ 98 kbps, 0.5 ~ 140 kbps, 0.15 ~ "
                          "215 kbps on the v2 codec); overrides --bits")
    enc.set_defaults(fn=cmd_encode)

    dec = sub.add_parser("decode", help=".macb bitstream -> WAV")
    dec.add_argument("input")
    dec.add_argument("-o", "--output", default=None)
    dec.add_argument("--workdir", required=True)
    dec.add_argument("--nfe", type=int, default=1,
                     help="decode steps (1 = the native operating point)")
    dec.add_argument("--seed", type=int, default=0,
                     help="PRNG seed for the stochastic transport")
    dec.add_argument("--quantized", action="store_true",
                     help="serve the decode int8 W8A8 (ops/quant.py)")
    dec.set_defaults(fn=cmd_decode)

    info = sub.add_parser("info", help="inspect a .macb header")
    info.add_argument("input")
    info.set_defaults(fn=cmd_info)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
