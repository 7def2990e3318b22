"""Codec-path RTF sweep over decoder geometries.

Companion to benchmark_conv_mfu (train-side): measures the *inference*
path — MDCT tokenize -> encode -> 1-NFE dual-time decode -> IMDCT — for
candidate ConvNeXt geometries at matched parameter scale, reporting
realtime factor (seconds of 48 kHz stereo audio processed per wall
second). The train-side sweep showed 8x8 grids at ch>=512 turn the 3x3
conv into a large-K MXU matmul; this sweep checks how much of that carries
to the encode+decode program that bench.py's headline RTF times.

Emits one JSON row per geometry.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 48000
WINDOW = 576
CLIP_SECONDS = 10.0


def bench_geometry(name: str, *, batch_clips: int = 16, iters: int = 10,
                   groups: int = 3, clip_seconds: float = CLIP_SECONDS,
                   quantized: bool = False, **model_kwargs) -> dict:
    from meanflow_audio_codec_tpu.models import ConditionalConvFlow
    from meanflow_audio_codec_tpu.ops import MDCTConfig, MDCTTokenization
    from meanflow_audio_codec_tpu.training.profiling import force_completion

    samples = int(SAMPLE_RATE * clip_seconds)
    tok = MDCTTokenization(config=MDCTConfig(window_size=WINDOW,
                                             normalize=True))
    noise_dim = WINDOW * 2
    model = ConditionalConvFlow(noise_dimension=noise_dim,
                                condition_dimension=256,
                                latent_dimension=256,
                                quantized=quantized,
                                dtype=jnp.bfloat16, **model_kwargs)

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((batch_clips, samples, 2)) * 0.3,
                        dtype=jnp.float32)
    init_x = jnp.zeros((4, noise_dim), dtype=jnp.float32)
    params = jax.jit(lambda k: model.init(
        k, init_x, jnp.zeros((4, 2)), method="init_all"))(
        jax.random.PRNGKey(0))["params"]

    @jax.jit
    def codec(params, audio):
        tokens = tok.tokenize(audio)
        b, nf, width = tokens.shape
        frames = tokens.reshape(b * nf, width)
        latents = model.apply({"params": params}, frames, method="encode")
        t = jnp.ones((frames.shape[0], 1), dtype=frames.dtype)
        pair = jnp.concatenate([t, t], axis=-1)  # full interval (1 -> 0)
        u = model.apply({"params": params}, frames, pair, latents)
        decoded = (frames - u.astype(frames.dtype)).reshape(b, nf, width)
        return tok.detokenize(decoded)

    force_completion(codec(params, audio))  # compile + settle
    walls = []
    for _ in range(groups):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = codec(params, audio)
        force_completion(out)
        walls.append((time.perf_counter() - t0) / iters)
    wall = min(walls)
    n_params = sum(int(np.size(p)) for p in jax.tree_util.tree_leaves(params))
    audio_seconds = batch_clips * clip_seconds
    return {"config": name, **model_kwargs, "quantized": quantized,
            "params_m": round(n_params / 1e6, 1),
            "wall_ms": round(wall * 1e3, 1),
            "rtf": round(audio_seconds / wall, 1)}


CONFIGS = {
    # bench.py round-1/2 flagship: 33x33-class dense grid at ch32
    "r1_flagship_ch32": dict(num_blocks=8, channels=32, bottleneck_dim=256),
    # the train-side winners, at inference scale
    "ch256_s8_lift32": dict(num_blocks=8, channels=256, bottleneck_dim=512,
                            spatial=8, lift_channels=32),
    # quality-run v1 geometry (+13.1 dB held-out SI-SNR at 30k steps,
    # outputs/imf_audio_quality) — the cheap end of the measured
    # quality/RTF frontier in documentation/performance.md
    "ch128_s16_lift16": dict(num_blocks=8, channels=128, bottleneck_dim=512,
                             spatial=16, lift_channels=16),
    "ch512_s8_lift64": dict(num_blocks=8, channels=512, bottleneck_dim=512,
                            spatial=8, lift_channels=64),
    "ch512_s8_lift64_bn1024": dict(num_blocks=8, channels=512,
                                   bottleneck_dim=1024, spatial=8,
                                   lift_channels=64),
    "ch1024_s8_lift64": dict(num_blocks=8, channels=1024, bottleneck_dim=512,
                             spatial=8, lift_channels=64),
}


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--configs", nargs="+", default=list(CONFIGS),
                        choices=list(CONFIGS))
    parser.add_argument("--batch-clips", type=int, default=16)
    parser.add_argument("--clip-seconds", type=float, default=CLIP_SECONDS)
    parser.add_argument("--quantized", action="store_true",
                        help="serve the decode matmuls/convs in dynamic "
                             "W8A8 int8 (ops/quant.py)")
    args = parser.parse_args(argv)
    for name in args.configs:
        try:
            row = bench_geometry(name, batch_clips=args.batch_clips,
                                 clip_seconds=args.clip_seconds,
                                 quantized=args.quantized,
                                 **CONFIGS[name])
        except Exception as exc:
            row = {"config": name,
                   "error": f"{type(exc).__name__}: {exc}"[:300]}
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
