"""Streaming-serving benchmark: per-chunk latency + RTF of the duplex path.

benchmark_codec_geometry measures offline (whole-clip) RTF; this measures
the *serving* story (streaming.py): push a fixed-size chunk through
StreamingCodec (encode -> 1-NFE decode -> overlap-add emit) and force a
host read per push — the honest per-chunk wall latency a realtime caller
sees, including the algorithmic 2W-hop lookahead.

Reports, per (geometry, chunk length): steady-state push wall (median),
streaming RTF (chunk seconds / push wall), and the realtime headroom
ratio wall/chunk (must be < 1 to keep up with a live stream). Emits one
JSON row per combination.
"""

from __future__ import annotations

import argparse
import json
import time
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 48000
WINDOW = 576

GEOMETRIES = {
    # the measured quality/RTF frontier endpoints
    # (documentation/performance.md): v2 quality geometry and the light
    # ch256 profile
    "quality_ch512_bn1024": dict(num_blocks=8, channels=512,
                                 bottleneck_dim=1024, spatial=8,
                                 lift_channels=64),
    "light_ch256": dict(num_blocks=8, channels=256, bottleneck_dim=512,
                        spatial=8, lift_channels=32),
}


def _build_codec(name: str, **model_kwargs):
    """An AudioCodec over fresh params (timing needs geometry, not a
    trained checkpoint)."""
    from meanflow_audio_codec_tpu.codec import AudioCodec
    from meanflow_audio_codec_tpu.configs import (
        BaseConfig, DatasetConfig, MethodConfig, ModelConfig,
        TrainFlowConfig, TrainingConfig,
    )
    from meanflow_audio_codec_tpu.models import ConditionalConvFlow

    noise_dim = WINDOW * 2
    latent_dim = 256
    model = ConditionalConvFlow(noise_dimension=noise_dim,
                                condition_dimension=256,
                                latent_dimension=latent_dim,
                                dtype=jnp.bfloat16, **model_kwargs)
    params = jax.jit(lambda k: model.init(
        k, jnp.zeros((4, noise_dim)), jnp.zeros((4, 2)),
        method="init_all"))(jax.random.PRNGKey(0))["params"]
    config = TrainFlowConfig(
        base=BaseConfig(batch_size=1, n_steps=1, base_lr=1e-4,
                        weight_decay=0.0, seed=0),
        model=ModelConfig(noise_dimension=noise_dim,
                          condition_dimension=256,
                          latent_dimension=latent_dim, num_blocks=8),
        dataset=DatasetConfig(dataset="audio",
                              tokenization_strategy="mdct",
                              tokenization_config={
                                  "window_size": WINDOW,
                                  "normalize": True,
                              }),
        method=MethodConfig(method="improved_mean_flow",
                            use_improved_mean_flow=True),
        training=TrainingConfig(sample_every=1000, sample_seed=0,
                                sample_steps=1,
                                workdir="/tmp/bench_streaming"),
    )
    state = SimpleNamespace(apply_fn=model.apply, params=params,
                            ema_params=None)
    n_params = sum(int(np.size(p)) for p in jax.tree_util.tree_leaves(params))
    return AudioCodec(state, model, config), n_params


def bench_streaming(name: str, chunk_seconds: float, *, pushes: int = 32,
                    **model_kwargs) -> dict:
    from meanflow_audio_codec_tpu.training.profiling import force_completion

    codec, n_params = _build_codec(name, **model_kwargs)
    duplex = codec.streaming(key=jax.random.PRNGKey(0))
    hop = duplex.encoder.hop
    chunk = max(hop, int(SAMPLE_RATE * chunk_seconds) // hop * hop)
    rng = np.random.default_rng(0)
    make = lambda: jnp.asarray(  # noqa: E731
        rng.standard_normal((1, chunk, 2)) * 0.3, dtype=jnp.float32)

    # compile + reach steady state (the first pushes emit fewer frames —
    # possibly zero while the encoder fills its 2W lookahead)
    for _ in range(3):
        out = duplex.push(make())
        if out.size:
            force_completion(out)
    walls = []
    for _ in range(pushes):
        x = make()
        t0 = time.perf_counter()
        out = duplex.push(x)
        force_completion(out)
        walls.append(time.perf_counter() - t0)
    wall = float(np.median(walls))
    chunk_s = chunk / SAMPLE_RATE
    return {"config": name, "params_m": round(n_params / 1e6, 1),
            "chunk_ms": round(chunk_s * 1e3, 1),
            "push_wall_ms": round(wall * 1e3, 2),
            "p90_wall_ms": round(float(np.quantile(walls, 0.9)) * 1e3, 2),
            "streaming_rtf": round(chunk_s / wall, 1),
            "realtime_load": round(wall / chunk_s, 4),
            "latency_ms": round(duplex.latency_samples / SAMPLE_RATE * 1e3,
                                1)}


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--configs", nargs="+", default=list(GEOMETRIES),
                        choices=list(GEOMETRIES))
    parser.add_argument("--chunk-seconds", nargs="+", type=float,
                        default=[0.02, 0.1, 1.0])
    parser.add_argument("--pushes", type=int, default=32)
    args = parser.parse_args(argv)
    for name in args.configs:
        for chunk_s in args.chunk_seconds:
            try:
                row = bench_streaming(name, chunk_s, pushes=args.pushes,
                                      **GEOMETRIES[name])
            except Exception as exc:
                row = {"config": name, "chunk_seconds": chunk_s,
                       "error": f"{type(exc).__name__}: {exc}"[:300]}
            print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
