#!/usr/bin/env python
"""Benchmark: audio RTF (encode + 1-NFE decode) and iMF train throughput.

Prints ONE JSON line:
  {"metric": "audio_rtf_encode_1nfe_decode", "value": N,
   "unit": "x_realtime", "vs_baseline": N/200, ...extras}

vs_baseline is measured against the north-star target (>=200x realtime on
one v5e chip, BASELINE.md) because the reference publishes no RTF numbers;
extras carry the train-throughput comparison against the reference's only
measured training number (0.28 steps/s, iMF ConvFlow 7.26M params on an
M1 — BASELINE.md "iMF ConvFlow-MNIST training session").
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

SAMPLE_RATE = 48000
WINDOW = 576
SECONDS_PER_BATCH = 1.0
BATCH = 8  # batches of 1 s stereo clips

M1_TRAIN_STEPS_PER_SEC = 0.28  # reference measured baseline
RTF_TARGET = 200.0             # north-star target


def bench_codec_rtf() -> dict:
    """Encode + 1-NFE decode throughput for 48 kHz stereo audio."""
    from meanflow_audio_codec_tpu.models import ConditionalConvFlow
    from meanflow_audio_codec_tpu.ops import MDCTConfig, MDCTTokenization

    samples = int(SAMPLE_RATE * SECONDS_PER_BATCH)
    tok = MDCTTokenization(config=MDCTConfig(window_size=WINDOW,
                                             normalize=True))
    noise_dim = WINDOW * 2  # stereo frame token
    model = ConditionalConvFlow(noise_dimension=noise_dim,
                                condition_dimension=256, num_blocks=8,
                                latent_dimension=256, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((BATCH, samples, 2)) * 0.3,
                        dtype=jnp.float32)
    init_x = jnp.zeros((4, noise_dim), dtype=jnp.float32)
    params = jax.jit(lambda k: model.init(
        k, init_x, jnp.zeros((4, 2)), method="init_all"))(
        jax.random.PRNGKey(0))["params"]

    @jax.jit
    def codec(params, audio):
        tokens = tok.tokenize(audio)                    # [B, nf, 2W]
        b, nf, width = tokens.shape
        frames = tokens.reshape(b * nf, width)
        latents = model.apply({"params": params}, frames, method="encode")
        t = jnp.ones((frames.shape[0], 1), dtype=frames.dtype)
        pair = jnp.concatenate([t, t], axis=-1)          # interval (1 -> 0)
        u = model.apply({"params": params}, frames, pair, latents)
        decoded = (frames - u.astype(frames.dtype)).reshape(b, nf, width)
        return tok.detokenize(decoded)

    out = codec(params, audio)
    out.block_until_ready()  # compile
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = codec(params, audio)
    out.block_until_ready()
    wall = (time.perf_counter() - t0) / iters
    audio_seconds = BATCH * SECONDS_PER_BATCH
    rtf = audio_seconds / wall
    n_params = sum(int(np.size(p)) for p in jax.tree_util.tree_leaves(params))
    return {"rtf": rtf, "wall_per_batch_ms": wall * 1e3,
            "codec_params": n_params}


def bench_train_steps() -> dict:
    """iMF ConvNet training throughput at reference model scale (~7M)."""
    from meanflow_audio_codec_tpu.models import (
        ConditionalConvFlow,
        TrainState,
    )
    from meanflow_audio_codec_tpu.training import (
        ImprovedMeanFlowObjective,
        make_train_step,
    )

    noise_dim, batch = 784, 128
    model = ConditionalConvFlow(noise_dimension=noise_dim,
                                condition_dimension=128, num_blocks=8,
                                latent_dimension=256, dtype=jnp.bfloat16)
    x = jnp.zeros((batch, noise_dim), dtype=jnp.float32)
    variables = jax.jit(lambda k: model.init(
        k, x, jnp.zeros((batch, 2)), method="init_all"))(jax.random.PRNGKey(0))
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              tx=optax.adamw(1e-4))
    step = make_train_step(ImprovedMeanFlowObjective(), donate=True)
    data = jax.random.normal(jax.random.PRNGKey(1), (batch, noise_dim))
    key = jax.random.PRNGKey(2)

    state, metrics = step(state, key, data)  # compile
    jax.block_until_ready(metrics["loss"])
    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, jax.random.fold_in(key, i), data)
    jax.block_until_ready(metrics["loss"])
    wall = (time.perf_counter() - t0) / iters
    n_params = sum(int(np.size(p))
                   for p in jax.tree_util.tree_leaves(state.params))
    return {"train_steps_per_sec": 1.0 / wall, "train_params": n_params}


def main() -> None:
    codec = bench_codec_rtf()
    train = bench_train_steps()
    result = {
        "metric": "audio_rtf_encode_1nfe_decode",
        "value": round(codec["rtf"], 1),
        "unit": "x_realtime",
        "vs_baseline": round(codec["rtf"] / RTF_TARGET, 3),
        "train_steps_per_sec": round(train["train_steps_per_sec"], 2),
        "train_vs_m1_reference": round(
            train["train_steps_per_sec"] / M1_TRAIN_STEPS_PER_SEC, 1),
        "codec_params": codec["codec_params"],
        "train_params": train["train_params"],
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
