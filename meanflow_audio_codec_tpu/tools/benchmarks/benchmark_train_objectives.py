"""Objective throughput benchmark (replaces the reference's stale torch
benchmark_meanflow_vs_improved.py): steps/s + per-step FLOPs for each of
AE / FM / MF / iMF on the same model, plus the convergence signal (MSE
trajectory) so training-dynamics comparisons stay possible."""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import optax

from meanflow_audio_codec_tpu.models import ConditionalFlow, TrainState
from meanflow_audio_codec_tpu.training import (
    AutoencoderObjective,
    FlowMatchingObjective,
    ImprovedMeanFlowObjective,
    MeanFlowObjective,
    make_train_step,
)
from meanflow_audio_codec_tpu.training.profiling import estimate_step_flops

OBJECTIVES = {
    "autoencoder": AutoencoderObjective,
    "flow_matching": FlowMatchingObjective,
    "mean_flow": MeanFlowObjective,
    "improved_mean_flow": ImprovedMeanFlowObjective,
}


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--noise-dim", type=int, default=784)
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--blocks", type=int, default=8)
    parser.add_argument("--steps", type=int, default=30)
    args = parser.parse_args(argv)

    model = ConditionalFlow(noise_dimension=args.noise_dim,
                            condition_dimension=128,
                            num_blocks=args.blocks, latent_dimension=256,
                            dtype=jnp.bfloat16)
    x0 = jnp.zeros((args.batch, args.noise_dim))
    variables = jax.jit(lambda k: model.init(
        k, x0, jnp.zeros((args.batch, 2)), method="init_all"))(
        jax.random.PRNGKey(0))
    data = jax.random.normal(jax.random.PRNGKey(1),
                             (args.batch, args.noise_dim))

    print(f"backend={jax.default_backend()} batch={args.batch} "
          f"dim={args.noise_dim} blocks={args.blocks}")
    for name, objective_cls in OBJECTIVES.items():
        state = TrainState.create(apply_fn=model.apply,
                                  params=variables["params"],
                                  tx=optax.adamw(1e-4))
        step = make_train_step(objective_cls(), donate=True)
        flops = estimate_step_flops(step, state, jax.random.PRNGKey(2), data)
        state, metrics = step(state, jax.random.PRNGKey(2), data)
        jax.block_until_ready(metrics["loss"])
        mses = []
        t0 = time.perf_counter()
        for i in range(args.steps):
            state, metrics = step(state, jax.random.fold_in(
                jax.random.PRNGKey(3), i), data)
            mses.append(metrics.get("mse", metrics["loss"]))
        jax.block_until_ready(metrics["loss"])
        wall = (time.perf_counter() - t0) / args.steps
        first, last = float(mses[0]), float(mses[-1])
        flops_str = (f" {flops/1e9:6.1f} GFLOP/step" if flops else "")
        print(f"{name:20s}: {1/wall:7.2f} steps/s{flops_str} | "
              f"mse {first:.4f} -> {last:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
