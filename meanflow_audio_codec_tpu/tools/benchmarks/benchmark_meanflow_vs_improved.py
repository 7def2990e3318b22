"""Mean-flow vs improved-mean-flow training dynamics (reference:
tools/benchmarks/benchmark_meanflow_vs_improved.py:19-26 — which compared
the torch reference strategies; here the comparison runs the real JAX
objectives through the fused train step).

Trains the same tiny conditional flow with each objective on a fixed
synthetic dataset and reports loss/mse trajectories plus steps/s. Emits one
JSON row per (objective, checkpoint-step).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def run_objective(name: str, steps: int, batch: int, dim: int,
                  seed: int = 0) -> list[dict]:
    from meanflow_audio_codec_tpu.models import ConditionalFlow, TrainState
    from meanflow_audio_codec_tpu.training import (
        FlowMatchingObjective,
        ImprovedMeanFlowObjective,
        MeanFlowObjective,
        make_train_step,
    )

    objective = {
        "flow_matching": FlowMatchingObjective,
        "mean_flow": MeanFlowObjective,
        "improved_mean_flow": ImprovedMeanFlowObjective,
    }[name]()
    model = ConditionalFlow(noise_dimension=dim, condition_dimension=32,
                            num_blocks=4, latent_dimension=16)
    key = jax.random.PRNGKey(seed)
    variables = model.init(key, jnp.ones((batch, dim)),
                           jnp.zeros((batch, 2)), method="init_all")
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              tx=optax.adam(1e-3))
    step = make_train_step(objective, donate=False)

    # fixed low-rank dataset: learnable by the tiny model
    rng = np.random.default_rng(seed)
    basis = rng.standard_normal((4, dim)).astype(np.float32)
    rows = []
    t0 = time.perf_counter()
    log_every = max(1, steps // 8)
    for i in range(steps):
        coeffs = rng.standard_normal((batch, 4)).astype(np.float32)
        x = jnp.asarray(coeffs @ basis)
        state, metrics = step(state, jax.random.fold_in(key, i), x)
        if (i + 1) % log_every == 0 or i == 0:
            rows.append({"objective": name, "step": i + 1,
                         "loss": round(float(metrics["loss"]), 5),
                         "mse": round(float(metrics["mse"]), 5)})
    elapsed = time.perf_counter() - t0
    rows.append({"objective": name, "steps_per_sec":
                 round(steps / elapsed, 2)})
    return rows


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=400)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--dim", type=int, default=32)
    parser.add_argument("--objectives", nargs="+",
                        default=["flow_matching", "mean_flow",
                                 "improved_mean_flow"])
    args = parser.parse_args(argv)
    for name in args.objectives:
        for row in run_objective(name, args.steps, args.batch, args.dim):
            print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
