#!/usr/bin/env python
"""Standalone MNIST trial: improved-mean-flow ConvNeXt flow, 1-NFE sampling
(reference: meanflow_audio_codec/proj/mnist_trial/train.py — whose legacy
train_step wrapper crashed on an undefined jit symbol,
training_steps.py:64-74; this version runs the framework's fused step).

Run: python proj/mnist_trial/train.py [--steps 2000] [--workdir /tmp/mnist_trial]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--workdir", type=Path,
                        default=Path("outputs/mnist_trial"))
    args = parser.parse_args()

    from meanflow_audio_codec_tpu.data.mnist import load_mnist
    from meanflow_audio_codec_tpu.models import (
        ConditionalConvFlow,
        TrainState,
    )
    from meanflow_audio_codec_tpu.ops.sampling import sample_dual_time
    from meanflow_audio_codec_tpu.training import (
        ImprovedMeanFlowObjective,
        make_train_step,
    )
    from meanflow_audio_codec_tpu.training.logging import plot_samples

    model = ConditionalConvFlow(noise_dimension=784, condition_dimension=128,
                                num_blocks=4, latent_dimension=128,
                                dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((args.batch_size, 784))
    variables = jax.jit(lambda k: model.init(
        k, x0, jnp.zeros((args.batch_size, 2)), method="init_all"))(rng)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              tx=optax.adamw(1e-4, weight_decay=1e-4))

    train_iter, test_iter = load_mnist(args.batch_size, seed=0)
    step = make_train_step(ImprovedMeanFlowObjective(), donate=True)
    for i in range(args.steps):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, sub, jnp.asarray(next(train_iter)))
        if i % 100 == 0:
            print(f"step {i}: loss={float(metrics['loss']):.4f} "
                  f"mse={float(metrics['mse']):.4f}")

    # 1-NFE decode conditioned on held-out latents
    test_batch = jnp.asarray(next(test_iter))
    latents = state.apply_fn({"params": state.params}, test_batch,
                             method="encode")
    samples = sample_dual_time(state.apply_fn, 784, state.params,
                               jax.random.PRNGKey(1), latents, n_steps=1)
    args.workdir.mkdir(parents=True, exist_ok=True)
    plot_samples(np.asarray(samples[:16], dtype=np.float32),
                 args.workdir / "samples_1nfe.png")
    print(f"wrote {args.workdir / 'samples_1nfe.png'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
