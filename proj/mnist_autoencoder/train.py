#!/usr/bin/env python
"""Standalone MNIST autoencoder: MLPMixerAutoencoder reconstruction
(reference: meanflow_audio_codec/proj/mnist_autoencoder/train.py).

Run: python proj/mnist_autoencoder/train.py [--steps 1000]
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
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--workdir", type=Path,
                        default=Path("outputs/mnist_autoencoder"))
    args = parser.parse_args()

    from meanflow_audio_codec_tpu.data.mnist import load_mnist
    from meanflow_audio_codec_tpu.models import (
        MLPMixerAutoencoder,
        TrainState,
    )
    from meanflow_audio_codec_tpu.training import (
        AutoencoderObjective,
        make_train_step,
    )
    from meanflow_audio_codec_tpu.training.logging import plot_samples

    model = MLPMixerAutoencoder(input_dim=784, num_latent_tokens=16,
                                latent_dim=64, num_context_tokens=64,
                                num_output_tokens=64, token_mix_dim=256,
                                channel_mix_dim=256, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((args.batch_size, 784))))(rng)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              tx=optax.adamw(1e-4))

    train_iter, test_iter = load_mnist(args.batch_size, seed=0)
    step = make_train_step(AutoencoderObjective(direct_call=True),
                           donate=True)
    for i in range(args.steps):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, sub, jnp.asarray(next(train_iter)))
        if i % 100 == 0:
            print(f"step {i}: mse={float(metrics['mse']):.5f}")

    test_batch = jnp.asarray(next(test_iter))
    recon = state.apply_fn({"params": state.params}, test_batch)
    args.workdir.mkdir(parents=True, exist_ok=True)
    plot_samples(np.asarray(recon[:16], dtype=np.float32),
                 args.workdir / "reconstructions.png")
    final_mse = float(jnp.mean((recon - test_batch) ** 2))
    print(f"held-out reconstruction mse: {final_mse:.5f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
