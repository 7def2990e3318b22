"""Sampler latency benchmark: Heun vs dual-time across the NFE sweep
(reference harness uses NFE [1, 10, 50, 250], evaluate_all.py:115)."""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import optax

from meanflow_audio_codec_tpu.models import ConditionalFlow, TrainState
from meanflow_audio_codec_tpu.ops.sampling import sample, sample_dual_time


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--noise-dim", type=int, default=784)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--nfe", type=int, nargs="+",
                        default=[1, 10, 50, 250])
    args = parser.parse_args(argv)

    model = ConditionalFlow(noise_dimension=args.noise_dim,
                            condition_dimension=128, num_blocks=8,
                            latent_dimension=256, dtype=jnp.bfloat16)
    x0 = jnp.zeros((args.batch, args.noise_dim))
    variables = jax.jit(lambda k: model.init(
        k, x0, jnp.zeros((args.batch, 2)), method="init_all"))(
        jax.random.PRNGKey(0))
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=optax.sgd(0.1))
    latents = jnp.ones((args.batch, 256))
    key = jax.random.PRNGKey(1)

    print(f"backend={jax.default_backend()} batch={args.batch}")
    for nfe in args.nfe:
        for name, sampler in (("heun", sample), ("dual_time",
                                                 sample_dual_time)):
            out = sampler(state.apply_fn, args.noise_dim, state.params, key,
                          latents, n_steps=nfe)
            out.block_until_ready()
            t0 = time.perf_counter()
            iters = 5
            for _ in range(iters):
                out = sampler(state.apply_fn, args.noise_dim, state.params,
                              key, latents, n_steps=nfe)
            out.block_until_ready()
            wall = (time.perf_counter() - t0) / iters
            per_sample = wall / args.batch * 1e3
            print(f"nfe={nfe:4d} {name:10s}: {wall*1e3:8.2f} ms/batch "
                  f"({per_sample:6.3f} ms/sample)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
