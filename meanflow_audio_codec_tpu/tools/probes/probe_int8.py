"""Probe: int8 vs bf16 matmul throughput on the v5e (tunnel-safe, tiny)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from meanflow_audio_codec_tpu.training.profiling import force_completion

N = 8192
rng = np.random.default_rng(0)
a8 = jnp.asarray(rng.integers(-127, 127, (N, N), dtype=np.int8))
b8 = jnp.asarray(rng.integers(-127, 127, (N, N), dtype=np.int8))
abf = jnp.asarray(rng.standard_normal((N, N)), dtype=jnp.bfloat16)
bbf = jnp.asarray(rng.standard_normal((N, N)), dtype=jnp.bfloat16)


@jax.jit
def mm_i8(a, b):
    x = a
    for _ in range(8):
        x = jax.lax.dot_general(
            x, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.int8)
    return x


@jax.jit
def mm_bf(a, b):
    x = a
    for _ in range(8):
        x = jax.lax.dot_general(
            x, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return x


for name, fn, a, b in (("int8", mm_i8, a8, b8), ("bf16", mm_bf, abf, bbf)):
    force_completion(fn(a, b))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(a, b)
        force_completion(out)
        best = min(best, time.perf_counter() - t0)
    flops = 8 * 2 * N**3
    print(f"{name}: {best*1e3:.2f} ms  {flops/best/1e12:.1f} T(FL)OP/s",
          flush=True)
