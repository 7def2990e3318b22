"""Probe: int8 vs bf16 3x3 conv throughput on the v5e (8x8 grid, ch512)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from meanflow_audio_codec_tpu.training.profiling import force_completion

B, S, C = 8192, 8, 512
rng = np.random.default_rng(0)
x8 = jnp.asarray(rng.integers(-127, 127, (B, S, S, C), dtype=np.int8))
k8 = jnp.asarray(rng.integers(-127, 127, (3, 3, C, C), dtype=np.int8))
xbf = jnp.asarray(rng.standard_normal((B, S, S, C)), dtype=jnp.bfloat16)
kbf = jnp.asarray(rng.standard_normal((3, 3, C, C)), dtype=jnp.bfloat16)

dn = jax.lax.conv_dimension_numbers((B, S, S, C), (3, 3, C, C),
                                    ("NHWC", "HWIO", "NHWC"))


@jax.jit
def conv_i8(x, k):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    return (y >> 8).astype(jnp.int8)


@jax.jit
def conv_bf(x, k):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    return y.astype(jnp.bfloat16)


for name, fn, x, k in (("int8", conv_i8, x8, k8), ("bf16", conv_bf, xbf, kbf)):
    try:
        force_completion(fn(x, k))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(x, k)
            force_completion(out)
            best = min(best, time.perf_counter() - t0)
        flops = 2 * B * S * S * 9 * C * C
        print(f"{name}: {best*1e3:.2f} ms  {flops/best/1e12:.1f} T(FL)OP/s",
              flush=True)
    except Exception as exc:
        print(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:200]}",
              flush=True)
