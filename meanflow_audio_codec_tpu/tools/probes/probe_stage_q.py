"""Probe: one ConvStage fwd at codec shapes, bf16 vs int8, plus pieces."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from meanflow_audio_codec_tpu.models.conv_flow import ConvStage
from meanflow_audio_codec_tpu.training.profiling import force_completion

B = 26640
KW = dict(noise_dimension=1024, condition_dimension=256, num_blocks=8,
          bottleneck_dim=1024, channels=512, spatial=8, lift_channels=64,
          dtype=jnp.bfloat16)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, 1024)), dtype=jnp.bfloat16)
cond = jnp.asarray(rng.standard_normal((B, 256)), dtype=jnp.bfloat16)


def bench(label, fn, *args):
    f = jax.jit(fn)
    force_completion(f(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args)
        force_completion(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.1f} ms", flush=True)
    return best


for q in (False, True):
    stage = ConvStage(quantized=q, **KW)
    params = stage.init(jax.random.PRNGKey(0), x[:4], cond[:4])
    bench(f"stage quantized={q}", lambda p, a, c, s=stage: s.apply(p, a, c),
          params, x, cond)

# pieces: the 3x3 conv alone at stage shapes
h = jnp.asarray(rng.standard_normal((B, 8, 8, 512)), dtype=jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((3, 3, 512, 512)) * 0.02,
                dtype=jnp.bfloat16)
dn = ("NHWC", "HWIO", "NHWC")


def conv_bf(h, k):
    return jax.lax.conv_general_dilated(h, k, (1, 1), "SAME",
                                        dimension_numbers=dn)


from meanflow_audio_codec_tpu.ops.quant import int8_conv_general_dilated


def conv_q(h, k):
    return int8_conv_general_dilated(h, k, (1, 1), "SAME",
                                     dimension_numbers=dn)


bench("conv3x3 bf16", conv_bf, h, k)
bench("conv3x3 int8(dyn)", conv_q, h, k)
