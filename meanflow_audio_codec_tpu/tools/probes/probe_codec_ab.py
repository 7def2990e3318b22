"""Same-process alternating A/B: codec RTF bf16 vs int8 (quality geometry)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from meanflow_audio_codec_tpu.models import ConditionalConvFlow
from meanflow_audio_codec_tpu.ops import MDCTConfig, MDCTTokenization
from meanflow_audio_codec_tpu.training.profiling import force_completion

SR, W, SECS, CLIPS = 48000, 576, 10.0, 16
GEO = dict(num_blocks=8, channels=512, bottleneck_dim=1024, spatial=8,
           lift_channels=64)

tok = MDCTTokenization(config=MDCTConfig(window_size=W, normalize=True))
noise_dim = W * 2
rng = np.random.default_rng(0)
audio = jnp.asarray(rng.standard_normal((CLIPS, int(SR * SECS), 2)) * 0.3,
                    dtype=jnp.float32)
init_x = jnp.zeros((4, noise_dim), dtype=jnp.float32)

fns = {}
params = None
for q in (False, True):
    model = ConditionalConvFlow(noise_dimension=noise_dim,
                                condition_dimension=256,
                                latent_dimension=256, quantized=q,
                                dtype=jnp.bfloat16, **GEO)
    if params is None:
        params = jax.jit(lambda k: model.init(
            k, init_x, jnp.zeros((4, 2)), method="init_all"))(
            jax.random.PRNGKey(0))["params"]

    @jax.jit
    def codec(params, audio, model=model):
        tokens = tok.tokenize(audio)
        b, nf, width = tokens.shape
        frames = tokens.reshape(b * nf, width)
        latents = model.apply({"params": params}, frames, method="encode")
        t = jnp.ones((frames.shape[0], 1), dtype=frames.dtype)
        pair = jnp.concatenate([t, t], axis=-1)
        u = model.apply({"params": params}, frames, pair, latents)
        decoded = (frames - u.astype(frames.dtype)).reshape(b, nf, width)
        return tok.detokenize(decoded)

    fns[q] = codec
    force_completion(codec(params, audio))

best = {False: float("inf"), True: float("inf")}
for round_i in range(4):
    for q in (False, True):
        t0 = time.perf_counter()
        for _ in range(5):
            out = fns[q](params, audio)
        force_completion(out)
        wall = (time.perf_counter() - t0) / 5
        best[q] = min(best[q], wall)
        print(f"round {round_i} q={q}: {wall*1e3:.1f} ms", flush=True)

secs = CLIPS * SECS
print(f"bf16 best {best[False]*1e3:.1f} ms rtf {secs/best[False]:.0f}; "
      f"int8 best {best[True]*1e3:.1f} ms rtf {secs/best[True]:.0f}; "
      f"speedup {best[False]/best[True]:.3f}x", flush=True)
