"""Inspect optimized HLO: do int8 convolutions survive in the composed program?"""
import jax
import jax.numpy as jnp
import numpy as np
import re

from meanflow_audio_codec_tpu.models import ConditionalConvFlow
from meanflow_audio_codec_tpu.ops import MDCTConfig, MDCTTokenization

SR, W, SECS, CLIPS = 48000, 576, 10.0, 16
GEO = dict(num_blocks=8, channels=512, bottleneck_dim=1024, spatial=8,
           lift_channels=64)
tok = MDCTTokenization(config=MDCTConfig(window_size=W, normalize=True))
noise_dim = W * 2
model = ConditionalConvFlow(noise_dimension=noise_dim,
                            condition_dimension=256, latent_dimension=256,
                            quantized=True, dtype=jnp.bfloat16, **GEO)
init_x = jnp.zeros((4, noise_dim), dtype=jnp.float32)
params = model.init(jax.random.PRNGKey(0), init_x, jnp.zeros((4, 2)),
                    method="init_all")["params"]
audio = jnp.zeros((CLIPS, int(SR * SECS), 2), dtype=jnp.float32)


def codec(params, audio):
    tokens = tok.tokenize(audio)
    b, nf, width = tokens.shape
    frames = tokens.reshape(b * nf, width)
    latents = model.apply({"params": params}, frames, method="encode")
    t = jnp.ones((frames.shape[0], 1), dtype=frames.dtype)
    pair = jnp.concatenate([t, t], axis=-1)
    u = model.apply({"params": params}, frames, pair, latents)
    decoded = (frames - u.astype(frames.dtype)).reshape(b, nf, width)
    return tok.detokenize(decoded)


lowered = jax.jit(codec).lower(params, audio)
try:
    compiled = lowered.compile()
    text = compiled.as_text()
    src = "optimized"
except Exception as exc:
    print(f"compile/as_text failed: {type(exc).__name__}: {str(exc)[:200]}")
    text = lowered.as_text()
    src = "unoptimized"

convs = re.findall(r".*convolution.*", text)
dots = re.findall(r".*dot\(.*", text)
print(f"[{src}] {len(convs)} convolution lines, {len(dots)} dot lines")
for line in convs[:12]:
    print(line.strip()[:220])
print("--- dots ---")
for line in dots[:12]:
    print(line.strip()[:220])
# dtype histogram of conv/dot outputs
hist = {}
for line in convs + dots:
    m = re.match(r"\s*%?\S+ = (\S+?)\[", line)
    if m:
        hist[m.group(1)] = hist.get(m.group(1), 0) + 1
print("output dtype histogram:", hist)
