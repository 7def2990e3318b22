"""Small U-Net-style conv flow
(reference: meanflow_audio_codec/models/simple_conv_flow.py:86-216).

down(avg_pool) x2 -> mid -> up(nearest resize) x2, each stage a FiLM-
conditioned conv block; registered as the 'simple_conv' architecture (the
reference shipped it unreachable from the config factory — fixed here).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from meanflow_audio_codec_tpu.models.blocks import FiLM, _adaln_norm
from meanflow_audio_codec_tpu.ops.embeddings import dual_time_embedding


class SimpleConvBlock(nn.Module):
    """Conv -> adaLN/FiLM -> GELU -> Conv with residual
    (reference simple_conv_flow.py:50-78)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, condition: jnp.ndarray) -> jnp.ndarray:
        residual = x
        h = nn.Conv(self.channels, kernel_size=(3, 3), padding="SAME",
                    dtype=self.dtype)(x)
        h = _adaln_norm(h)
        h = FiLM(self.channels, dtype=self.dtype)(h, condition)
        h = jax.nn.gelu(h, approximate=True)
        h = nn.Conv(self.channels, kernel_size=(3, 3), padding="SAME",
                    dtype=self.dtype)(h)
        if residual.shape[-1] != self.channels:
            residual = nn.Conv(self.channels, kernel_size=(1, 1),
                               dtype=self.dtype)(residual)
        return h + residual


class SimpleConvFlow(nn.Module):
    """U-Net-ish conditional flow over flat features
    (reference simple_conv_flow.py:86-216)."""

    noise_dimension: int
    condition_dimension: int
    num_blocks: int
    latent_dimension: int
    base_channels: int = 32
    dtype: Any = jnp.float32

    def setup(self) -> None:
        c = self.base_channels
        # no bias: latent_proj(zeros) must equal skipping it, so the CFG
        # unconditional paths (latents=None vs zero latents) coincide
        self.latent_proj = nn.Dense(self.condition_dimension, use_bias=False,
                                    dtype=self.dtype)
        self.encoder_head = nn.Dense(self.latent_dimension, dtype=self.dtype)
        self.down1 = SimpleConvBlock(c, dtype=self.dtype)
        self.down2 = SimpleConvBlock(2 * c, dtype=self.dtype)
        self.mid = SimpleConvBlock(2 * c, dtype=self.dtype)
        self.up2 = SimpleConvBlock(2 * c, dtype=self.dtype)
        self.up1 = SimpleConvBlock(c, dtype=self.dtype)
        self.skip_proj = nn.Conv(2 * c, kernel_size=(1, 1), dtype=self.dtype)
        self.out_conv = nn.Conv(1, kernel_size=(1, 1), dtype=self.dtype)
        spatial = math.isqrt(self.noise_dimension)
        self._square = spatial * spatial == self.noise_dimension
        if not self._square:
            # non-square widths lift to the nearest even square grid
            spatial = math.isqrt(self.noise_dimension - 1) + 1
            spatial += spatial % 2
            self.lift = nn.Dense(spatial * spatial, dtype=self.dtype)
            self.unlift = nn.Dense(self.noise_dimension, dtype=self.dtype)
        self._spatial = spatial

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, noise_dim] -> [B, latent_dim] (linear probe encoder)."""
        return self.encoder_head(x.astype(self.dtype))


    def init_all(self, x: jnp.ndarray, time: jnp.ndarray) -> jnp.ndarray:
        """Init helper: touches encoder + decoder so one ``model.init(key, x,
        time, method="init_all")`` creates every parameter (replaces the
        reference's dual-init + param-merge dance, trainers/train.py:241-262).
        """
        return self(x, time, self.encode(x))

    def __call__(self, x: jnp.ndarray, time: jnp.ndarray,
                 latents: jnp.ndarray | None = None) -> jnp.ndarray:
        cond = dual_time_embedding(
            time, self.condition_dimension).astype(self.dtype)
        if latents is not None:
            flat = latents.reshape(latents.shape[0], -1).astype(self.dtype)
            cond = cond + self.latent_proj(flat)
        h = x.astype(self.dtype)
        if not self._square:
            h = self.lift(h)
        spatial = self._spatial
        h = h.reshape(x.shape[0], spatial, spatial, 1)

        skip1 = self.down1(h, cond)
        h = nn.avg_pool(skip1, window_shape=(2, 2), strides=(2, 2))
        skip2 = self.down2(h, cond)
        h = nn.avg_pool(skip2, window_shape=(2, 2), strides=(2, 2))
        h = self.mid(h, cond)
        h = jax.image.resize(h, skip2.shape, method="nearest")
        h = self.up2(h + skip2, cond)
        h = jax.image.resize(
            h, skip1.shape[:3] + (h.shape[-1],), method="nearest")
        h = self.up1(h + self.skip_proj(skip1), cond)
        out = self.out_conv(h).reshape(x.shape[0], -1)
        if not self._square:
            out = self.unlift(out)
        return out
