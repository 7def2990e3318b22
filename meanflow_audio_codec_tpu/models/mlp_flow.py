"""MLP encoder-decoder flow (reference: meanflow_audio_codec/models/mlp_flow.py).

``ConditionalFlow`` compresses data to a flat latent and decodes noise
conditioned on (latent, t, h) through a stack of adaLN residual blocks, the
latent re-concatenated before every block. ``latents=None`` runs the
unconditional (zero-latent) path for classifier-free guidance.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from meanflow_audio_codec_tpu.models.blocks import MLP, ConditionalResidualBlock
from meanflow_audio_codec_tpu.ops.embeddings import dual_time_embedding


class MLPEncoder(nn.Module):
    """[B, input_dim] -> [B, latent_dim] via a single bottleneck MLP
    (reference mlp_flow.py:39-55)."""

    input_dimension: int
    latent_dimension: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = (self.input_dimension + self.latent_dimension) // 2
        return MLP(hidden, self.latent_dimension, dtype=self.dtype)(x)


class ConditionalFlow(nn.Module):
    """Autoencoder flow over flat features (reference mlp_flow.py:125-230)."""

    noise_dimension: int
    condition_dimension: int
    num_blocks: int
    latent_dimension: int
    dtype: Any = jnp.float32

    def setup(self) -> None:
        self.encoder = MLPEncoder(
            input_dimension=self.noise_dimension,
            latent_dimension=self.latent_dimension,
            dtype=self.dtype,
        )
        input_dim = self.latent_dimension + self.noise_dimension
        self.blocks = [
            ConditionalResidualBlock(
                input_dimension=input_dim,
                noise_dimension=self.noise_dimension,
                condition_dimension=self.condition_dimension,
                num_blocks=self.num_blocks,
                dtype=self.dtype,
            )
            for _ in range(self.num_blocks)
        ]

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, noise_dim] -> [B, latent_dim]."""
        return self.encoder(x.astype(self.dtype))


    def init_all(self, x: jnp.ndarray, time: jnp.ndarray) -> jnp.ndarray:
        """Init helper: touches encoder + decoder so one ``model.init(key, x,
        time, method="init_all")`` creates every parameter (replaces the
        reference's dual-init + param-merge dance, trainers/train.py:241-262).
        """
        return self(x, time, self.encode(x))

    def __call__(self, x: jnp.ndarray, time: jnp.ndarray,
                 latents: jnp.ndarray | None = None) -> jnp.ndarray:
        """Predict velocity at (x, t, h) given latents (None = unconditional).

        Args:
            x: [B, noise_dim] noised sample.
            time: [B, 2] columns (t, h = t - r).
            latents: [B, latent_dim] or None.
        """
        if latents is None:
            latents = jnp.zeros((x.shape[0], self.latent_dimension),
                                dtype=self.dtype)
        cond = dual_time_embedding(time, self.condition_dimension).astype(self.dtype)
        h = x.astype(self.dtype)
        latents = latents.astype(self.dtype)
        for block in self.blocks:
            h = block(jnp.concatenate([latents, h], axis=-1), cond)
        return h
