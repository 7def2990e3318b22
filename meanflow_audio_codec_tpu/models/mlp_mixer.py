"""MLP-Mixer flow + autoencoder family
(reference: meanflow_audio_codec/models/mlp_mixer.py).

``ConditionalMLPMixerFlow`` projects flat features to a token grid, runs
adaLN mixer blocks per decoder layer, and projects back with 1/num_blocks
residual scaling; latent conditioning is added into the adaLN condition
vector. The query-token encoder/decoder pair (``MLPMixerEncoder`` /
``MLPMixerDecoder``) aggregates context into learned latent query tokens and
reconstructs through learned output query tokens; ``MLPMixerAutoencoder``
composes them.

Design note (fix-by-design vs the reference): the reference's mixer flow has
*no* encoder, so the training loop's ``method="encode"`` latent path only
worked for the hard-coded MLP model (reference trainers/train.py:229). Here
the flow embeds an ``MLPMixerEncoder`` and exposes ``encode`` like every
other model family, producing [B, num_latent_tokens, latent_dim] tokens.
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from meanflow_audio_codec_tpu.models.blocks import MixerBlock
from meanflow_audio_codec_tpu.ops.embeddings import dual_time_embedding


class MixerStage(nn.Module):
    """One decoder layer: project flat -> token grid -> mixer -> flat,
    residual / num_blocks (reference mlp_mixer.py:102-163).

    The reference lift is ``Dense(noise_dim -> tokens * channels)`` with
    ``tokens = isqrt(noise_dim)^2`` — *quadratic* in the flat width (OOM
    above ~1k-dim features). ``factorized=True`` instead reshapes the flat
    feature into ``num_tokens`` natural tokens of width noise_dim/tokens and
    applies per-token Dense lifts — parameter cost linear in noise_dim, the
    codec-scale configuration.
    """

    noise_dimension: int
    condition_dimension: int
    num_blocks: int
    token_mix_dim: int = 2048
    channel_mix_dim: int = 2048
    num_channels: int = 16
    #: token count override; None -> isqrt(noise_dim)^2 (reference).
    num_tokens: int | None = None
    #: linear-cost lift: reshape to tokens + per-token Dense (see above).
    factorized: bool = False
    dtype: Any = jnp.float32

    def _token_count(self) -> int:
        if self.num_tokens is not None:
            return self.num_tokens
        spatial = math.isqrt(self.noise_dimension)
        return spatial * spatial

    @nn.compact
    def __call__(self, x: jnp.ndarray, condition: jnp.ndarray) -> jnp.ndarray:
        num_tokens = self._token_count()
        residual = x
        if self.factorized:
            if self.noise_dimension % num_tokens != 0:
                raise ValueError(
                    f"factorized MixerStage needs num_tokens ({num_tokens}) "
                    f"dividing noise_dimension ({self.noise_dimension})")
            width = self.noise_dimension // num_tokens
            h = x.reshape(x.shape[0], num_tokens, width)
            h = nn.Dense(self.num_channels, dtype=self.dtype)(h)
        else:
            h = nn.Dense(num_tokens * self.num_channels, dtype=self.dtype)(x)
            h = h.reshape(h.shape[0], num_tokens, self.num_channels)
        h = MixerBlock(
            token_mix_dim=self.token_mix_dim,
            channel_mix_dim=self.channel_mix_dim,
            num_channels=self.num_channels,
            num_tokens=num_tokens,
            condition_dim=self.condition_dimension,
            dtype=self.dtype,
        )(h, condition)
        if self.factorized:
            h = nn.Dense(width, dtype=self.dtype)(h)
            h = h.reshape(residual.shape[0], -1)
        else:
            h = nn.Dense(self.noise_dimension,
                         dtype=self.dtype)(h.reshape(residual.shape[0], -1))
        return h / self.num_blocks + residual


class MLPMixerEncoder(nn.Module):
    """Query-token encoder: context tokens ++ learned latent queries through
    one mixer block; the query rows become the latent
    (reference mlp_mixer.py:243-323)."""

    input_dim: int
    num_latent_tokens: int = 32
    latent_dim: int = 512
    num_context_tokens: int = 512
    token_mix_dim: int = 2048
    channel_mix_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        batch = x.shape[0]
        context = nn.Dense(self.num_context_tokens * self.latent_dim,
                           dtype=self.dtype)(x)
        context = context.reshape(batch, self.num_context_tokens, self.latent_dim)
        queries = self.param("latent_queries", nn.initializers.normal(0.02),
                             (self.num_latent_tokens, self.latent_dim))
        queries = jnp.broadcast_to(
            queries[None].astype(self.dtype),
            (batch, self.num_latent_tokens, self.latent_dim))
        condition_emb = self.param("condition_emb", nn.initializers.normal(0.02),
                                   (self.latent_dim,))
        condition = jnp.broadcast_to(condition_emb[None].astype(self.dtype),
                                     (batch, self.latent_dim))
        tokens = jnp.concatenate([context, queries], axis=1)
        tokens = MixerBlock(
            token_mix_dim=self.token_mix_dim,
            channel_mix_dim=self.channel_mix_dim,
            num_channels=self.latent_dim,
            num_tokens=self.num_context_tokens + self.num_latent_tokens,
            condition_dim=self.latent_dim,
            dtype=self.dtype,
        )(tokens, condition)
        return tokens[:, self.num_context_tokens:, :]


class MLPMixerDecoder(nn.Module):
    """Query-token decoder: latent tokens ++ learned output queries through
    one mixer block, projected to the output dim
    (reference mlp_mixer.py:326-405)."""

    output_dim: int
    num_latent_tokens: int = 32
    latent_dim: int = 512
    num_output_tokens: int = 512
    token_mix_dim: int = 2048
    channel_mix_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, latent_tokens: jnp.ndarray) -> jnp.ndarray:
        batch = latent_tokens.shape[0]
        queries = self.param("output_queries", nn.initializers.normal(0.02),
                             (self.num_output_tokens, self.latent_dim))
        queries = jnp.broadcast_to(
            queries[None].astype(self.dtype),
            (batch, self.num_output_tokens, self.latent_dim))
        condition_emb = self.param("condition_emb", nn.initializers.normal(0.02),
                                   (self.latent_dim,))
        condition = jnp.broadcast_to(condition_emb[None].astype(self.dtype),
                                     (batch, self.latent_dim))
        tokens = jnp.concatenate([latent_tokens.astype(self.dtype), queries],
                                 axis=1)
        tokens = MixerBlock(
            token_mix_dim=self.token_mix_dim,
            channel_mix_dim=self.channel_mix_dim,
            num_channels=self.latent_dim,
            num_tokens=self.num_latent_tokens + self.num_output_tokens,
            condition_dim=self.latent_dim,
            dtype=self.dtype,
        )(tokens, condition)
        out_tokens = tokens[:, self.num_latent_tokens:, :]
        return nn.Dense(self.output_dim,
                        dtype=self.dtype)(out_tokens.reshape(batch, -1))


class ConditionalMLPMixerFlow(nn.Module):
    """Mixer-architecture conditional flow (reference mlp_mixer.py:171-235)
    with an integrated query-token encoder."""

    noise_dimension: int
    condition_dimension: int
    num_blocks: int
    latent_dimension: int
    token_mix_dim: int = 2048
    channel_mix_dim: int = 2048
    num_channels: int = 16
    num_latent_tokens: int = 32
    #: encoder context/mixing sizes, kept modest: the encoder is one block.
    encoder_context_tokens: int = 64
    #: stage geometry (see MixerStage): linear-cost lifts for wide features.
    stage_tokens: int | None = None
    factorized_stages: bool = False
    dtype: Any = jnp.float32

    def setup(self) -> None:
        self.stages = [
            MixerStage(
                noise_dimension=self.noise_dimension,
                condition_dimension=self.condition_dimension,
                num_blocks=self.num_blocks,
                token_mix_dim=self.token_mix_dim,
                channel_mix_dim=self.channel_mix_dim,
                num_channels=self.num_channels,
                num_tokens=self.stage_tokens,
                factorized=self.factorized_stages,
                dtype=self.dtype,
            )
            for _ in range(self.num_blocks)
        ]
        # no bias: latent_proj(zeros) must equal skipping it, so the CFG
        # unconditional paths (latents=None vs zero latents) coincide
        self.latent_proj = nn.Dense(self.condition_dimension, use_bias=False,
                                    dtype=self.dtype)
        self.encoder = MLPMixerEncoder(
            input_dim=self.noise_dimension,
            num_latent_tokens=self.num_latent_tokens,
            latent_dim=self.latent_dimension,
            num_context_tokens=self.encoder_context_tokens,
            token_mix_dim=self.token_mix_dim // 4,
            channel_mix_dim=self.channel_mix_dim // 4,
            dtype=self.dtype,
        )

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, noise_dim] -> [B, num_latent_tokens, latent_dim]."""
        return self.encoder(x.astype(self.dtype))


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
        for stage in self.stages:
            h = stage(h, cond)
        return h


class MLPMixerAutoencoder(nn.Module):
    """Encoder + decoder composition (reference mlp_mixer.py:408-476)."""

    input_dim: int
    num_latent_tokens: int = 32
    latent_dim: int = 512
    num_context_tokens: int = 512
    num_output_tokens: int = 512
    token_mix_dim: int = 2048
    channel_mix_dim: int = 2048
    dtype: Any = jnp.float32

    def setup(self) -> None:
        self.encoder = MLPMixerEncoder(
            input_dim=self.input_dim,
            num_latent_tokens=self.num_latent_tokens,
            latent_dim=self.latent_dim,
            num_context_tokens=self.num_context_tokens,
            token_mix_dim=self.token_mix_dim,
            channel_mix_dim=self.channel_mix_dim,
            dtype=self.dtype,
        )
        self.decoder = MLPMixerDecoder(
            output_dim=self.input_dim,
            num_latent_tokens=self.num_latent_tokens,
            latent_dim=self.latent_dim,
            num_output_tokens=self.num_output_tokens,
            token_mix_dim=self.token_mix_dim,
            channel_mix_dim=self.channel_mix_dim,
            dtype=self.dtype,
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.encoder(x.astype(self.dtype)))

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.encoder(x.astype(self.dtype))

    def decode(self, latent_tokens: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(latent_tokens)
