"""ConvNeXt-architecture conditional flow
(reference: meanflow_audio_codec/models/conv_flow.py:123-271).

Each decoder layer lifts flat features through a bottleneck Dense into a
[B, S, S, C] grid, FiLM-modulates on the condition, runs a ConvNeXt(-V2 GRN)
block, and projects back with 1/num_blocks residual scaling. Latent
conditioning is added into the condition vector.

Fix-by-design vs the reference: carries an integrated conv encoder so
``encode`` works for the convnet architecture too (the reference factory's
convnet branch crashed on an unknown ``base_channels`` argument and had no
encoder at all, factories.py:59-66).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from meanflow_audio_codec_tpu.models.blocks import (
    ConvNeXtBlock,
    FiLM,
    _adaln_norm,
    quant_injection,
)
from meanflow_audio_codec_tpu.ops.embeddings import dual_time_embedding


class ConvStage(nn.Module):
    """One decoder layer: Dense bottleneck -> spatial grid -> FiLM ->
    ConvNeXt block -> Dense back (reference conv_flow.py:123-205).

    TPU geometry knobs (no reference counterpart — the reference hardcoded
    ``isqrt(noise_dim)`` grids and a parameter-quadratic dense lift):

      * ``spatial`` decouples the internal grid side from the token width,
        so production configs use MXU/lane-aligned grids (32 instead of 33).
      * ``lift_channels`` factorises the grid lift: Dense emits a *thin*
        [S, S, c0] grid and a 1x1 conv (position-shared) expands c0 -> C.
        The dense lift costs bottleneck x S^2 x C params per stage (the
        single-chip 1.2B wall at C=128); the factorised lift costs
        bottleneck x S^2 x c0 + c0 x C — ~C/c0 x fewer.
    """

    noise_dimension: int
    condition_dimension: int
    num_blocks: int
    use_grn: bool = True
    bottleneck_dim: int = 128
    #: None -> reference formula min(16, cond_dim // 4) (conv_flow.py:139).
    #: The 16-channel cap starves the MXU; production codec configs set this
    #: explicitly (see factories.create_conv_flow(channels=...)).
    channels: int | None = None
    #: grid side; None -> isqrt(noise_dimension) (reference behavior).
    spatial: int | None = None
    #: None -> dense lift (reference); int c0 -> factorised lift via 1x1.
    lift_channels: int | None = None
    #: fuse the norm/FiLM/GELU/GRN segments into Pallas kernels
    #: (ops/stage_pallas.py); XLA fallback off-TPU — numerics preserved.
    fused_stage: bool = False
    #: dynamic W8A8 int8 matmuls/convs for serving (ops/quant.py);
    #: inference-only — the trainer rejects it.
    quantized: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, condition: jnp.ndarray) -> jnp.ndarray:
        spatial = (self.spatial if self.spatial is not None
                   else math.isqrt(self.noise_dimension))
        channels = (self.channels if self.channels is not None
                    else min(16, self.condition_dimension // 4))
        qdense, qconv = quant_injection(self.quantized)
        residual = x
        h = nn.Dense(self.bottleneck_dim, dtype=self.dtype, **qdense)(x)
        h = jax.nn.gelu(h, approximate=True)
        if self.lift_channels is not None:
            c0 = self.lift_channels
            h = nn.Dense(spatial * spatial * c0, dtype=self.dtype,
                         **qdense)(h)
            h = h.reshape(h.shape[0], spatial, spatial, c0)
            h = nn.Conv(channels, kernel_size=(1, 1), dtype=self.dtype,
                        **qconv)(h)
        else:
            h = nn.Dense(spatial * spatial * channels, dtype=self.dtype,
                         **qdense)(h)
            h = h.reshape(h.shape[0], spatial, spatial, channels)
        if self.fused_stage:
            h = FiLM(channels, fuse_norm=True, dtype=self.dtype)(h, condition)
        else:
            h = _adaln_norm(h)
            h = FiLM(channels, dtype=self.dtype)(h, condition)
        h = ConvNeXtBlock(dim=channels, use_grn=self.use_grn,
                          fused_stage=self.fused_stage,
                          quantized=self.quantized,
                          dtype=self.dtype)(h)
        if self.lift_channels is not None:
            h = nn.Conv(self.lift_channels, kernel_size=(1, 1),
                        dtype=self.dtype, **qconv)(h)
        h = h.reshape(residual.shape[0], -1)
        h = nn.Dense(self.bottleneck_dim, dtype=self.dtype, **qdense)(h)
        h = jax.nn.gelu(h, approximate=True)
        h = nn.Dense(self.noise_dimension, dtype=self.dtype, **qdense)(h)
        return h / self.num_blocks + residual


class ConvEncoder(nn.Module):
    """Strided-conv encoder: [B, noise_dim] -> [B, latent_dim].

    Two stride-2 ConvNeXt-ish stages then a Dense head — the conv-native
    counterpart of MLPEncoder for the convnet family.
    """

    noise_dimension: int
    latent_dimension: int
    base_channels: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        spatial = math.isqrt(self.noise_dimension)
        h = x.astype(self.dtype)
        if spatial * spatial != self.noise_dimension:
            # non-square widths (e.g. MDCT frame tokens) lift to the nearest
            # square grid through a Dense projection
            spatial = math.isqrt(self.noise_dimension - 1) + 1
            h = nn.Dense(spatial * spatial, dtype=self.dtype)(h)
        h = h.reshape(x.shape[0], spatial, spatial, 1)
        for i, channels in enumerate(
                (self.base_channels, 2 * self.base_channels)):
            h = nn.Conv(channels, kernel_size=(3, 3), strides=(2, 2),
                        padding="SAME", dtype=self.dtype)(h)
            h = _adaln_norm(h)
            h = jax.nn.gelu(h, approximate=True)
        return nn.Dense(self.latent_dimension,
                        dtype=self.dtype)(h.reshape(h.shape[0], -1))


class ConditionalConvFlow(nn.Module):
    """Conditional flow with ConvNeXt decoder layers
    (reference conv_flow.py:213-271)."""

    noise_dimension: int
    condition_dimension: int
    num_blocks: int
    latent_dimension: int
    image_size: int = 28
    use_grn: bool = True
    num_latent_tokens: int = 32
    channels: int | None = None
    bottleneck_dim: int = 128
    #: internal grid side / factorised-lift width (see ConvStage docstring).
    spatial: int | None = None
    lift_channels: int | None = None
    #: fused Pallas stage kernels (see ConvStage.fused_stage).
    fused_stage: bool = False
    #: dynamic W8A8 int8 decode for serving (see ConvStage.quantized);
    #: the encoder and conditioning projections stay bf16 — they are a
    #: negligible FLOP fraction and set the latent fidelity floor.
    quantized: bool = False
    #: rematerialise each decoder stage in the backward pass (per-block
    #: jax.checkpoint — required for codec-scale batches in HBM).
    remat: bool = False
    #: jax.checkpoint_policies name, e.g. "dots_saveable": save matmul/conv
    #: outputs and recompute only the cheap elementwise chain, so remat
    #: costs ~zero extra MXU FLOPs. None = recompute everything.
    remat_policy: str | None = None
    dtype: Any = jnp.float32

    def setup(self) -> None:
        if self.remat:
            policy = (getattr(jax.checkpoint_policies, self.remat_policy)
                      if self.remat_policy else None)
            stage_cls = nn.remat(ConvStage, policy=policy)
        else:
            stage_cls = ConvStage
        self.blocks = [
            stage_cls(
                noise_dimension=self.noise_dimension,
                condition_dimension=self.condition_dimension,
                num_blocks=self.num_blocks,
                use_grn=self.use_grn,
                channels=self.channels,
                bottleneck_dim=self.bottleneck_dim,
                spatial=self.spatial,
                lift_channels=self.lift_channels,
                fused_stage=self.fused_stage,
                quantized=self.quantized,
                dtype=self.dtype,
            )
            for _ in range(self.num_blocks)
        ]
        # no bias: latent_proj(zeros) must equal skipping it, so the CFG
        # unconditional paths (latents=None vs zero latents) coincide
        self.latent_proj = nn.Dense(self.condition_dimension, use_bias=False,
                                    dtype=self.dtype)
        self.encoder = ConvEncoder(
            noise_dimension=self.noise_dimension,
            latent_dimension=self.latent_dimension,
            dtype=self.dtype,
        )

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, noise_dim] -> [B, latent_dim]."""
        return self.encoder(x)


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
        for block in self.blocks:
            h = block(h, cond)
        return h
