"""Shared building blocks for all model families.

Re-designed from the reference block zoo (meanflow_audio_codec/models/
mlp_flow.py:12-117, mlp_mixer.py:14-163, conv_flow.py:14-205) with a uniform
TPU execution policy:

  * every block takes a ``dtype`` (compute dtype; params stay float32) so the
    whole stack can run bfloat16 on the MXU under the mixed-precision policy;
  * LayerNorm statistics and the adaLN modulation math run in float32;
  * all blocks are ``nn.compact`` and free of data-dependent Python control
    flow, so they trace once under jit and are JVP-safe (the mean-flow
    objectives differentiate the full decoder with ``jax.jvp``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from meanflow_audio_codec_tpu.ops.quant import (
    int8_conv_general_dilated,
    int8_dot_general,
)
from meanflow_audio_codec_tpu.ops.stage_pallas import (
    fused_gelu_grn,
    fused_ln_film,
    fused_ln_norm,
)

Dtype = Any


def quant_injection(quantized: bool) -> tuple[dict, dict]:
    """(Dense kwargs, Conv kwargs) routing matmuls through the dynamic
    W8A8 int8 ops (ops/quant.py) when ``quantized`` — the param tree is
    unchanged, so bf16 checkpoints load into the quantized model as-is."""
    if not quantized:
        return {}, {}
    return ({"dot_general": int8_dot_general},
            {"conv_general_dilated": int8_conv_general_dilated})


def _as_rows(x: jnp.ndarray) -> tuple[jnp.ndarray, tuple[int, ...]]:
    """[B, ..., C] -> ([B, P, C], original shape) for the fused stage ops."""
    shape = x.shape
    return x.reshape(shape[0], -1, shape[-1]), shape


class MLP(nn.Module):
    """Dense -> GELU(tanh) -> Dense (reference mlp_flow.py:12-31)."""

    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = jax.nn.gelu(x, approximate=True)
        return nn.Dense(self.out, dtype=self.dtype)(x)


def _adaln_norm(x: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    """Scale/bias-free LayerNorm with f32 statistics, hand-rolled.

    flax ``LayerNorm(dtype=f32)`` materialises a full f32 copy of the input
    (a `convert_element_type` the fuser keeps — 0.5 GB per block at codec
    batch sizes). Computing the moments through f32 *reductions* on the
    bf16 tensor lets XLA fuse the converts into the reduces: no f32 copy,
    same numerics.
    """
    x32_mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
    centered = x.astype(jnp.float32) - x32_mean
    var = jnp.mean(jnp.square(centered), axis=-1, keepdims=True)
    return (centered * jax.lax.rsqrt(var + epsilon)).astype(x.dtype)


class ConditionalResidualBlock(nn.Module):
    """DiT-style adaLN residual block over flat features
    (reference mlp_flow.py:63-117).

    Input is [latent ++ noise]; the conditioning MLP emits
    (scale1, shift, scale2); the residual comes from the noise slice only and
    the block output is scaled by 1/num_blocks for depth-stable residuals.
    """

    input_dimension: int
    noise_dimension: int
    condition_dimension: int
    num_blocks: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, condition: jnp.ndarray) -> jnp.ndarray:
        residual = x[:, -self.noise_dimension:]
        h = _adaln_norm(x)
        mod = MLP(self.condition_dimension,
                  2 * self.input_dimension + self.noise_dimension,
                  dtype=self.dtype)(condition)
        scale1 = mod[:, :self.input_dimension]
        shift = mod[:, self.input_dimension:2 * self.input_dimension]
        scale2 = mod[:, 2 * self.input_dimension:]
        h = MLP(self.input_dimension, self.noise_dimension,
                dtype=self.dtype)((1.0 + scale1) * h + shift)
        return h * (1.0 + scale2) / self.num_blocks + residual


class MixerBlock(nn.Module):
    """MLP-Mixer block: adaLN -> token-mix -> residual -> adaLN ->
    channel-mix -> residual (reference mlp_mixer.py:14-94).

    The token-mix Dense couples the token axis — under tensor parallelism
    this is the matmul to shard on the 'model' mesh axis.
    """

    token_mix_dim: int
    channel_mix_dim: int
    num_channels: int
    num_tokens: int
    condition_dim: int
    dtype: Dtype = jnp.float32

    def _modulate(self, x: jnp.ndarray, condition: jnp.ndarray) -> jnp.ndarray:
        h = _adaln_norm(x)
        scale_shift = nn.Dense(2 * self.num_channels, dtype=self.dtype)(condition)
        scale, shift = jnp.split(scale_shift, 2, axis=-1)
        return (1.0 + scale[:, None, :]) * h + shift[:, None, :]

    @nn.compact
    def __call__(self, x: jnp.ndarray, condition: jnp.ndarray) -> jnp.ndarray:
        # Token mixing across the sequence axis.
        h = self._modulate(x, condition)
        h = jnp.swapaxes(h, -1, -2)
        h = MLP(self.token_mix_dim, self.num_tokens, dtype=self.dtype)(h)
        x = x + jnp.swapaxes(h, -1, -2)
        # Channel mixing.
        h = self._modulate(x, condition)
        return x + MLP(self.channel_mix_dim, self.num_channels,
                       dtype=self.dtype)(h)


class GlobalResponseNormalization(nn.Module):
    """ConvNeXt-V2 GRN (reference conv_flow.py:14-45): inter-channel feature
    competition via the global spatial L2 response, f32-accumulated.

    ``fused_gelu=True`` treats the input as PRE-activation and runs the
    fused GELU+GRN Pallas kernel (ops/stage_pallas.py) — one HBM pass for
    the whole segment. Parameter names/shapes are identical either way.
    """

    epsilon: float = 1e-6
    fused_gelu: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.fused_gelu:
            channels = x.shape[-1]
            gamma = self.param("gamma", nn.initializers.zeros, (channels,))
            beta = self.param("beta", nn.initializers.zeros, (channels,))
            rows, shape = _as_rows(x)
            return fused_gelu_grn(rows, gamma, beta, False).reshape(shape)
        spatial_axes = tuple(range(1, x.ndim - 1))
        # epsilon INSIDE the sqrt: sqrt'(0) is inf, so a channel that dies
        # to exact zeros (GELU saturation) turns the mean-flow JVP tangent
        # into inf * 0 = NaN. Observed on tonal audio batches.
        gx = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)),
                              axis=spatial_axes, keepdims=True) + 1e-12)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + self.epsilon)
        channels = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.zeros, (channels,))
        beta = self.param("beta", nn.initializers.zeros, (channels,))
        # cast params to the compute dtype BEFORE combining: f32 gamma would
        # promote the whole [B, S, S, 2C] product to f32 (the widest tensor
        # in the stage written+read at double width, measured in the MFU
        # study); params remain f32 in the tree per the precision policy
        return (x * (jnp.asarray(gamma, dtype=x.dtype) + nx.astype(x.dtype))
                + jnp.asarray(beta, dtype=x.dtype))


class ConvNeXtBlock(nn.Module):
    """3x3 depthish conv -> LN -> 1x1 expand -> GELU -> [GRN] -> 1x1 contract,
    layer-scale and optional stochastic depth (reference conv_flow.py:53-115).
    """

    dim: int
    drop_path: float = 0.0
    layer_scale_init_value: float = 1e-6
    use_grn: bool = True
    #: run the elementwise/normalization segments through the fused Pallas
    #: stage kernels (ops/stage_pallas.py); falls back to XLA off-TPU.
    fused_stage: bool = False
    #: serve the three convs in dynamic W8A8 int8 (ops/quant.py) —
    #: inference-only, identical param tree.
    quantized: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        _, qconv = quant_injection(self.quantized)
        residual = x
        h = nn.Conv(self.dim, kernel_size=(3, 3), padding="SAME",
                    dtype=self.dtype, **qconv)(x)
        if self.fused_stage:
            rows, shape = _as_rows(h)
            h = fused_ln_norm(rows, False).reshape(shape)
        else:
            h = _adaln_norm(h)
        h = nn.Conv(2 * self.dim, kernel_size=(1, 1), dtype=self.dtype,
                    **qconv)(h)
        if self.fused_stage and self.use_grn:
            h = GlobalResponseNormalization(fused_gelu=True)(h)
        else:
            h = jax.nn.gelu(h, approximate=True)
            if self.use_grn:
                h = GlobalResponseNormalization()(h)
        h = nn.Conv(self.dim, kernel_size=(1, 1), dtype=self.dtype,
                    **qconv)(h)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "layer_scale_gamma",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim,),
            )
            h = h * jnp.asarray(gamma, dtype=h.dtype)
        if self.drop_path > 0.0 and train:
            keep = 1.0 - self.drop_path
            mask = jax.random.bernoulli(self.make_rng("drop_path"), keep,
                                        (h.shape[0],))
            mask = mask.reshape((-1,) + (1,) * (h.ndim - 1))
            h = h * mask.astype(h.dtype) / keep
        return h + residual


class FiLM(nn.Module):
    """Feature-wise linear modulation over the channel axis
    (reference conv_flow.py:185-191, simple_conv_flow.py:16-42).

    ``fuse_norm=True`` treats the input as PRE-norm and runs the fused
    adaLN-norm + FiLM Pallas kernel (ops/stage_pallas.py) — one HBM pass
    for the norm + modulation segment. The scale/shift Dense (and thus the
    parameter tree) is identical either way.
    """

    channels: int
    fuse_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, condition: jnp.ndarray) -> jnp.ndarray:
        params = nn.Dense(2 * self.channels, dtype=self.dtype)(condition)
        scale, shift = jnp.split(params, 2, axis=-1)
        if self.fuse_norm:
            rows, shape = _as_rows(x)
            return fused_ln_film(rows, scale, shift, False).reshape(shape)
        expand = (slice(None),) + (None,) * (x.ndim - 2)
        return (1.0 + scale[expand]) * x + shift[expand]
