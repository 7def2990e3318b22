"""Model factories (reference: meanflow_audio_codec/models/factories.py).

``create_flow_model(config)`` honours ``config.architecture`` for every
family — including 'simple_conv', which the reference registered but never
wired up, and 'convnet', whose reference factory crashed on an unknown
``base_channels`` argument (factories.py:59-66).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from meanflow_audio_codec_tpu.models.conv_flow import ConditionalConvFlow
from meanflow_audio_codec_tpu.models.mlp_flow import ConditionalFlow
from meanflow_audio_codec_tpu.models.mlp_mixer import ConditionalMLPMixerFlow
from meanflow_audio_codec_tpu.models.simple_conv_flow import SimpleConvFlow

_PRECISION_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "mixed": jnp.bfloat16,  # bf16 compute, f32 params (flax default param_dtype)
}


def compute_dtype_for(config: Any) -> Any:
    """Map the config's tpu.precision policy to a compute dtype."""
    precision = getattr(getattr(config, "tpu", None), "precision", "float32")
    return _PRECISION_DTYPES.get(precision, jnp.float32)


def create_mlp_flow(noise_dimension: int, latent_dimension: int,
                    num_blocks: int, condition_dimension: int,
                    dtype=jnp.float32) -> ConditionalFlow:
    return ConditionalFlow(
        noise_dimension=noise_dimension,
        condition_dimension=condition_dimension,
        num_blocks=num_blocks,
        latent_dimension=latent_dimension,
        dtype=dtype,
    )


def create_conv_flow(noise_dimension: int, latent_dimension: int,
                     num_blocks: int, condition_dimension: int,
                     image_size: int = 28, use_grn: bool = True,
                     channels: int | None = None,
                     bottleneck_dim: int = 128,
                     spatial: int | None = None,
                     lift_channels: int | None = None,
                     remat: bool = False,
                     remat_policy: str | None = None,
                     fused_stage: bool = False,
                     quantized: bool = False,
                     dtype=jnp.float32) -> ConditionalConvFlow:
    return ConditionalConvFlow(
        noise_dimension=noise_dimension,
        condition_dimension=condition_dimension,
        num_blocks=num_blocks,
        latent_dimension=latent_dimension,
        image_size=image_size,
        use_grn=use_grn,
        channels=channels,
        bottleneck_dim=bottleneck_dim,
        spatial=spatial,
        lift_channels=lift_channels,
        remat=remat,
        remat_policy=remat_policy,
        fused_stage=fused_stage,
        quantized=quantized,
        dtype=dtype,
    )


def create_mlp_mixer_flow(noise_dimension: int, latent_dimension: int,
                          num_blocks: int, condition_dimension: int,
                          token_mix_dim: int = 2048,
                          channel_mix_dim: int = 2048,
                          num_channels: int = 16,
                          num_latent_tokens: int = 32,
                          stage_tokens: int | None = None,
                          factorized_stages: bool = False,
                          encoder_context_tokens: int = 64,
                          dtype=jnp.float32) -> ConditionalMLPMixerFlow:
    return ConditionalMLPMixerFlow(
        noise_dimension=noise_dimension,
        condition_dimension=condition_dimension,
        num_blocks=num_blocks,
        latent_dimension=latent_dimension,
        token_mix_dim=token_mix_dim,
        channel_mix_dim=channel_mix_dim,
        num_channels=num_channels,
        num_latent_tokens=num_latent_tokens,
        stage_tokens=stage_tokens,
        factorized_stages=factorized_stages,
        encoder_context_tokens=encoder_context_tokens,
        dtype=dtype,
    )


def create_simple_conv_flow(noise_dimension: int, latent_dimension: int,
                            num_blocks: int, condition_dimension: int,
                            dtype=jnp.float32) -> SimpleConvFlow:
    return SimpleConvFlow(
        noise_dimension=noise_dimension,
        condition_dimension=condition_dimension,
        num_blocks=num_blocks,
        latent_dimension=latent_dimension,
        dtype=dtype,
    )


_BUILDERS = {
    "mlp": create_mlp_flow,
    "convnet": None,  # needs image_size, handled below
    "mlp_mixer": create_mlp_mixer_flow,
    "simple_conv": create_simple_conv_flow,
}


def create_flow_model(config: Any, dtype=None):
    """Build the flow model named by ``config.architecture`` (default mlp).

    ``config.model.architecture_options`` (a dict) passes family-specific
    sizing straight to the builder — e.g. convnet
    ``{"channels": 128, "bottleneck_dim": 512, "spatial": 32,
    "lift_channels": 16}`` or mixer ``{"num_channels": 64,
    "factorized_stages": true, "stage_tokens": 32}``. The reference had no
    such surface (its convnet factory crashed on the one kwarg it tried).
    """
    architecture = config.architecture or "mlp"
    if dtype is None:
        dtype = compute_dtype_for(config)
    common = dict(
        noise_dimension=config.noise_dimension,
        latent_dimension=config.latent_dimension,
        num_blocks=config.num_blocks,
        condition_dimension=config.condition_dimension,
        dtype=dtype,
    )
    common.update(getattr(config.model, "architecture_options", None) or {})
    if architecture == "convnet":
        common.setdefault("image_size", int(config.noise_dimension ** 0.5))
        return create_conv_flow(**common)
    builder = _BUILDERS.get(architecture)
    if builder is None:
        raise ValueError(
            f"Unknown architecture: {architecture}. "
            "Must be one of: 'mlp', 'convnet', 'mlp_mixer', 'simple_conv'"
        )
    return builder(**common)
