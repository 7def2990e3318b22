"""Dynamic W8A8 int8 matmul/conv ops for the quantized serving path.

The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 FLOP rate (394 TOPS
vs 197 TFLOP/s peak), and XLA lowers both ``lax.dot_general`` and
``lax.conv_general_dilated`` with int8 operands straight onto it (measured
on this chip: int8 1.48x bf16 for 8192^3 matmuls, 1.25x for the codec's
3x3-at-8x8 conv, both while time-sharing the chip). The decode path of the
audio codec is compute-bound at ~52% MFU (documentation/performance.md),
so weight+activation int8 is the one lever that moves the realtime factor
without retraining.

Scheme — standard dynamic W8A8:

* activations: per-tensor symmetric scale computed inside the jitted
  forward (``amax/127``) — no calibration pass, no host sync;
* weights: per-output-channel symmetric scales;
* int32 accumulation, dequantized to the model compute dtype.

These functions slot into flax's op-injection points
(``nn.Dense(dot_general=...)``, ``nn.Conv(conv_general_dilated=...)``), so
a quantized model has the *identical* parameter tree as its bf16 twin and
loads existing checkpoints unchanged. The reference has no serving tier at
all (its sampler runs the training dtype, evaluators/sampling.py:55-85);
this is TPU-native capability on top of parity.

Training never touches this path: quantization-through-rounding has a
zero gradient almost everywhere and the objectives differentiate the
decoder with ``jax.jvp`` (training/objectives.py) — the ``quantized`` model
knob is rejected by the trainer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_QMAX = 127.0
_EPS = 1e-12


def _per_tensor_scale(x: jnp.ndarray) -> jnp.ndarray:
    """Symmetric per-tensor scale: amax/127, zero-safe, f32 scalar."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    return jnp.maximum(amax, _EPS) / _QMAX


def _per_axis_scale(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Symmetric scales reduced over every axis except ``axis`` (f32)."""
    reduce_axes = tuple(a for a in range(x.ndim) if a != axis)
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=reduce_axes)
    return jnp.maximum(amax, _EPS) / _QMAX


def _quantize(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Round-to-nearest int8 with the given (broadcastable) scale."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -_QMAX, _QMAX).astype(jnp.int8)


def int8_dot_general(lhs: jnp.ndarray, rhs: jnp.ndarray, dimension_numbers,
                     precision=None, preferred_element_type=None
                     ) -> jnp.ndarray:
    """Drop-in ``lax.dot_general`` computing in int8 on the MXU.

    Handles the Dense-layer contraction (last lhs dim x first rhs dim, no
    batch dims) — the only shape flax's ``nn.Dense`` emits. Anything else
    falls back to the exact dot so the injection can never change
    semantics silently for exotic contractions.
    """
    (lhs_contract, rhs_contract), (lhs_batch, rhs_batch) = dimension_numbers
    dense_case = (tuple(lhs_contract) == (lhs.ndim - 1,)
                  and tuple(rhs_contract) == (0,)
                  and not lhs_batch and not rhs_batch and rhs.ndim == 2)
    if not dense_case:
        return jax.lax.dot_general(
            lhs, rhs, dimension_numbers, precision=precision,
            preferred_element_type=preferred_element_type)
    out_dtype = jnp.result_type(lhs.dtype, rhs.dtype)
    s_act = _per_tensor_scale(lhs)
    s_w = _per_axis_scale(rhs, axis=1)  # one scale per output feature
    acc = jax.lax.dot_general(
        _quantize(lhs, s_act), _quantize(rhs, s_w),
        dimension_numbers, preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (s_act * s_w)
    return out.astype(out_dtype)


def int8_conv_general_dilated(lhs: jnp.ndarray, rhs: jnp.ndarray,
                              window_strides, padding, lhs_dilation=None,
                              rhs_dilation=None, dimension_numbers=None,
                              feature_group_count=1, batch_group_count=1,
                              precision=None, preferred_element_type=None
                              ) -> jnp.ndarray:
    """Drop-in ``lax.conv_general_dilated`` computing in int8 on the MXU.

    Handles the undilated, ungrouped case (all convs in this package).
    Weight scales are per-output-channel (HWIO axis -1 / dimension-number
    rhs out axis), broadcast onto the output's channel axis at dequant.
    """
    simple = (feature_group_count == 1 and batch_group_count == 1
              and all(d == 1 for d in (lhs_dilation or (1,)))
              and all(d == 1 for d in (rhs_dilation or (1,))))
    if not simple:
        return jax.lax.conv_general_dilated(
            lhs, rhs, window_strides, padding, lhs_dilation=lhs_dilation,
            rhs_dilation=rhs_dilation, dimension_numbers=dimension_numbers,
            feature_group_count=feature_group_count,
            batch_group_count=batch_group_count, precision=precision,
            preferred_element_type=preferred_element_type)
    dn = jax.lax.conv_dimension_numbers(lhs.shape, rhs.shape,
                                        dimension_numbers)
    out_dtype = jnp.result_type(lhs.dtype, rhs.dtype)
    s_act = _per_tensor_scale(lhs)
    out_feature_axis = dn.rhs_spec[0]  # O position in the kernel layout
    s_w = _per_axis_scale(rhs, axis=out_feature_axis)
    acc = jax.lax.conv_general_dilated(
        _quantize(lhs, s_act), _quantize(rhs, s_w[
            tuple(slice(None) if a == out_feature_axis else None
                  for a in range(rhs.ndim))]),
        window_strides, padding, lhs_dilation=lhs_dilation,
        rhs_dilation=rhs_dilation, dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    # broadcast the per-out-channel scales onto the output channel axis
    out_channel_axis = dn.out_spec[1]  # C position in the output layout
    shape = [1] * acc.ndim
    shape[out_channel_axis] = s_w.shape[0]
    out = acc.astype(jnp.float32) * (s_act * s_w.reshape(shape))
    return out.astype(out_dtype)
