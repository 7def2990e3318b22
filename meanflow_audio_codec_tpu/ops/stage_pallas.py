"""Fused Pallas kernels for the ConvNeXt stage elementwise/normalization chain.

The ConvStage forward (models/conv_flow.py, reference
meanflow_audio_codec/models/conv_flow.py:123-205) interleaves MXU matmuls
with three reduce->broadcast elementwise segments:

  1. lift 1x1 conv  -> adaLN-norm -> FiLM            (``fused_ln_film``)
  2. 3x3 conv       -> adaLN-norm                     (``fused_ln_norm``)
  3. expand 1x1     -> GELU -> GRN                    (``fused_gelu_grn``)

Each segment's per-row/per-channel reductions are fusion barriers for XLA:
the chain costs ~3 HBM passes over a [B, S*S, C] tensor where one suffices.
At the flagship train geometry (batch 2048, 8x8 grid, ch1024, bf16) those
extra passes are the documented residual MFU gap (67.5% -> ~80% structural,
documentation/performance.md "Ceiling argument"). Each kernel here reads its
input once from HBM, keeps the stats in VMEM, and writes the output once —
the bandwidth speed-of-light for the segment.

Differentiation contract (the hard part — see training/objectives.py):

  * mean-flow objectives take ``jax.grad`` of a loss containing BOTH a plain
    forward (the iMF boundary term) and a ``jax.jvp`` of the model, so every
    op must survive reverse-mode, forward-mode, and grad-of-jvp;
  * ``jax.custom_vjp`` alone is out (no forward-mode), a fused primal+tangent
    kernel inside a ``custom_jvp`` rule is out (not transposable, so the
    boundary term's plain reverse-mode would fail).

Design that satisfies all three transforms:

  * the Pallas primal kernel also emits the (tiny) normalization statistics
    — ``(mu, r)`` for LN, ``gx`` for GRN — as extra outputs;
  * the stats function is wrapped in ``custom_vjp`` whose backward is the
    ``jax.vjp`` of a pure-jnp reference (correct to second order);
  * the public op is ``custom_jvp``: primal = fused kernel; tangent rule =
    hand-derived jnp written in a two-pass form (one fused reduce over
    (x, tx), one apply pass) that reuses the primal kernel's stats, so XLA
    compiles the tangent without re-deriving the statistics. The rule is
    linear in the tangents and built from standard primitives, so JAX can
    transpose it (plain ``grad``) and differentiate it (grad-of-jvp).

Falls back to the same jnp reference off-TPU and for non-lane-aligned
shapes; ``interpret=True`` runs the kernels in the Pallas interpreter for
the CPU test suite (tests/test_stage_pallas.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_LN_EPS = 1e-6
_GRN_SQ_EPS = 1e-12
_GRN_MEAN_EPS = 1e-6
_GELU_A = math.sqrt(2.0 / math.pi)
_GELU_K = 0.044715
_LANE = 128
_SUBLANE = 8
# per-block VMEM budget: input + f32 working set + output comfortably
# under the ~16 MB/core VMEM.
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def _pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def _fusable(batch: int, positions: int, channels: int, dtype) -> bool:
    """Lane/sublane-aligned geometries only; anything else takes the
    jnp reference path (identical numerics class, XLA-fused)."""
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return (channels % _LANE == 0 and positions % (2 * _SUBLANE) == 0
            and batch % _SUBLANE == 0)


def _batch_tile(batch: int, positions: int, channels: int) -> int:
    """Largest power-of-two divisor of ``batch`` whose f32 working set fits
    the VMEM budget (floor 8 so [batch, stat] output blocks stay
    sublane-aligned; tiny batches fall back before reaching the kernel)."""
    per_item = positions * channels * 4 * 3  # x32, temps, y
    cap = max(8, _VMEM_BUDGET_BYTES // max(per_item, 1))
    bt = 8 if batch % 8 == 0 else 1
    while bt * 2 <= min(cap, 256) and batch % (bt * 2) == 0:
        bt *= 2
    return bt


def _gelu_f32(x: jnp.ndarray) -> jnp.ndarray:
    """tanh-approximate GELU, matching jax.nn.gelu(approximate=True)."""
    u = _GELU_A * (x + _GELU_K * x * x * x)
    return 0.5 * x * (1.0 + jnp.tanh(u))


def _gelu_grad_f32(x: jnp.ndarray) -> jnp.ndarray:
    """d/dx of the tanh-approximate GELU."""
    u = _GELU_A * (x + _GELU_K * x * x * x)
    th = jnp.tanh(u)
    du = _GELU_A * (1.0 + 3.0 * _GELU_K * x * x)
    return 0.5 * (1.0 + th) + 0.5 * x * (1.0 - th * th) * du


# ---------------------------------------------------------------------------
# jnp reference implementations (fallback path, custom_vjp backward, tests)
# ---------------------------------------------------------------------------


def _ln_stats_f32(x3: jnp.ndarray):
    x32 = x3.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    d = x32 - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + _LN_EPS)
    return d * r, mu[..., 0], r[..., 0]


def _ln_film_ref(x3: jnp.ndarray, scale: jnp.ndarray, shift: jnp.ndarray):
    """[B,P,C], [B,C], [B,C] -> (y [B,P,C], mu [B,P], r [B,P])."""
    xhat, mu, r = _ln_stats_f32(x3)
    s32 = scale.astype(jnp.float32)[:, None, :]
    b32 = shift.astype(jnp.float32)[:, None, :]
    y = ((1.0 + s32) * xhat + b32).astype(x3.dtype)
    return y, mu, r


def _ln_norm_ref(x3: jnp.ndarray):
    """[B,P,C] -> (y, mu [B,P], r [B,P])."""
    xhat, mu, r = _ln_stats_f32(x3)
    return xhat.astype(x3.dtype), mu, r


def _gelu_grn_ref(x3: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray):
    """[B,P,C], [C], [C] -> (y [B,P,C], gx [B,C])."""
    x32 = x3.astype(jnp.float32)
    g = _gelu_f32(x32)
    gx = jnp.sqrt(jnp.sum(g * g, axis=1) + _GRN_SQ_EPS)       # [B, C]
    m = jnp.mean(gx, axis=-1, keepdims=True) + _GRN_MEAN_EPS  # [B, 1]
    nx = gx / m
    y = (g * (gamma.astype(jnp.float32) + nx[:, None, :])
         + beta.astype(jnp.float32))
    return y.astype(x3.dtype), gx


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _ln_kernel_body(x_ref, s_ref, b_ref, y_ref, mu_ref, r_ref):
    x32 = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    d = x32 - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + _LN_EPS)
    xhat = d * r
    if s_ref is not None:
        s32 = s_ref[:].astype(jnp.float32)[:, None, :]
        b32 = b_ref[:].astype(jnp.float32)[:, None, :]
        y_ref[:] = ((1.0 + s32) * xhat + b32).astype(y_ref.dtype)
    else:
        y_ref[:] = xhat.astype(y_ref.dtype)
    mu_ref[:] = mu[..., 0]
    r_ref[:] = r[..., 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ln_film_pallas(x3, scale, shift, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, positions, channels = x3.shape
    bt = _batch_tile(batch, positions, channels)
    return pl.pallas_call(
        lambda x, s, b, y, mu, r: _ln_kernel_body(x, s, b, y, mu, r),
        grid=(batch // bt,),
        in_specs=[
            pl.BlockSpec((bt, positions, channels), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, channels), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, channels), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, positions, channels), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, positions), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, positions), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x3.shape, x3.dtype),
            jax.ShapeDtypeStruct((batch, positions), jnp.float32),
            jax.ShapeDtypeStruct((batch, positions), jnp.float32),
        ],
        interpret=interpret,
    )(x3, scale, shift)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ln_norm_pallas(x3, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, positions, channels = x3.shape
    bt = _batch_tile(batch, positions, channels)
    return pl.pallas_call(
        lambda x, y, mu, r: _ln_kernel_body(x, None, None, y, mu, r),
        grid=(batch // bt,),
        in_specs=[
            pl.BlockSpec((bt, positions, channels), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, positions, channels), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, positions), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, positions), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x3.shape, x3.dtype),
            jax.ShapeDtypeStruct((batch, positions), jnp.float32),
            jax.ShapeDtypeStruct((batch, positions), jnp.float32),
        ],
        interpret=interpret,
    )(x3)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gelu_grn_pallas(x3, gamma2, beta2, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, positions, channels = x3.shape
    bt = _batch_tile(batch, positions, channels)

    def kernel(x_ref, g_ref, b_ref, y_ref, gx_ref):
        x32 = x_ref[:].astype(jnp.float32)
        g = _gelu_f32(x32)
        gx = jnp.sqrt(jnp.sum(g * g, axis=1) + _GRN_SQ_EPS)   # [bt, C]
        m = jnp.mean(gx, axis=-1, keepdims=True) + _GRN_MEAN_EPS
        nx = gx / m
        gamma32 = g_ref[:].astype(jnp.float32)                # [1, C]
        beta32 = b_ref[:].astype(jnp.float32)
        y = g * (gamma32[:, None, :] + nx[:, None, :]) + beta32[:, None, :]
        y_ref[:] = y.astype(y_ref.dtype)
        gx_ref[:] = gx

    return pl.pallas_call(
        kernel,
        grid=(batch // bt,),
        in_specs=[
            pl.BlockSpec((bt, positions, channels), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, channels), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, channels), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, positions, channels), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, channels), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x3.shape, x3.dtype),
            jax.ShapeDtypeStruct((batch, channels), jnp.float32),
        ],
        interpret=interpret,
    )(x3, gamma2, beta2)


# ---------------------------------------------------------------------------
# stats functions: fused forward, jnp-reference backward (second-order safe)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ln_film_stats(x3, scale, shift, interpret):
    if interpret or (_pallas_available()
                     and _fusable(*x3.shape, x3.dtype)):
        return tuple(_ln_film_pallas(x3, scale, shift, interpret=interpret))
    return _ln_film_ref(x3, scale, shift)


def _ln_film_stats_fwd(x3, scale, shift, interpret):
    return _ln_film_stats(x3, scale, shift, interpret), (x3, scale, shift)


def _ln_film_stats_bwd(interpret, residuals, cotangents):
    return jax.vjp(_ln_film_ref, *residuals)[1](cotangents)


_ln_film_stats.defvjp(_ln_film_stats_fwd, _ln_film_stats_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _ln_norm_stats(x3, interpret):
    if interpret or (_pallas_available()
                     and _fusable(*x3.shape, x3.dtype)):
        return tuple(_ln_norm_pallas(x3, interpret=interpret))
    return _ln_norm_ref(x3)


def _ln_norm_stats_fwd(x3, interpret):
    return _ln_norm_stats(x3, interpret), (x3,)


def _ln_norm_stats_bwd(interpret, residuals, cotangents):
    return jax.vjp(_ln_norm_ref, *residuals)[1](cotangents)


_ln_norm_stats.defvjp(_ln_norm_stats_fwd, _ln_norm_stats_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gelu_grn_stats(x3, gamma, beta, interpret):
    if interpret or (_pallas_available()
                     and _fusable(*x3.shape, x3.dtype)):
        y, gx = _gelu_grn_pallas(x3, gamma.reshape(1, -1),
                                 beta.reshape(1, -1), interpret=interpret)
        return y, gx
    return _gelu_grn_ref(x3, gamma, beta)


def _gelu_grn_stats_fwd(x3, gamma, beta, interpret):
    return _gelu_grn_stats(x3, gamma, beta, interpret), (x3, gamma, beta)


def _gelu_grn_stats_bwd(interpret, residuals, cotangents):
    return jax.vjp(_gelu_grn_ref, *residuals)[1](cotangents)


_gelu_grn_stats.defvjp(_gelu_grn_stats_fwd, _gelu_grn_stats_bwd)


# ---------------------------------------------------------------------------
# public ops: custom_jvp with stats-reusing two-pass tangent rules
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_jvp, nondiff_argnums=(3,))
def fused_ln_film(x3: jnp.ndarray, scale: jnp.ndarray, shift: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """adaLN-norm + FiLM in one HBM pass: ``normalize(x)*(1+scale)+shift``.

    ``x3`` is [B, P, C] (P = flattened spatial positions), ``scale``/``shift``
    are [B, C] broadcast over P. Matches ``_adaln_norm`` followed by the FiLM
    modulation (models/blocks.py) with f32 statistics.
    """
    y, _, _ = _ln_film_stats(x3, scale, shift, interpret)
    return y


@fused_ln_film.defjvp
def _fused_ln_film_jvp(interpret, primals, tangents):
    x3, scale, shift = primals
    tx, ts, tb = tangents
    y, mu, r = _ln_film_stats(x3, scale, shift, interpret)
    # xhat has zero mean per row, so mean(xhat * (tx - mean(tx))) reduces to
    # mean(xhat * tx): one fused reduce pass over (x, tx), one apply pass.
    r3 = r[..., None]
    xhat = (x3.astype(jnp.float32) - mu[..., None]) * r3
    tx32 = tx.astype(jnp.float32)
    tmu = jnp.mean(tx32, axis=-1, keepdims=True)
    proj = jnp.mean(xhat * tx32, axis=-1, keepdims=True)
    txhat = r3 * (tx32 - tmu) - xhat * (r3 * proj)
    s32 = scale.astype(jnp.float32)[:, None, :]
    ty = ((1.0 + s32) * txhat
          + ts.astype(jnp.float32)[:, None, :] * xhat
          + tb.astype(jnp.float32)[:, None, :])
    return y, ty.astype(y.dtype)


@functools.partial(jax.custom_jvp, nondiff_argnums=(1,))
def fused_ln_norm(x3: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """adaLN-norm (scale/bias-free LayerNorm, f32 stats) in one HBM pass."""
    y, _, _ = _ln_norm_stats(x3, interpret)
    return y


@fused_ln_norm.defjvp
def _fused_ln_norm_jvp(interpret, primals, tangents):
    (x3,), (tx,) = primals, tangents
    y, mu, r = _ln_norm_stats(x3, interpret)
    r3 = r[..., None]
    xhat = (x3.astype(jnp.float32) - mu[..., None]) * r3
    tx32 = tx.astype(jnp.float32)
    tmu = jnp.mean(tx32, axis=-1, keepdims=True)
    proj = jnp.mean(xhat * tx32, axis=-1, keepdims=True)
    ty = r3 * (tx32 - tmu) - xhat * (r3 * proj)
    return y, ty.astype(y.dtype)


@functools.partial(jax.custom_jvp, nondiff_argnums=(3,))
def fused_gelu_grn(x3: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """GELU(tanh) + ConvNeXt-V2 GRN in one HBM pass.

    ``x3`` is the pre-activation [B, P, C]; ``gamma``/``beta`` are the GRN
    parameters [C]. Matches ``jax.nn.gelu(approximate=True)`` followed by
    ``GlobalResponseNormalization`` (models/blocks.py:119-138) with f32
    accumulation, emitting the compute dtype (the unfused chain leaks an f32
    tensor through dtype promotion; the next conv casts it back anyway).
    """
    y, _ = _gelu_grn_stats(x3, gamma, beta, interpret)
    return y


@fused_gelu_grn.defjvp
def _fused_gelu_grn_jvp(interpret, primals, tangents):
    x3, gamma, beta = primals
    tx, tgamma, tbeta = tangents
    y, gx = _gelu_grn_stats(x3, gamma, beta, interpret)
    x32 = x3.astype(jnp.float32)
    tx32 = tx.astype(jnp.float32)
    # recompute g elementwise (fuses into both passes); stats gx from primal
    g = _gelu_f32(x32)
    tg = _gelu_grad_f32(x32) * tx32
    m = jnp.mean(gx, axis=-1, keepdims=True) + _GRN_MEAN_EPS   # [B, 1]
    nx = gx / m
    tgx = jnp.sum(g * tg, axis=1) / gx                          # [B, C]
    tm = jnp.mean(tgx, axis=-1, keepdims=True)
    tnx = (tgx - nx * tm) / m
    ty = (tg * (gamma.astype(jnp.float32) + nx[:, None, :])
          + g * (tgamma.astype(jnp.float32) + tnx[:, None, :])
          + tbeta.astype(jnp.float32))
    return y, ty.astype(y.dtype)


def stage_fusable(spatial: int, channels: int, dtype=jnp.bfloat16) -> bool:
    """True when the [B, spatial^2, channels] geometry takes the fused path
    on TPU (callers may use this to decide whether the flag is worth it)."""
    return _fusable(1, spatial * spatial, channels, jnp.dtype(dtype).type)
