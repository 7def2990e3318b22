"""Fused Pallas MDCT kernel (the BASELINE.json north-star kernel).

The XLA path (:mod:`meanflow_audio_codec_tpu.ops.mdct`) frames via a gather,
which reads each input sample ``2W/hop`` times from HBM (4x at the default
hop = W/2) before the basis matmul. This kernel fuses framing + windowing +
transform: each grid cell DMAs one contiguous signal span from HBM into
VMEM exactly once, slices the overlapping frames out of VMEM (free), and
runs MXU matmuls against the windowed cosine basis.

Per grid cell (batch-tile i, frame-tile j):
    span    = x[i·BT : (i+1)·BT, j·FT·hop : j·FT·hop + span_len]
    for k:  out[:, k, :] = span[:, k·hop : k·hop + 2W] @ windowed_basis

HBM traffic: signal read once + coefficients written once — the bandwidth
speed-of-light for this op. VMEM: basis 2W·W·4 bytes (2.7 MB at W=576) +
span buffer (~170 KB), well under the ~16 MB budget.

Mosaic constraints honoured:
  * HBM DMA slices must be 128-lane aligned on the minor dim -> the span
    length is rounded up to 128 and the frame tile is chosen so every
    block start (j·FT·hop) is a multiple of 128;
  * no stacked concat of hop-misaligned VMEM slices -> one dot per frame
    offset, pipelined back-to-back on the MXU.

Falls back to the XLA path on CPU (Pallas TPU kernels don't run there) and
for un-tileable geometries.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from meanflow_audio_codec_tpu.ops.mdct import (
    MDCTConfig,
    _mdct_direct,
    _overlap_add,
    _prepare_signal,
    _windowed_basis_np,
)

DEFAULT_BATCH_TILE = 8
DEFAULT_FRAME_TILE = 16
_LANE = 128
_SUBLANE = 8


def _pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def _aligned_frame_tile(hop: int, requested: int) -> int:
    """Smallest multiple m of (128/gcd(hop,128)) with m >= requested, so
    every DMA start offset FT·hop·j is lane-aligned."""
    unit = _LANE // math.gcd(hop, _LANE)
    return -(-requested // unit) * unit


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def _mdct_pallas_core(x2d, window_size, hop, nf, batch_tile, frame_tile,
                      interpret):
    return _mdct_pallas_kernel(x2d, window_size, hop, nf, batch_tile,
                               frame_tile, interpret)


def _mdct_pallas_fwd(x2d, window_size, hop, nf, batch_tile, frame_tile,
                     interpret):
    return _mdct_pallas_core(x2d, window_size, hop, nf, batch_tile,
                             frame_tile, interpret), x2d.shape


def _mdct_pallas_bwd(window_size, hop, nf, batch_tile, frame_tile, interpret,
                     x_shape, g):
    # forward is linear: y[b,f,:] = x_span @ WB  =>  dx = overlap-add(g @ WB^T)
    wb = jnp.asarray(_windowed_basis_np(window_size))
    frames = jnp.einsum("bfk,nk->bfn", g.astype(jnp.float32), wb,
                        precision=jax.lax.Precision.HIGHEST)
    covered = (nf - 1) * hop + 2 * window_size  # frames only touch this span
    dx = _overlap_add(frames, hop, min(covered, x_shape[1]))
    if dx.shape[1] < x_shape[1]:
        dx = jnp.pad(dx, ((0, 0), (0, x_shape[1] - dx.shape[1])))
    return (dx.astype(g.dtype),)


_mdct_pallas_core.defvjp(_mdct_pallas_fwd, _mdct_pallas_bwd)


@functools.partial(jax.jit, static_argnames=("window_size", "hop", "nf",
                                             "batch_tile", "frame_tile",
                                             "interpret"))
def _mdct_pallas_kernel(x2d: jnp.ndarray, window_size: int, hop: int, nf: int,
                        batch_tile: int, frame_tile: int,
                        interpret: bool = False) -> jnp.ndarray:
    """[B, T_pad] -> [B, nf, W]; B % batch_tile == 0, nf % frame_tile == 0,
    and T_pad covers the last (lane-aligned) span."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch = x2d.shape[0]
    two_w = 2 * window_size
    span = (frame_tile - 1) * hop + two_w
    span = -(-span // _LANE) * _LANE
    grid = (batch // batch_tile, nf // frame_tile)
    wb = jnp.asarray(_windowed_basis_np(window_size))

    def kernel(x_hbm, wb_ref, out_ref, span_buf, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        copy = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * batch_tile, batch_tile),
                     pl.ds(j * (frame_tile * hop), span)],
            span_buf, sem)
        copy.start()
        copy.wait()
        for k in range(frame_tile):
            frame = span_buf[:, k * hop:k * hop + two_w]     # [BT, 2W]
            out_ref[:, k, :] = jnp.dot(
                frame, wb_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),       # signal stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),      # basis fully resident
        ],
        out_specs=pl.BlockSpec(
            (batch_tile, frame_tile, window_size),
            lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, nf, window_size), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((batch_tile, span), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x2d, wb)


def mdct_pallas(x: jnp.ndarray, window_size: int = 576,
                hop_size: int | None = None,
                config: MDCTConfig | None = None,
                batch_tile: int = DEFAULT_BATCH_TILE,
                frame_tile: int = DEFAULT_FRAME_TILE,
                interpret: bool = False) -> jnp.ndarray:
    """Fused forward MDCT: ``(..., T) -> (..., n_frames, W)``.

    Identical coefficients to :func:`meanflow_audio_codec_tpu.ops.mdct.mdct`
    (tested to the oracle tolerances); differentiable via a custom linear
    VJP. Falls back to the XLA path off-TPU unless ``interpret=True`` (the
    Pallas interpreter, used by the CPU test suite).
    """
    if config is not None:
        window_size, hop = config.window_size, config.hop_size
    else:
        cfg = MDCTConfig(window_size=window_size, hop_size=hop_size)
        window_size, hop = cfg.window_size, cfg.hop_size

    x = jnp.asarray(x)
    if not (_pallas_available() or interpret):
        return _mdct_direct(x, window_size, hop)

    x2d, nf, original_shape = _prepare_signal(x.astype(jnp.float32),
                                              window_size, hop)
    batch = x2d.shape[0]
    frame_tile = _aligned_frame_tile(hop, min(frame_tile, max(1, nf)))
    batch_tile_eff = max(_SUBLANE, min(batch_tile, batch))
    pad_b = (-batch) % batch_tile_eff
    nf_padded = -(-nf // frame_tile) * frame_tile
    # signal must cover the last grid cell's lane-aligned span
    span = (frame_tile - 1) * hop + 2 * window_size
    span = -(-span // _LANE) * _LANE
    required = (nf_padded - frame_tile) * hop + span
    pad_t = max(0, required - x2d.shape[1])
    if pad_b or pad_t:
        x2d = jnp.pad(x2d, ((0, pad_b), (0, pad_t)))
    coeffs = _mdct_pallas_core(x2d, window_size, hop, nf_padded,
                               batch_tile_eff, frame_tile, interpret)
    coeffs = coeffs[:batch, :nf]
    return coeffs.reshape(original_shape[:-1] + (nf, window_size)).astype(
        x.dtype)
