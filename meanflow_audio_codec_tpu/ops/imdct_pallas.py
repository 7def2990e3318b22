"""Fused Pallas IMDCT kernel: inverse transform + overlap-add in VMEM.

Companion to :mod:`meanflow_audio_codec_tpu.ops.mdct_pallas` and the second
half of the north-star kernel pair. Overlap-add is the race-prone part (the
reference serialised it with ``lax.scan``, mdct.py:517-540; the XLA path
here uses k shifted adds). This kernel keeps the accumulation *local*: each
grid cell owns one disjoint output chunk and pulls in every frame that
overlaps it, so no cross-cell races exist by construction.

Boundary handling without masks: the wrapper pads the coefficient array
with k-1 = ceil(2W/hop)-1 zero frames at the front (and zero frames at the
tail up to the DMA window), so every chunk's frame window starts at the
statically aligned offset j·FT and out-of-range frames synthesise exact
zeros that add nothing. Per grid cell (batch-tile i, chunk j), with
S = FT·hop:

    acc = zeros(BT, 2W + S + 2W)                      # guard margins
    for m in range(FT + k - 1):                       # static loop
        frame = coeffs_padded[j·FT + m] @ (2/W)·WBᵀ   # MXU
        acc[:, 2W + (m-(k-1))·hop : +2W] += frame     # always in bounds
    out[j] = acc[:, 2W : 2W + S]

Differentiable via a custom linear VJP (the adjoint of synthesis +
overlap-add is framing + the same windowed-basis analysis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from meanflow_audio_codec_tpu.ops.mdct import (
    IMDCT_SCALING_FACTOR,
    MDCTConfig,
    _imdct_direct,
    _windowed_basis_np,
    output_length,
)

_SUBLANE = 8
DEFAULT_BATCH_TILE = 8
DEFAULT_FRAME_TILE = 32


def _pallas_available() -> bool:
    return jax.default_backend() == "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def _imdct_pallas_core(coeffs_padded, window_size, hop, out_len, batch_tile,
                       frame_tile, interpret):
    return _imdct_pallas_kernel(coeffs_padded, window_size, hop, out_len,
                                batch_tile, frame_tile, interpret)


def _imdct_pallas_fwd(coeffs_padded, window_size, hop, out_len, batch_tile,
                      frame_tile, interpret):
    out = _imdct_pallas_core(coeffs_padded, window_size, hop, out_len,
                             batch_tile, frame_tile, interpret)
    return out, coeffs_padded.shape


def _imdct_pallas_bwd(window_size, hop, out_len, batch_tile, frame_tile,
                      interpret, coeffs_shape, g):
    """Adjoint: frame the output cotangent at the *padded* frame grid and
    analyse with the same scaled windowed basis.

    Padded frame p covers output samples [(p - (k-1))·hop, ...+2W); the
    cotangent of that frame is the corresponding (zero-extended) slice of g.
    """
    from meanflow_audio_codec_tpu.ops.mdct import _frame

    nf_padded = coeffs_shape[1]
    overlap = -(-2 * window_size // hop)
    front = (overlap - 1) * hop
    g32 = g.astype(jnp.float32)
    # zero-extend so every padded frame's [start, start+2W) window exists
    total = (nf_padded - 1) * hop + 2 * window_size
    g_ext = jnp.pad(g32, ((0, 0), (front, max(0, total - front - g32.shape[1]))))
    frames = _frame(g_ext, nf_padded, window_size, hop)   # [B, nfp, 2W]
    wb = jnp.asarray(_windowed_basis_np(window_size))
    scale = IMDCT_SCALING_FACTOR / window_size
    dcoeffs = scale * jnp.einsum("bfn,nk->bfk", frames, wb,
                                 precision=jax.lax.Precision.HIGHEST)
    return (dcoeffs.astype(g.dtype),)


_imdct_pallas_core.defvjp(_imdct_pallas_fwd, _imdct_pallas_bwd)


@functools.partial(jax.jit, static_argnames=("window_size", "hop", "out_len",
                                             "batch_tile", "frame_tile",
                                             "interpret"))
def _imdct_pallas_kernel(coeffs: jnp.ndarray, window_size: int, hop: int,
                         out_len: int, batch_tile: int, frame_tile: int,
                         interpret: bool = False) -> jnp.ndarray:
    """coeffs: [B, nf_padded, W] with k-1 zero frames prepended and the tail
    zero-padded; out_len == num_chunks * frame_tile * hop."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, nf_padded, w_padded = coeffs.shape  # W lane-padded by the wrapper
    two_w = 2 * window_size
    overlap = -(-two_w // hop)
    span = frame_tile * hop
    local_frames = frame_tile + overlap - 1
    window = -(-local_frames // _SUBLANE) * _SUBLANE  # aligned DMA window
    num_chunks = out_len // span
    grid = (batch // batch_tile, num_chunks)
    wbt = _windowed_basis_np(window_size).T * (IMDCT_SCALING_FACTOR
                                               / window_size)  # [W, 2W]
    if w_padded > window_size:  # zero basis rows for the padded coeff lanes
        import numpy as _np
        wbt = _np.concatenate(
            [wbt, _np.zeros((w_padded - window_size, two_w), wbt.dtype)])
    wbt = jnp.asarray(wbt)

    def kernel(coeffs_hbm, wbt_ref, out_ref, coeff_buf, acc, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        copy = pltpu.make_async_copy(
            coeffs_hbm.at[pl.ds(i * batch_tile, batch_tile),
                          pl.ds(j * frame_tile, window), :],
            coeff_buf, sem)
        copy.start()
        acc[:] = jnp.zeros_like(acc)
        copy.wait()
        # ONE MXU matmul for every local frame (BT*window rows), then a
        # VPU overlap-add loop over the result slices.
        frames_all = jnp.dot(
            coeff_buf[:].reshape(batch_tile * window, w_padded), wbt_ref[:],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST
        ).reshape(batch_tile, window, two_w)
        for m in range(local_frames):
            offset = two_w + (m - (overlap - 1)) * hop
            acc[:, offset:offset + two_w] = (
                acc[:, offset:offset + two_w] + frames_all[:, m])
        out_ref[:] = acc[:, two_w:two_w + span]

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # coeffs stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),     # basis resident
        ],
        out_specs=pl.BlockSpec((batch_tile, span), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, out_len), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((batch_tile, window, w_padded), jnp.float32),
            pltpu.VMEM((batch_tile, two_w + span + two_w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(coeffs, wbt)


def imdct_pallas(X: jnp.ndarray, window_size: int = 576,
                 hop_size: int | None = None,
                 config: MDCTConfig | None = None,
                 batch_tile: int = DEFAULT_BATCH_TILE,
                 frame_tile: int = DEFAULT_FRAME_TILE,
                 interpret: bool = False) -> jnp.ndarray:
    """Fused inverse MDCT: ``(..., nf, W) -> (..., (nf-1)*hop + 2W)``.

    Matches :func:`meanflow_audio_codec_tpu.ops.mdct.imdct` (incl. the
    ``normalize`` option via config); XLA fallback off-TPU.
    """
    normalize = False
    if config is not None:
        window_size, hop = config.window_size, config.hop_size
        normalize = config.normalize
    else:
        cfg = MDCTConfig(window_size=window_size, hop_size=hop_size)
        window_size, hop = cfg.window_size, cfg.hop_size

    X = jnp.asarray(X)
    if not (_pallas_available() or interpret):
        return _imdct_direct(X, window_size, hop, normalize)

    original_shape = X.shape
    x3d = X.reshape(-1, original_shape[-2], original_shape[-1]).astype(
        jnp.float32)
    batch, nf, _ = x3d.shape
    out_len = output_length(nf, window_size, hop)
    two_w = 2 * window_size
    overlap = -(-two_w // hop)
    span = frame_tile * hop
    out_padded = -(-out_len // span) * span
    num_chunks = out_padded // span
    local_frames = frame_tile + overlap - 1
    window = -(-local_frames // _SUBLANE) * _SUBLANE
    # front pad: k-1 zero frames; tail pad so the last chunk's full DMA
    # window exists; lane-pad W to a 128 multiple (DMA tiling constraint)
    front = overlap - 1
    needed = (num_chunks - 1) * frame_tile + window
    tail = max(0, needed - (front + nf))
    w_pad = (-window_size) % 128
    batch_tile_eff = max(_SUBLANE, min(batch_tile, batch))
    pad_b = (-batch) % batch_tile_eff
    x3d = jnp.pad(x3d, ((0, pad_b), (front, tail), (0, w_pad)))
    signal = _imdct_pallas_core(x3d, window_size, hop, out_padded,
                                batch_tile_eff, frame_tile, interpret)
    signal = signal[:batch, :out_len]
    if normalize:
        signal = signal * (hop / window_size)
    return signal.reshape(original_shape[:-2] + (out_len,)).astype(X.dtype)
