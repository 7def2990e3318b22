"""MDCT / IMDCT — TPU-native lapped transform.

Re-design of the reference transform (meanflow_audio_codec/preprocessing/
mdct.py:38-541) with identical math but a TPU-first execution strategy:

  * **Framing** is one static gather (``x[:, idx]`` with a precomputed
    [n_frames, 2W] index matrix) instead of a vmap of per-frame
    ``dynamic_slice`` — a single XLA gather the compiler can fuse.
  * **The transform itself is one MXU matmul**: all (batch x frames) rows hit
    a precomputed [2W, W] cosine basis as ``(B*nf, 2W) @ (2W, W)``. On TPU
    this direct path is speed-of-light for any codec-scale window (W <= 4096
    keeps the basis well under 1% of HBM and the matmul squarely on the
    128x128 systolic array); the asymptotically-cheaper FFT path is kept for
    very large windows and capability parity.
  * **Overlap-add is k static shifted adds** (k = ceil(2W/hop) overlapping
    frames, k = 4 at the default hop = W/2) on an hop-chunked output view —
    no ``lax.scan`` serialisation (reference mdct.py:517-540) and no
    dynamic scatter.
  * All internal compute is float32 irrespective of input dtype so the
    perfect-reconstruction contract (rtol 1e-4 / atol 1e-3 vs the NumPy
    oracle) holds even when the surrounding model runs bfloat16.

Transform convention (matches reference mdct.py:101-136, 410-422 and the
test oracle test/test_mdct_utils.py):

  window  w[n]   = sin(pi (n + 1/2) / (2W)),                 n in [0, 2W)
  forward X[k]   = sum_n x_f[n] w[n] cos(pi/W (n + W/2 + 1/2)(k + 1/2))
  inverse y[n]   = (2/W) sum_k X[k] cos(...) * w[n], overlap-added at hop
  frames  nf     = 1 if T < W else (T - W)//hop + 1, signal zero-padded to
                   (nf-1) hop + 2W; reconstruction length (nf-1) hop + 2W.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_WINDOW_SIZE = 576
DEFAULT_FFT_THRESHOLD = 4096  # direct matmul owns the MXU up to this W
PRINCEN_BRADLEY_OFFSET = 0.5
IMDCT_SCALING_FACTOR = 2.0


@functools.lru_cache(maxsize=None)
def _backend_supports_complex(backend_name: str) -> bool:
    """Probe whether the default backend can execute complex64 ops.

    The axon TPU backend rejects complex dtypes, so the FFT MDCT path
    (complex twiddles) must not auto-route there.  The probe runs one tiny
    eager complex multiply; it is cached per backend name so it executes at
    most once per process (and is an independent eager dispatch even when
    called while tracing).
    """
    del backend_name  # cache key only
    try:
        z = jnp.asarray([1.0 + 0.0j], dtype=jnp.complex64)
        jax.block_until_ready(jnp.fft.fft(z * z))
        return True
    except Exception:
        return False


def _use_fft_path(window_size: int, threshold: int) -> bool:
    """FFT route only when W >= threshold AND the backend supports complex."""
    if window_size < threshold:
        return False
    if _backend_supports_complex(jax.default_backend()):
        return True
    import warnings

    warnings.warn(
        f"MDCT window {window_size} >= fft threshold {threshold} but backend "
        f"'{jax.default_backend()}' lacks complex64 support; falling back to "
        "the direct matmul path (identical coefficients, O(W^2) per frame).",
        RuntimeWarning, stacklevel=3)
    return False


@dataclass(frozen=True)
class MDCTConfig:
    """Static MDCT parameters; frozen so it can be a jit static argument.

    Attributes:
        window_size: number of coefficients W per frame (frame length 2W).
        hop_size: stride between frames; defaults to W // 2.
        use_fft_threshold: minimum W at which the FFT path replaces the
            direct MXU-matmul path.
    """

    window_size: int = DEFAULT_WINDOW_SIZE
    hop_size: int | None = None
    use_fft_threshold: int = DEFAULT_FFT_THRESHOLD
    #: The reference overlap-add convention reconstructs with a pure gain of
    #: W/hop (exactly 2x at the default hop = W/2; aliasing still cancels).
    #: Set True to divide the IMDCT output by that gain for unity round-trip.
    normalize: bool = False

    def __post_init__(self) -> None:
        if self.window_size <= 0:
            raise ValueError(f"window_size must be positive, got {self.window_size}")
        if self.hop_size is not None and self.hop_size <= 0:
            raise ValueError(f"hop_size must be positive, got {self.hop_size}")
        if self.use_fft_threshold <= 0:
            raise ValueError(
                f"use_fft_threshold must be positive, got {self.use_fft_threshold}"
            )
        if self.hop_size is None:
            object.__setattr__(self, "hop_size", self.window_size // 2)


# ============================================================================
# Precomputed constants (host-side, cached; become XLA constants under jit)
# ============================================================================


def sine_window(window_length: int) -> jnp.ndarray:
    """Princen-Bradley sine window w[n] = sin(pi (n + 1/2) / N)."""
    if window_length <= 0:
        raise ValueError(f"Window length must be positive, got {window_length}")
    n = jnp.arange(window_length, dtype=jnp.float32)
    return jnp.sin(jnp.pi * (n + PRINCEN_BRADLEY_OFFSET) / window_length)


@functools.lru_cache(maxsize=32)
def _window_np(window_size: int) -> np.ndarray:
    n = np.arange(2 * window_size, dtype=np.float64)
    w = np.sin(np.pi * (n + PRINCEN_BRADLEY_OFFSET) / (2 * window_size))
    return w.astype(np.float32)


@functools.lru_cache(maxsize=32)
def _basis_np(window_size: int) -> np.ndarray:
    """[2W, W] cosine basis, computed in f64 then stored f32."""
    n = np.arange(2 * window_size, dtype=np.float64)[:, None]
    k = np.arange(window_size, dtype=np.float64)[None, :]
    basis = np.cos(np.pi / window_size
                   * (n + window_size / 2 + PRINCEN_BRADLEY_OFFSET)
                   * (k + PRINCEN_BRADLEY_OFFSET))
    return basis.astype(np.float32)


@functools.lru_cache(maxsize=32)
def _windowed_basis_np(window_size: int) -> np.ndarray:
    """Window folded into the basis: forward = frames @ (w[:, None] * basis).

    Folding the diagonal window into the [2W, W] matmul operand removes the
    elementwise pre-multiply entirely — one MXU op does window + transform.
    """
    w = _window_np(window_size).astype(np.float64)
    n = np.arange(2 * window_size, dtype=np.float64)[:, None]
    k = np.arange(window_size, dtype=np.float64)[None, :]
    basis = np.cos(np.pi / window_size
                   * (n + window_size / 2 + PRINCEN_BRADLEY_OFFSET)
                   * (k + PRINCEN_BRADLEY_OFFSET))
    return (w[:, None] * basis).astype(np.float32)


@functools.lru_cache(maxsize=32)
def _fft_twiddles_np(window_size: int) -> tuple[np.ndarray, np.ndarray]:
    """(pre[2W], post[W]) complex64 twiddles for the 2W-point FFT route.

    Derivation: split the basis phase
    theta(n,k) = (pi/W) n k + (pi/2W) n + (pi/2)(k+1/2) + (pi/2W)(k+1/2)
    so X[k] = Re( FFT_{2W}(xw * pre)[k] * post[k] ) with
    pre[n] = exp(-i pi n / 2W), post[k] = exp(-i pi (k+1/2)(1/(2W) + 1/2) * ...).
    """
    two_w = 2 * window_size
    n = np.arange(two_w, dtype=np.float64)
    k = np.arange(window_size, dtype=np.float64)
    pre = np.exp(-1j * np.pi * n / two_w)
    post = np.exp(-1j * np.pi * (k + PRINCEN_BRADLEY_OFFSET)
                  * (1.0 / two_w + 0.5))
    return pre.astype(np.complex64), post.astype(np.complex64)


@functools.lru_cache(maxsize=128)
def _frame_indices_np(num_frames: int, window_size: int, hop: int) -> np.ndarray:
    """[nf, 2W] int32 gather index matrix: row f = f*hop + [0, 2W)."""
    starts = np.arange(num_frames, dtype=np.int32)[:, None] * hop
    offsets = np.arange(2 * window_size, dtype=np.int32)[None, :]
    return starts + offsets


# ============================================================================
# Shape bookkeeping
# ============================================================================


def num_frames_for_length(time_length: int, window_size: int, hop: int) -> int:
    """Frame count convention shared with the reference (mdct.py:491)."""
    if time_length < window_size:
        return 1
    return (time_length - window_size) // hop + 1


def output_length(num_frames: int, window_size: int, hop: int) -> int:
    """Reconstruction length for a given frame count."""
    return (num_frames - 1) * hop + 2 * window_size


def _prepare_signal(x: jnp.ndarray, window_size: int, hop: int):
    """Flatten leading dims, zero-pad to the framed length.

    Returns (x2d [B, T_pad], num_frames, original_shape).
    """
    original_shape = x.shape
    x2d = x.reshape(-1, original_shape[-1])
    time_length = x2d.shape[1]
    nf = num_frames_for_length(time_length, window_size, hop)
    required = output_length(nf, window_size, hop)
    if time_length < required:
        x2d = jnp.pad(x2d, ((0, 0), (0, required - time_length)))
    return x2d, nf, original_shape


def _frame(x2d: jnp.ndarray, num_frames: int, window_size: int,
           hop: int) -> jnp.ndarray:
    """[B, T] -> [B, nf, 2W] via one static gather."""
    idx = jnp.asarray(_frame_indices_np(num_frames, window_size, hop))
    return x2d[:, idx]


# ============================================================================
# Forward / inverse kernels
# ============================================================================


def _mdct_direct(x: jnp.ndarray, window_size: int, hop: int) -> jnp.ndarray:
    x2d, nf, original_shape = _prepare_signal(x, window_size, hop)
    frames = _frame(x2d.astype(jnp.float32), nf, window_size, hop)
    wb = jnp.asarray(_windowed_basis_np(window_size))
    coeffs = jnp.einsum("bfn,nk->bfk", frames, wb,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
    return coeffs.reshape(original_shape[:-1] + (nf, window_size)).astype(x.dtype)


def _mdct_fft(x: jnp.ndarray, window_size: int, hop: int) -> jnp.ndarray:
    x2d, nf, original_shape = _prepare_signal(x, window_size, hop)
    frames = _frame(x2d.astype(jnp.float32), nf, window_size, hop)
    window = jnp.asarray(_window_np(window_size))
    pre_np, post_np = _fft_twiddles_np(window_size)
    pre, post = jnp.asarray(pre_np), jnp.asarray(post_np)
    g = (frames * window).astype(jnp.complex64) * pre
    spectrum = jnp.fft.fft(g, axis=-1)[..., :window_size]
    coeffs = jnp.real(spectrum * post)
    return coeffs.reshape(original_shape[:-1] + (nf, window_size)).astype(x.dtype)


def _overlap_add(frames: jnp.ndarray, hop: int, out_len: int) -> jnp.ndarray:
    """Vectorised overlap-add: k = ceil(L/hop) static shifted adds.

    frames: [B, nf, L]. Views the output as hop-sized chunks; chunk c
    accumulates frames[c - j, j-th hop slice] for j in [0, k). Each j is a
    static-slice add XLA fuses — no scan, no scatter.
    """
    batch, nf, frame_len = frames.shape
    k = -(-frame_len // hop)  # ceil
    pad = k * hop - frame_len
    if pad:
        frames = jnp.pad(frames, ((0, 0), (0, 0), (0, pad)))
    chunks = frames.reshape(batch, nf, k, hop)
    num_out_chunks = nf - 1 + k
    out = jnp.zeros((batch, num_out_chunks, hop), dtype=frames.dtype)
    for j in range(k):
        out = out.at[:, j:j + nf].add(chunks[:, :, j])
    return out.reshape(batch, num_out_chunks * hop)[:, :out_len]


def _prepare_coeffs(X: jnp.ndarray, window_size: int, hop: int):
    original_shape = X.shape
    X3d = X.reshape(-1, original_shape[-2], original_shape[-1])
    nf = X3d.shape[1]
    return X3d, nf, output_length(nf, window_size, hop), original_shape


def _imdct_direct(X: jnp.ndarray, window_size: int, hop: int,
                  normalize: bool = False) -> jnp.ndarray:
    X3d, nf, out_len, original_shape = _prepare_coeffs(X, window_size, hop)
    wb = jnp.asarray(_windowed_basis_np(window_size))
    scale = IMDCT_SCALING_FACTOR / window_size
    if normalize:
        scale *= hop / window_size
    frames = scale * jnp.einsum("bfk,nk->bfn", X3d.astype(jnp.float32), wb,
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
    signal = _overlap_add(frames, hop, out_len)
    return signal.reshape(original_shape[:-2] + (out_len,)).astype(X.dtype)


def _imdct_fft(X: jnp.ndarray, window_size: int, hop: int,
               normalize: bool = False) -> jnp.ndarray:
    X3d, nf, out_len, original_shape = _prepare_coeffs(X, window_size, hop)
    window = jnp.asarray(_window_np(window_size))
    pre_np, post_np = _fft_twiddles_np(window_size)
    pre, post = jnp.asarray(pre_np), jnp.asarray(post_np)
    two_w = 2 * window_size
    a = X3d.astype(jnp.complex64) * jnp.conj(post)
    a = jnp.pad(a, ((0, 0), (0, 0), (0, window_size)))
    # y[n] = (2/W) Re(conj(pre[n]) * sum_k A[k] e^{2pi i nk/2W}); the k-sum is
    # 2W * ifft_{2W}(A)[n], so the folded scalar is (2/W) * 2W = 4.
    scale = IMDCT_SCALING_FACTOR / window_size * two_w
    if normalize:
        scale *= hop / window_size
    y = jnp.fft.ifft(a, axis=-1) * scale
    frames = jnp.real(y * jnp.conj(pre)) * window
    signal = _overlap_add(frames, hop, out_len)
    return signal.reshape(original_shape[:-2] + (out_len,)).astype(X.dtype)


# ============================================================================
# Public API
# ============================================================================


def _resolve(config: MDCTConfig | None, window_size: int, hop_size: int | None,
             use_fft_threshold: int,
             normalize: bool = False) -> tuple[int, int, int, bool]:
    if config is not None:
        return (config.window_size, config.hop_size, config.use_fft_threshold,
                config.normalize)
    cfg = MDCTConfig(window_size=window_size, hop_size=hop_size,
                     use_fft_threshold=use_fft_threshold, normalize=normalize)
    return cfg.window_size, cfg.hop_size, cfg.use_fft_threshold, cfg.normalize


def mdct(x: jnp.ndarray, window_size: int = DEFAULT_WINDOW_SIZE,
         hop_size: int | None = None,
         use_fft_threshold: int = DEFAULT_FFT_THRESHOLD,
         config: MDCTConfig | None = None) -> jnp.ndarray:
    """Forward MDCT: ``(..., T) -> (..., n_frames, window_size)``.

    Selects the direct MXU-matmul kernel for W < use_fft_threshold, else the
    O(N log N) FFT kernel. Both produce identical coefficients (tested to
    the reference oracle tolerances).
    """
    x = jnp.asarray(x)
    if x.ndim == 0:
        raise ValueError("Input must have at least 1 dimension")
    window_size, hop, threshold, _ = _resolve(config, window_size, hop_size,
                                              use_fft_threshold)
    if _use_fft_path(window_size, threshold):
        return _mdct_fft(x, window_size, hop)
    return _mdct_direct(x, window_size, hop)


def imdct(X: jnp.ndarray, window_size: int = DEFAULT_WINDOW_SIZE,
          hop_size: int | None = None,
          use_fft_threshold: int = DEFAULT_FFT_THRESHOLD,
          config: MDCTConfig | None = None) -> jnp.ndarray:
    """Inverse MDCT: ``(..., n_frames, W) -> (..., (nf-1)*hop + 2W)``."""
    X = jnp.asarray(X)
    if X.ndim < 2:
        raise ValueError(
            f"Input must have at least 2 dims (n_frames, window), got {X.shape}"
        )
    window_size, hop, threshold, normalize = _resolve(
        config, window_size, hop_size, use_fft_threshold)
    if _use_fft_path(window_size, threshold):
        return _imdct_fft(X, window_size, hop, normalize)
    return _imdct_direct(X, window_size, hop, normalize)


# Explicit-path aliases for benchmarking / parity with the reference API.
def mdct_fft(x, window_size: int, hop_size: int | None = None):
    """FFT-path forward MDCT (reference mdct.py:263-287 counterpart)."""
    cfg = MDCTConfig(window_size=window_size, hop_size=hop_size)
    return _mdct_fft(jnp.asarray(x), cfg.window_size, cfg.hop_size)


def imdct_fft(X, window_size: int, hop_size: int | None = None):
    """FFT-path inverse MDCT (reference mdct.py:290-314 counterpart)."""
    cfg = MDCTConfig(window_size=window_size, hop_size=hop_size)
    return _imdct_fft(jnp.asarray(X), cfg.window_size, cfg.hop_size)


def mdct_direct(x, window_size: int, hop_size: int | None = None):
    """Direct (MXU matmul) forward MDCT."""
    cfg = MDCTConfig(window_size=window_size, hop_size=hop_size)
    return _mdct_direct(jnp.asarray(x), cfg.window_size, cfg.hop_size)


def imdct_direct(X, window_size: int, hop_size: int | None = None):
    """Direct (MXU matmul) inverse MDCT."""
    cfg = MDCTConfig(window_size=window_size, hop_size=hop_size)
    return _imdct_direct(jnp.asarray(X), cfg.window_size, cfg.hop_size)
