"""MDCT correctness: both TPU kernels vs the NumPy oracle.

Mirrors the reference contract (reference test/test_mdct.py:13-56, tolerance
rtol 1e-4 / atol 1e-3 at window 256, hop 128) and extends it: FFT path,
non-standard hops, batched/stereo inputs, jit round-trip, Princen-Bradley
perfect reconstruction in the steady-state region.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meanflow_audio_codec_tpu.ops.mdct import (
    MDCTConfig,
    imdct,
    imdct_direct,
    imdct_fft,
    mdct,
    mdct_direct,
    mdct_fft,
    num_frames_for_length,
    output_length,
    sine_window,
)

from oracles import imdct_baseline, mdct_baseline

RTOL, ATOL = 1e-4, 1e-3


def test_mdct_matches_oracle_reference_contract():
    """The exact reference test configuration: W=256, hop=128, T=1024."""
    np.random.seed(42)
    window_size, hop_size, signal_length = 256, 128, 1024
    x_np = np.random.randn(signal_length).astype(np.float32)

    X_baseline = mdct_baseline(x_np, window_size, hop_size)
    X_optimized = np.asarray(mdct(jnp.array(x_np), window_size, hop_size))

    assert X_baseline.shape[1:] == X_optimized.shape
    np.testing.assert_allclose(X_baseline.squeeze(0), X_optimized,
                               rtol=RTOL, atol=ATOL)

    x_recon_baseline = imdct_baseline(X_baseline, window_size, hop_size)
    x_recon = np.asarray(imdct(jnp.array(X_optimized), window_size, hop_size))
    min_len = min(x_recon_baseline.shape[-1], x_recon.shape[-1], signal_length)
    np.testing.assert_allclose(x_recon_baseline.squeeze(0)[..., :min_len],
                               x_recon[..., :min_len], rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("window_size,hop,length", [
    (64, 32, 512),
    (128, 64, 2048),
    (256, 128, 1024),
    (512, 256, 4096),
    (576, 288, 30000),   # non-power-of-two default window
    (64, 48, 1000),      # hop not dividing 2W (general overlap-add path)
    (128, 128, 2048),    # hop == W
])
@pytest.mark.parametrize("kernel", ["direct", "fft"])
def test_both_kernels_match_oracle(window_size, hop, length, kernel):
    rng = np.random.default_rng(window_size + hop)
    x = rng.standard_normal((3, length)).astype(np.float32)

    fwd = mdct_direct if kernel == "direct" else mdct_fft
    inv = imdct_direct if kernel == "direct" else imdct_fft

    X_oracle = mdct_baseline(x, window_size, hop)
    X = np.asarray(fwd(jnp.array(x), window_size, hop))
    np.testing.assert_allclose(X, X_oracle, rtol=RTOL, atol=ATOL)

    recon_oracle = imdct_baseline(X_oracle, window_size, hop)
    recon = np.asarray(inv(jnp.array(X_oracle.astype(np.float32)),
                           window_size, hop))
    np.testing.assert_allclose(recon, recon_oracle, rtol=RTOL, atol=ATOL)


def test_perfect_reconstruction_steady_state():
    """Princen-Bradley PR: interior samples reconstruct the input.

    With the sine window and hop = W (50% overlap of the 2W frames) the
    overlap-add of windowed IMDCT frames cancels time-domain aliasing; the
    first and last W samples lack a full complement of overlapping frames.
    """
    rng = np.random.default_rng(7)
    window_size = 128
    hop = window_size
    length = 2048
    x = rng.standard_normal((2, length)).astype(np.float32)
    X = mdct(jnp.array(x), window_size, hop)
    recon = np.asarray(imdct(X, window_size, hop))
    np.testing.assert_allclose(recon[:, window_size:length - window_size],
                               x[:, window_size:length - window_size],
                               rtol=1e-3, atol=1e-3)


def test_roundtrip_gain_convention_and_normalize():
    """At hop = W/2 the reference convention reconstructs 2x the input
    (two interleaved TDAC reconstructions sum); normalize=True removes the
    W/hop gain for unity round-trip at any hop."""
    rng = np.random.default_rng(5)
    window_size, hop, length = 256, 128, 4096
    x = rng.standard_normal((1, length)).astype(np.float32)
    interior = slice(2 * window_size, length - 2 * window_size)

    X = mdct(jnp.array(x), window_size, hop)
    raw = np.asarray(imdct(X, window_size, hop))
    np.testing.assert_allclose(raw[:, interior], 2.0 * x[:, interior],
                               rtol=1e-3, atol=1e-3)

    cfg = MDCTConfig(window_size=window_size, hop_size=hop, normalize=True)
    unity = np.asarray(imdct(X, config=cfg))
    np.testing.assert_allclose(unity[:, interior], x[:, interior],
                               rtol=1e-3, atol=1e-3)


def test_batched_and_multidim_shapes():
    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 3, 2048)).astype(np.float32)  # extra leading dim
    X = mdct(jnp.array(x), 128, 64)
    nf = num_frames_for_length(2048, 128, 64)
    assert X.shape == (2, 3, nf, 128)
    recon = imdct(X, 128, 64)
    assert recon.shape == (2, 3, output_length(nf, 128, 64))


def test_short_signal_single_frame():
    x = jnp.ones((1, 50), dtype=jnp.float32)  # shorter than window
    X = mdct(x, 256, 128)
    assert X.shape == (1, 1, 256)


def test_config_object_and_defaults():
    cfg = MDCTConfig(window_size=512, hop_size=256)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4096)),
                    dtype=jnp.float32)
    X = mdct(x, config=cfg)
    assert X.shape[-1] == 512
    assert MDCTConfig(window_size=100).hop_size == 50
    with pytest.raises(ValueError):
        MDCTConfig(window_size=0)
    with pytest.raises(ValueError):
        MDCTConfig(window_size=8, hop_size=-1)


def test_sine_window_princen_bradley():
    w = np.asarray(sine_window(512))
    assert w.shape == (512,)
    # w[n]^2 + w[n + N/2]^2 == 1 for the half-shifted window pair.
    np.testing.assert_allclose(w[:256] ** 2 + w[256:] ** 2, 1.0, atol=1e-5)


def test_mdct_under_jit():
    """Transforms must trace cleanly inside jit (static shapes)."""
    @jax.jit
    def roundtrip(x):
        return imdct(mdct(x, 128, 64), 128, 64)

    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 1024)),
                    dtype=jnp.float32)
    out = roundtrip(x)
    nf = num_frames_for_length(1024, 128, 64)
    assert out.shape == (2, output_length(nf, 128, 64))


def test_invalid_inputs():
    with pytest.raises(ValueError):
        mdct(jnp.float32(1.0))
    with pytest.raises(ValueError):
        imdct(jnp.ones((8,)), 4)


def test_fft_route_guarded_on_complex_free_backend(monkeypatch):
    """When the backend lacks complex64 (axon TPU), W >= threshold must fall
    back to the direct matmul path with a warning instead of crashing."""
    import sys
    import warnings
    # ops/__init__ rebinds the `mdct` attribute to the function; fetch the
    # module itself for monkeypatching
    m = sys.modules["meanflow_audio_codec_tpu.ops.mdct"]

    x = jnp.asarray(np.random.default_rng(0).standard_normal(4096),
                    dtype=jnp.float32)
    monkeypatch.setattr(m, "_backend_supports_complex", lambda name: False)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        guarded = m.mdct(x, window_size=512, use_fft_threshold=512)
    assert any(issubclass(w.category, RuntimeWarning) for w in caught)
    direct = m.mdct_direct(x, window_size=512)
    np.testing.assert_allclose(np.asarray(guarded), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)

    # with complex support the FFT path is used and matches the direct path
    monkeypatch.setattr(m, "_backend_supports_complex", lambda name: True)
    via_fft = m.mdct(x, window_size=512, use_fft_threshold=512)
    np.testing.assert_allclose(np.asarray(via_fft), np.asarray(direct),
                               rtol=1e-4, atol=1e-3)
