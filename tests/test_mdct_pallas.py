"""Fused Pallas MDCT kernel vs the XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meanflow_audio_codec_tpu.ops.mdct import mdct_direct
from meanflow_audio_codec_tpu.ops.mdct_pallas import (
    _aligned_frame_tile,
    mdct_pallas,
)


@pytest.mark.parametrize("batch,length,window,hop", [
    (8, 48000, 576, 288),
    (3, 10000, 256, 128),
    (2, 5000, 576, 100),   # hop not lane-friendly -> frame tile realigns
    (1, 2000, 128, 64),
])
def test_pallas_matches_xla(batch, length, window, hop):
    rng = np.random.default_rng(batch + window)
    x = jnp.asarray(rng.standard_normal((batch, length)).astype(np.float32))
    ref = mdct_direct(x, window, hop)
    got = mdct_pallas(x, window, hop, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)


def test_aligned_frame_tile():
    assert _aligned_frame_tile(288, 16) == 16   # gcd(288,128)=32 -> unit 4
    assert _aligned_frame_tile(100, 16) == 32   # gcd(100,128)=4 -> unit 32
    assert _aligned_frame_tile(128, 5) == 5     # unit 1
    assert _aligned_frame_tile(288, 3) == 4


def test_pallas_cpu_fallback_without_interpret():
    """On CPU the wrapper must silently use the XLA kernel."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    out = mdct_pallas(x, 256, 128)  # no interpret -> falls back on CPU
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(mdct_direct(x, 256, 128)),
                               rtol=1e-6)


def test_pallas_custom_vjp_matches_xla_grad():
    """The linear custom VJP must agree with autodiff through the XLA path."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 3000)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((2, 21, 256)).astype(np.float32))

    def loss_pallas(a):
        y = mdct_pallas(a, 256, 128, interpret=True)
        return jnp.sum(y[:, :cot.shape[1]] * cot)

    def loss_xla(a):
        y = mdct_direct(a, 256, 128)
        return jnp.sum(y[:, :cot.shape[1]] * cot)

    g_pallas = jax.grad(loss_pallas)(x)
    g_xla = jax.grad(loss_xla)(x)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla),
                               rtol=1e-4, atol=1e-3)


def test_tokenizer_pallas_flag():
    from meanflow_audio_codec_tpu.ops.tokenize import MDCTTokenization
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    t_auto = MDCTTokenization(window_size=256).tokenize(x)       # CPU -> XLA
    t_off = MDCTTokenization(window_size=256,
                             use_pallas=False).tokenize(x)
    np.testing.assert_allclose(np.asarray(t_auto), np.asarray(t_off))
