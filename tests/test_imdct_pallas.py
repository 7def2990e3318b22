"""Fused Pallas IMDCT kernel vs the XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meanflow_audio_codec_tpu.ops.imdct_pallas import imdct_pallas
from meanflow_audio_codec_tpu.ops.mdct import (
    MDCTConfig,
    imdct_direct,
    mdct_direct,
)


@pytest.mark.parametrize("batch,nf,window,hop", [
    (2, 21, 256, 128),
    (3, 40, 576, 288),
    (1, 5, 128, 64),      # fewer frames than the frame tile
    (2, 40, 576, 100),    # irregular hop
])
def test_imdct_pallas_matches_xla(batch, nf, window, hop):
    rng = np.random.default_rng(batch + nf)
    X = jnp.asarray(rng.standard_normal((batch, nf, window)).astype(np.float32))
    ref = imdct_direct(X, window, hop)
    got = imdct_pallas(X, window, hop, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_imdct_pallas_normalize():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    cfg = MDCTConfig(window_size=256, hop_size=128, normalize=True)
    X = mdct_direct(x, 256, 128)
    recon = imdct_pallas(X, config=cfg, interpret=True)
    interior = slice(512, 4096 - 512)
    np.testing.assert_allclose(np.asarray(recon)[:, interior],
                               np.asarray(x)[:, interior],
                               rtol=1e-3, atol=1e-3)


def test_imdct_pallas_cpu_fallback():
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.standard_normal((2, 10, 256)).astype(np.float32))
    out = imdct_pallas(X, 256, 128)  # CPU, no interpret -> XLA fallback
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(imdct_direct(X, 256, 128)),
                               rtol=1e-6)


def test_imdct_pallas_custom_vjp():
    rng = np.random.default_rng(2)
    X = jnp.asarray(rng.standard_normal((2, 21, 256)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal(
        imdct_direct(X, 256, 128).shape).astype(np.float32))
    g_pal = jax.grad(lambda a: jnp.sum(
        imdct_pallas(a, 256, 128, interpret=True) * cot))(X)
    g_xla = jax.grad(lambda a: jnp.sum(imdct_direct(a, 256, 128) * cot))(X)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_xla),
                               rtol=1e-4, atol=1e-5)


def test_roundtrip_pallas_pair():
    """Forward Pallas MDCT -> inverse Pallas IMDCT == XLA round trip."""
    from meanflow_audio_codec_tpu.ops.mdct_pallas import mdct_pallas
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8192)).astype(np.float32))
    X = mdct_pallas(x, 256, 128, interpret=True)
    recon = imdct_pallas(X, 256, 128, interpret=True)
    ref = imdct_direct(mdct_direct(x, 256, 128), 256, 128)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)
