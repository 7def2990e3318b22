"""Tokenization strategies: shape contracts and exact inverses."""

import jax.numpy as jnp
import numpy as np
import pytest

from meanflow_audio_codec_tpu.ops.tokenize import (
    Compose,
    MDCTTokenization,
    PreprocessingPipeline,
    ReshapeTokenization,
    compute_token_shape,
    compute_tokenized_dimension,
    create_tokenization_strategy,
)


def test_reshape_image_roundtrip_exact():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 28, 28)).astype(np.float32)
    tok = ReshapeTokenization(patch_size=4, image_size=28)
    tokens = tok.tokenize(jnp.array(x))
    assert tokens.shape == (4, 49, 16)
    recon = np.asarray(tok.detokenize(tokens))
    np.testing.assert_array_equal(recon, x)


def test_reshape_flat_mnist_heuristic():
    x = jnp.zeros((2, 784))
    tok = ReshapeTokenization()  # no hints: 784 -> MNIST image heuristic
    tokens = tok.tokenize(x)
    assert tokens.shape == (2, 49, 16)
    assert tok.detokenize(tokens).shape == (2, 28, 28)


def test_reshape_matches_einops_semantics():
    """Patchify must equal einops 'b (h p1) (w p2) c -> b (h w) (p1 p2 c)'."""
    einops = pytest.importorskip("einops")
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
    tok = ReshapeTokenization(patch_size=7, image_size=28)
    got = np.asarray(tok.tokenize(jnp.array(x)))
    want = einops.rearrange(x, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
                            p1=7, p2=7)
    np.testing.assert_array_equal(got, want)


def test_reshape_audio_patching_pads():
    x = jnp.ones((2, 1000))
    tok = ReshapeTokenization(patch_length=128)
    tokens = tok.tokenize(x)
    assert tokens.shape == (2, 8, 128)
    recon = tok.detokenize(tokens)
    assert recon.shape == (2, 1024)
    np.testing.assert_array_equal(np.asarray(recon[:, 1000:]), 0.0)


def test_mdct_tokenization_mono_and_stereo():
    rng = np.random.default_rng(2)
    mono = rng.standard_normal((2, 4096)).astype(np.float32)
    stereo = rng.standard_normal((2, 4096, 2)).astype(np.float32)
    tok = MDCTTokenization(window_size=256, hop_size=128)

    t_mono = tok.tokenize(jnp.array(mono))
    assert t_mono.shape[-1] == 256
    r_mono = tok.detokenize(t_mono)
    assert r_mono.ndim == 2

    t_stereo = tok.tokenize(jnp.array(stereo))
    assert t_stereo.shape[-1] == 512
    # channel-major blocks: first 256 coefficients are channel 0
    t_ch0 = tok.tokenize(jnp.array(stereo[..., 0]))
    np.testing.assert_allclose(np.asarray(t_stereo[..., :256]),
                               np.asarray(t_ch0), rtol=1e-5, atol=1e-5)
    r_stereo = tok.detokenize(t_stereo)
    assert r_stereo.ndim == 3 and r_stereo.shape[-1] == 2


def test_mdct_tokenization_rejects_bad_shapes():
    tok = MDCTTokenization(window_size=64)
    with pytest.raises(ValueError):
        tok.tokenize(jnp.zeros((2, 2, 2, 2)))
    with pytest.raises(ValueError):
        tok.detokenize(jnp.zeros((2, 4)))
    with pytest.raises(ValueError):
        tok.detokenize(jnp.zeros((2, 4, 65)))


def test_create_strategy_and_shape_probes():
    mdct_tok = create_tokenization_strategy("mdct", {"window_size": 256})
    n_tokens, token_dim = compute_token_shape(mdct_tok, (4096,))
    assert token_dim == 256
    assert compute_tokenized_dimension(mdct_tok, (4096,)) == n_tokens * 256

    reshape_tok = create_tokenization_strategy(
        "reshape", {"patch_size": 4, "image_size": 28})
    assert compute_token_shape(reshape_tok, (28, 28)) == (49, 16)
    assert compute_tokenized_dimension(reshape_tok, (28, 28)) == 784

    with pytest.raises(ValueError):
        create_tokenization_strategy("wavelet")


def test_mdct_shape_probe_closed_form_stereo():
    tok = MDCTTokenization(window_size=256, hop_size=128)
    n_tokens, token_dim = compute_token_shape(tok, (4096, 2))
    assert token_dim == 512
    probe = tok.tokenize(jnp.zeros((1, 4096, 2)))
    assert probe.shape == (1, n_tokens, token_dim)


def test_pipeline_compose_inverse_order():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 28, 28)).astype(np.float32)
    pipeline = Compose(ReshapeTokenization(patch_size=7, image_size=28))
    assert isinstance(pipeline, PreprocessingPipeline)
    recon = np.asarray(pipeline.detokenize(pipeline.tokenize(jnp.array(x))))
    np.testing.assert_array_equal(recon, x)


def test_mdct_flax_layers_mono_and_stereo():
    import jax
    from meanflow_audio_codec_tpu.ops import IMDCTLayer, MDCTLayer

    rng = np.random.default_rng(9)
    fwd = MDCTLayer(window_size=128, hop_size=64)
    inv = IMDCTLayer(window_size=128, hop_size=64)

    mono = jnp.asarray(rng.standard_normal((2, 2048)).astype(np.float32))
    X = fwd.apply({}, mono)
    assert X.shape[-1] == 128
    y = inv.apply({}, X)
    assert y.ndim == 2

    stereo = jnp.asarray(rng.standard_normal((2, 2048, 2)).astype(np.float32))
    Xs = fwd.apply({}, stereo)
    assert Xs.shape[-1] == 256  # L block ++ R block
    ys = inv.apply({}, Xs)
    assert ys.shape[-1] == 2
    # channel-major: first 128 coefficients are the left channel
    Xl = fwd.apply({}, stereo[..., 0])
    np.testing.assert_allclose(np.asarray(Xs[..., :128]), np.asarray(Xl),
                               rtol=1e-5, atol=1e-5)
    # layers are jit-safe
    out = jax.jit(lambda a: inv.apply({}, fwd.apply({}, a)))(stereo)
    assert out.shape[-1] == 2
