"""Dynamic W8A8 int8 serving path: accuracy, fallbacks, tree identity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meanflow_audio_codec_tpu.models import ConditionalConvFlow
from meanflow_audio_codec_tpu.ops.quant import (
    int8_conv_general_dilated,
    int8_dot_general,
)


def _rel_err(approx, exact):
    approx = np.asarray(approx, dtype=np.float64)
    exact = np.asarray(exact, dtype=np.float64)
    return np.linalg.norm(approx - exact) / (np.linalg.norm(exact) + 1e-12)


def test_int8_dot_matches_dense_contraction():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 96)), dtype=jnp.float32)
    w = jnp.asarray(rng.standard_normal((96, 32)), dtype=jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    exact = jax.lax.dot_general(x, w, dn)
    approx = int8_dot_general(x, w, dn)
    assert approx.dtype == exact.dtype
    # int8 with per-tensor act + per-channel weight scales: ~1e-2 relative
    assert _rel_err(approx, exact) < 0.02


def test_int8_dot_per_channel_scales_survive_column_imbalance():
    # one output column 1000x larger than the rest: per-tensor weight
    # quantization would zero the small columns entirely
    rng = np.random.default_rng(1)
    w = rng.standard_normal((64, 8)).astype(np.float32)
    w[:, 0] *= 1000.0
    x = jnp.asarray(rng.standard_normal((32, 64)), dtype=jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    exact = jax.lax.dot_general(x, jnp.asarray(w), dn)
    approx = int8_dot_general(x, jnp.asarray(w), dn)
    for col in range(8):
        assert _rel_err(approx[:, col], exact[:, col]) < 0.02, col


def test_int8_dot_exotic_contraction_falls_back_exact():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal((4, 8, 16)), dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal((4, 16, 8)), dtype=jnp.float32)
    dn = (((2,), (1,)), ((0,), (0,)))  # batched — not the Dense case
    exact = jax.lax.dot_general(a, b, dn)
    out = int8_dot_general(a, b, dn)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(exact))


@pytest.mark.parametrize("ksize", [(1, 1), (3, 3)])
def test_int8_conv_matches_lax_conv(ksize):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 8, 8, 24)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal(ksize + (24, 16)) * 0.2,
                    dtype=jnp.float32)
    dn = ("NHWC", "HWIO", "NHWC")
    exact = jax.lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                         dimension_numbers=dn)
    approx = int8_conv_general_dilated(x, k, (1, 1), "SAME",
                                       dimension_numbers=dn)
    assert approx.dtype == exact.dtype
    assert approx.shape == exact.shape
    assert _rel_err(approx, exact) < 0.02


def test_int8_conv_strided_matches_lax_conv():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 12)), dtype=jnp.float32)
    dn = ("NHWC", "HWIO", "NHWC")
    exact = jax.lax.conv_general_dilated(x, k, (2, 2), "SAME",
                                         dimension_numbers=dn)
    approx = int8_conv_general_dilated(x, k, (2, 2), "SAME",
                                       dimension_numbers=dn)
    assert approx.shape == exact.shape
    assert _rel_err(approx, exact) < 0.02


def _tiny_flow(**kw):
    return ConditionalConvFlow(noise_dimension=64, condition_dimension=32,
                               latent_dimension=16, num_blocks=2,
                               channels=24, bottleneck_dim=48, spatial=4,
                               lift_channels=8, **kw)


def test_quantized_model_param_tree_identical():
    x = jnp.zeros((2, 64))
    t = jnp.zeros((2, 2))
    p_bf = _tiny_flow().init(jax.random.PRNGKey(0), x, t, method="init_all")
    p_q = _tiny_flow(quantized=True).init(jax.random.PRNGKey(0), x, t,
                                          method="init_all")
    paths_bf = jax.tree_util.tree_structure(p_bf)
    paths_q = jax.tree_util.tree_structure(p_q)
    assert paths_bf == paths_q
    shapes = jax.tree_util.tree_map(lambda a, b: a.shape == b.shape,
                                    p_bf, p_q)
    assert all(jax.tree_util.tree_leaves(shapes))


def test_quantized_forward_tracks_bf16_forward():
    # the same checkpoint served int8 must stay close to its bf16 decode
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((8, 64)), dtype=jnp.float32)
    t = jnp.asarray(rng.uniform(0, 1, (8, 2)), dtype=jnp.float32)
    model = _tiny_flow()
    variables = model.init(jax.random.PRNGKey(0), x, t, method="init_all")
    latents = model.apply(variables, x, method="encode")
    exact = model.apply(variables, x, t, latents)
    approx = _tiny_flow(quantized=True).apply(variables, x, t, latents)
    assert _rel_err(approx, exact) < 0.05


def test_trainer_rejects_quantized_knob(tmp_path):
    from meanflow_audio_codec_tpu.configs import create_mnist_config
    from meanflow_audio_codec_tpu.training.trainer import train_flow

    config = create_mnist_config()
    config.model.architecture = "convnet"
    config.model.architecture_options = {"quantized": True}
    config.base.n_steps = 1
    config.training.workdir = str(tmp_path / "run")
    with pytest.raises(ValueError, match="serving-only"):
        train_flow(config)
