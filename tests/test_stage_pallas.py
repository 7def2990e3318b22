"""Fused stage kernels (ops/stage_pallas.py): interpreter-mode parity with
the unfused chain, under every transform the objectives use — forward,
jax.jvp, jax.grad, and grad-of-jvp (the iMF structure)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meanflow_audio_codec_tpu.models.blocks import (
    ConvNeXtBlock,
    FiLM,
    _adaln_norm,
)
from meanflow_audio_codec_tpu.ops.stage_pallas import (
    _gelu_grn_ref,
    _ln_film_ref,
    fused_gelu_grn,
    fused_ln_film,
    fused_ln_norm,
)

B, P, C = 4, 16, 256


def _chain_ln_film(x3, scale, shift):
    """The unfused model chain: _adaln_norm then FiLM modulation."""
    h = _adaln_norm(x3)
    return (1.0 + scale[:, None, :]) * h + shift[:, None, :]


def _chain_gelu_grn(x3, gamma, beta):
    """The unfused model chain: tanh-GELU then GRN (blocks.py math)."""
    g = jax.nn.gelu(x3, approximate=True)
    gx = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32)), axis=1,
                          keepdims=True) + 1e-12)
    nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
    return (g * (gamma + nx.astype(g.dtype))
            + jnp.asarray(beta, dtype=g.dtype)).astype(x3.dtype)


def _rand(key, *shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype=jnp.float32).astype(dtype)


@pytest.fixture
def data():
    k = jax.random.split(jax.random.PRNGKey(0), 6)
    return {
        "x": _rand(k[0], B, P, C),
        "s": 0.1 * _rand(k[1], B, C),
        "b": 0.1 * _rand(k[2], B, C),
        "tx": _rand(k[3], B, P, C),
        "ts": 0.1 * _rand(k[4], B, C),
        "tb": 0.1 * _rand(k[5], B, C),
    }


# ---------------------------------------------------------------------------
# forward parity (interpreter-mode kernels vs the unfused model chain)
# ---------------------------------------------------------------------------


def test_ln_film_forward_matches_chain(data):
    y = fused_ln_film(data["x"], data["s"], data["b"], True)
    ref = _chain_ln_film(data["x"], data["s"], data["b"])
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)


def test_ln_norm_forward_matches_chain(data):
    y = fused_ln_norm(data["x"], True)
    np.testing.assert_allclose(y, _adaln_norm(data["x"]), rtol=1e-5,
                               atol=1e-5)


def test_gelu_grn_forward_matches_chain(data):
    gamma = 0.5 * _rand(jax.random.PRNGKey(7), C)
    beta = 0.1 * _rand(jax.random.PRNGKey(8), C)
    y = fused_gelu_grn(data["x"], gamma, beta, True)
    ref = _chain_gelu_grn(data["x"], gamma, beta)
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)


def test_ln_film_bfloat16_forward(data):
    x16 = data["x"].astype(jnp.bfloat16)
    s16 = data["s"].astype(jnp.bfloat16)
    b16 = data["b"].astype(jnp.bfloat16)
    y = fused_ln_film(x16, s16, b16, True)
    assert y.dtype == jnp.bfloat16
    ref = _chain_ln_film(x16, s16, b16)
    np.testing.assert_allclose(y.astype(np.float32), ref.astype(np.float32),
                               rtol=0.05, atol=0.05)


def test_unaligned_channels_fall_back(data):
    # C=100 is not lane-aligned: takes the jnp reference path, still correct
    x = data["x"][..., :100]
    s, b = data["s"][:, :100], data["b"][:, :100]
    y = fused_ln_film(x, s, b, False)
    np.testing.assert_allclose(y, _chain_ln_film(x, s, b), rtol=1e-5,
                               atol=1e-5)


# ---------------------------------------------------------------------------
# jvp parity
# ---------------------------------------------------------------------------


def test_ln_film_jvp_matches_chain(data):
    primals = (data["x"], data["s"], data["b"])
    tangents = (data["tx"], data["ts"], data["tb"])
    y, ty = jax.jvp(lambda *a: fused_ln_film(*a, True), primals, tangents)
    yr, tyr = jax.jvp(_chain_ln_film, primals, tangents)
    np.testing.assert_allclose(y, yr, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ty, tyr, rtol=1e-4, atol=1e-4)


def test_gelu_grn_jvp_matches_chain(data):
    gamma = 0.5 * _rand(jax.random.PRNGKey(7), C)
    beta = 0.1 * _rand(jax.random.PRNGKey(8), C)
    tg = 0.1 * _rand(jax.random.PRNGKey(9), C)
    tb2 = 0.1 * _rand(jax.random.PRNGKey(10), C)
    primals = (data["x"], gamma, beta)
    tangents = (data["tx"], tg, tb2)
    y, ty = jax.jvp(lambda *a: fused_gelu_grn(*a, True), primals, tangents)
    yr, tyr = jax.jvp(_chain_gelu_grn, primals, tangents)
    np.testing.assert_allclose(y, yr, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ty, tyr, rtol=1e-4, atol=1e-4)


def test_ln_norm_jvp_matches_chain(data):
    y, ty = jax.jvp(lambda x: fused_ln_norm(x, True), (data["x"],),
                    (data["tx"],))
    yr, tyr = jax.jvp(_adaln_norm, (data["x"],), (data["tx"],))
    np.testing.assert_allclose(y, yr, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ty, tyr, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# reverse-mode parity (transposition of the custom_jvp rule)
# ---------------------------------------------------------------------------


def test_ln_film_grad_matches_chain(data):
    def scalar(fn):
        def wrapped(x, s, b):
            y = fn(x, s, b)
            return jnp.sum(jnp.sin(y))  # nonlinear readout
        return wrapped

    g = jax.grad(scalar(lambda *a: fused_ln_film(*a, True)),
                 argnums=(0, 1, 2))(data["x"], data["s"], data["b"])
    gr = jax.grad(scalar(_chain_ln_film),
                  argnums=(0, 1, 2))(data["x"], data["s"], data["b"])
    for a, b_ in zip(g, gr):
        np.testing.assert_allclose(a, b_, rtol=1e-4, atol=1e-4)


def test_gelu_grn_grad_matches_chain(data):
    gamma = 0.5 * _rand(jax.random.PRNGKey(7), C)
    beta = 0.1 * _rand(jax.random.PRNGKey(8), C)

    def scalar(fn):
        return lambda x, g_, b_: jnp.sum(jnp.tanh(fn(x, g_, b_)))

    g = jax.grad(scalar(lambda *a: fused_gelu_grn(*a, True)),
                 argnums=(0, 1, 2))(data["x"], gamma, beta)
    gr = jax.grad(scalar(_chain_gelu_grn),
                  argnums=(0, 1, 2))(data["x"], gamma, beta)
    for a, b_ in zip(g, gr):
        np.testing.assert_allclose(a, b_, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# grad-of-jvp parity (the improved-mean-flow differentiation structure)
# ---------------------------------------------------------------------------


def test_ln_film_grad_of_jvp_matches_chain(data):
    def loss(fn):
        def wrapped(x, s, b, v):
            u, du = jax.jvp(lambda z: fn(z, s, b), (x,), (v,))
            # iMF shape: compound prediction mixing primal and tangent
            return jnp.mean(jnp.square(u + 0.3 * du))
        return wrapped

    args = (data["x"], data["s"], data["b"], data["tx"])
    g = jax.grad(loss(lambda *a: fused_ln_film(*a, True)),
                 argnums=(0, 1, 2, 3))(*args)
    gr = jax.grad(loss(_chain_ln_film), argnums=(0, 1, 2, 3))(*args)
    for a, b_ in zip(g, gr):
        np.testing.assert_allclose(a, b_, rtol=1e-4, atol=1e-4)


def test_gelu_grn_grad_of_jvp_matches_chain(data):
    gamma = 0.5 * _rand(jax.random.PRNGKey(7), C)
    beta = 0.1 * _rand(jax.random.PRNGKey(8), C)

    def loss(fn):
        def wrapped(x, g_, b_, v):
            u, du = jax.jvp(lambda z: fn(z, g_, b_), (x,), (v,))
            return jnp.mean(jnp.square(u + 0.3 * du))
        return wrapped

    args = (data["x"], gamma, beta, data["tx"])
    g = jax.grad(loss(lambda *a: fused_gelu_grn(*a, True)),
                 argnums=(0, 1, 2, 3))(*args)
    gr = jax.grad(loss(_chain_gelu_grn), argnums=(0, 1, 2, 3))(*args)
    for a, b_ in zip(g, gr):
        np.testing.assert_allclose(a, b_, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# module wiring: fused flags preserve the parameter tree and the numerics
# ---------------------------------------------------------------------------


def test_film_fuse_norm_parameter_tree_unchanged():
    cond = jnp.ones((B, 32))
    x = jnp.ones((B, 8, 8, C))
    p_plain = FiLM(channels=C).init(jax.random.PRNGKey(0), x, cond)
    p_fused = FiLM(channels=C, fuse_norm=True).init(
        jax.random.PRNGKey(0), x, cond)
    assert jax.tree_util.tree_structure(p_plain) == \
        jax.tree_util.tree_structure(p_fused)


def test_convnext_block_fused_parameter_tree_unchanged():
    x = jnp.ones((B, 8, 8, C))
    p_plain = ConvNeXtBlock(dim=C).init(jax.random.PRNGKey(0), x)
    p_fused = ConvNeXtBlock(dim=C, fused_stage=True).init(
        jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p_plain) == \
        jax.tree_util.tree_structure(p_fused)


def test_convnext_block_fused_forward_close():
    # on CPU the fused flag routes through the jnp fallback inside the
    # custom_jvp wrappers — this validates the wiring & wrapper calculus
    x = 0.5 * _rand(jax.random.PRNGKey(3), B, 8, 8, C)
    params = ConvNeXtBlock(dim=C).init(jax.random.PRNGKey(0), x)
    y_plain = ConvNeXtBlock(dim=C).apply(params, x)
    y_fused = ConvNeXtBlock(dim=C, fused_stage=True).apply(params, x)
    np.testing.assert_allclose(y_plain, y_fused, rtol=1e-4, atol=1e-4)


def test_conv_flow_fused_imf_loss_and_grads_close():
    from meanflow_audio_codec_tpu.models import ConditionalConvFlow
    from meanflow_audio_codec_tpu.training import ImprovedMeanFlowObjective

    kwargs = dict(noise_dimension=64, condition_dimension=32, num_blocks=2,
                  latent_dimension=16, channels=128, bottleneck_dim=32,
                  spatial=4, lift_channels=8)
    x = 0.3 * _rand(jax.random.PRNGKey(1), 8, 64)
    plain = ConditionalConvFlow(**kwargs)
    fused = ConditionalConvFlow(**kwargs, fused_stage=True)
    params = jax.jit(lambda k: plain.init(
        k, x, jnp.zeros((8, 2)), method="init_all"))(
        jax.random.PRNGKey(0))["params"]
    obj = ImprovedMeanFlowObjective()

    def run(model):
        def wrapped(p):
            loss, aux = obj.loss(p, model.apply, jax.random.PRNGKey(5), x)
            return loss, aux
        (loss, aux), grads = jax.value_and_grad(wrapped, has_aux=True)(params)
        return loss, aux["mse"], grads

    l_p, m_p, g_p = run(plain)
    l_f, m_f, g_f = run(fused)
    np.testing.assert_allclose(l_p, l_f, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(m_p, m_f, rtol=1e-3, atol=1e-5)
    flat_p = jax.tree_util.tree_leaves(g_p)
    flat_f = jax.tree_util.tree_leaves(g_f)
    for a, b_ in zip(flat_p, flat_f):
        np.testing.assert_allclose(a, b_, rtol=5e-3, atol=5e-4)


def test_stats_refs_consistent(data):
    """The internal ref implementations agree with the model chain."""
    y, _, _ = _ln_film_ref(data["x"], data["s"], data["b"])
    np.testing.assert_allclose(
        y, _chain_ln_film(data["x"], data["s"], data["b"]),
        rtol=1e-5, atol=1e-5)
    gamma = 0.5 * _rand(jax.random.PRNGKey(7), C)
    beta = 0.1 * _rand(jax.random.PRNGKey(8), C)
    y2, _ = _gelu_grn_ref(data["x"], gamma, beta)
    np.testing.assert_allclose(y2, _chain_gelu_grn(data["x"], gamma, beta),
                               rtol=1e-5, atol=1e-5)
