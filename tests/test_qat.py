"""Quantization-aware training of the stored latent format.

The reference never defines a stored format (its latents stay float
activations, README.md:3-7), so QAT has no reference counterpart; these
tests pin the transform to *this repo's own eval-side quantizers*
(ops/latent_quant.py) — the grid the trained checkpoint will actually
serve through ``AudioCodec.encode_bytes``/``decode_bytes``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from meanflow_audio_codec_tpu.configs import create_mnist_config
from meanflow_audio_codec_tpu.models import ConditionalFlow, TrainState
from meanflow_audio_codec_tpu.ops.latent_quant import (
    LatentQAT,
    dequantize_latents,
    quantize_latents,
    quantize_latents_ecsq,
)
from meanflow_audio_codec_tpu.training import (
    ImprovedMeanFlowObjective,
    create_loss_strategy,
)

DIM, COND, LATENT, BLOCKS, BATCH = 8, 4, 4, 2, 16


def _latents(seed=0, shape=(32, 16)):
    rng = np.random.default_rng(seed)
    # static per-dim offsets + small residual, like real codec latents
    offsets = 5.0 * rng.standard_normal((1, shape[-1]))
    return jnp.asarray(
        (offsets + 0.3 * rng.standard_normal(shape)).astype(np.float32))


# ---- forward: exactly the eval grid -------------------------------------------

def test_ste_ecsq_forward_matches_eval_roundtrip():
    z = _latents()
    qat = LatentQAT(mode="ste", step_frac=0.5)
    out = qat(z, jax.random.PRNGKey(0))
    expected = dequantize_latents(quantize_latents_ecsq(z, step_frac=0.5))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expected))


def test_ste_bits_forward_matches_eval_roundtrip():
    z = _latents(1)
    qat = LatentQAT(mode="ste", bits=4)
    out = qat(z, jax.random.PRNGKey(0))
    expected = dequantize_latents(quantize_latents(z, bits=4))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expected))


def test_ste_preserves_input_dtype():
    z = _latents().astype(jnp.bfloat16)
    out = LatentQAT(mode="ste", step_frac=0.5)(z, jax.random.PRNGKey(0))
    assert out.dtype == jnp.bfloat16


# ---- backward: straight-through identity ---------------------------------------

def test_ste_gradient_is_identity():
    z = _latents(2)
    qat = LatentQAT(mode="ste", step_frac=0.5)
    g = jax.grad(lambda z_: jnp.sum(qat(z_, jax.random.PRNGKey(0))))(z)
    np.testing.assert_allclose(np.asarray(g), 1.0, rtol=0, atol=0)


def test_noise_mode_bounded_and_differentiable():
    z = _latents(3)
    qat = LatentQAT(mode="noise", step_frac=0.5)
    out = qat(z, jax.random.PRNGKey(7))
    step = np.asarray(qat._step(z))
    err = np.abs(np.asarray(out) - np.asarray(z))
    assert np.all(err <= 0.5 * step + 1e-6)
    # reproducible per key, different across keys
    out2 = qat(z, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = qat(z, jax.random.PRNGKey(8))
    assert np.any(np.asarray(out) != np.asarray(out3))
    g = jax.grad(lambda z_: jnp.sum(qat(z_, jax.random.PRNGKey(7)) ** 2))(z)
    assert np.all(np.isfinite(np.asarray(g)))


def test_qat_validates_its_config():
    with pytest.raises(ValueError):
        LatentQAT(mode="ste")  # neither grid selected
    with pytest.raises(ValueError):
        LatentQAT(mode="ste", step_frac=0.5, bits=8)  # both
    with pytest.raises(ValueError):
        LatentQAT(mode="nearest", step_frac=0.5)  # unknown mode


# ---- objective integration ------------------------------------------------------

def _tiny_state(seed=0):
    model = ConditionalFlow(noise_dimension=DIM, condition_dimension=COND,
                            num_blocks=BLOCKS, latent_dimension=LATENT)
    variables = model.init(jax.random.PRNGKey(seed), jnp.ones((BATCH, DIM)),
                           jnp.zeros((BATCH, 2)), method="init_all")
    return TrainState.create(apply_fn=model.apply, params=variables["params"],
                             tx=optax.adam(1e-3))


def test_imf_objective_with_qat_trains():
    state = _tiny_state()
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (BATCH, DIM)).astype(np.float32))
    obj = ImprovedMeanFlowObjective(latent_qat=LatentQAT(mode="ste",
                                                         step_frac=0.5))
    loss, grads = obj.compute_loss(state, jax.random.PRNGKey(0), x)
    assert np.isfinite(float(loss))
    gnorm = optax.global_norm(grads)
    assert float(gnorm) > 0  # STE passes gradient through to the encoder

    # the quantizer actually bites: loss differs from the unquantized path
    loss_ref, _ = ImprovedMeanFlowObjective().compute_loss(
        state, jax.random.PRNGKey(0), x)
    assert float(loss) != pytest.approx(float(loss_ref), abs=0)


def test_qat_off_keeps_historical_rng_streams():
    """Objectives without QAT must be bit-identical to before the feature."""
    state = _tiny_state()
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (BATCH, DIM)).astype(np.float32))
    obj = ImprovedMeanFlowObjective()
    loss1, _ = obj.loss(state.params, state.apply_fn, jax.random.PRNGKey(3), x)
    loss2, _ = obj.loss(state.params, state.apply_fn, jax.random.PRNGKey(3), x)
    assert float(loss1) == float(loss2)


# ---- config wiring ---------------------------------------------------------------

def test_create_loss_strategy_builds_qat_from_config():
    imf = dict(method="improved_mean_flow", use_improved_mean_flow=True)
    config = create_mnist_config(**imf, qat_step_frac=0.25, qat_mode="noise")
    config.validate()
    obj = create_loss_strategy(config)
    assert isinstance(obj.latent_qat, LatentQAT)
    assert obj.latent_qat.step_frac == 0.25
    assert obj.latent_qat.mode == "noise"

    config2 = create_mnist_config(**imf, qat_bits=4)
    obj2 = create_loss_strategy(config2)
    assert obj2.latent_qat.bits == 4
    assert obj2.latent_qat.mode == "ste"

    assert create_loss_strategy(create_mnist_config(**imf)).latent_qat is None


def test_qat_config_validation():
    with pytest.raises(ValueError):
        create_mnist_config(qat_step_frac=0.5, qat_bits=8).validate()
    with pytest.raises(ValueError):
        create_mnist_config(qat_bits=5).validate()
    with pytest.raises(ValueError):
        create_mnist_config(qat_mode="fancy").validate()


def test_qat_config_round_trips_through_json(tmp_path):
    from meanflow_audio_codec_tpu.configs import (
        load_config_from_json,
        save_config_to_json,
    )
    config = create_mnist_config(qat_step_frac=0.5)
    path = tmp_path / "config.json"
    save_config_to_json(config, path)
    loaded = load_config_from_json(path)
    assert loaded.qat_step_frac == 0.5


def test_merge_lifts_any_flat_section_key():
    """Regression: flat overrides beyond the v1 trio used to be dropped."""
    config = create_mnist_config(ema_decay=0.91, qat_bits=8)
    assert config.ema_decay == 0.91
    assert config.qat_bits == 8
