"""Objectives + fused train step: mathematical properties and convergence.

Mirrors the reference's property tests (reference test/
test_improved_mean_flow.py:31-100 — boundary condition and fwd-vs-rev AD
cross-check) and adds what it lacked: a smoke-convergence run per objective
through the single-jit train step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from pathlib import Path

from meanflow_audio_codec_tpu.configs import (
    BaseConfig,
    DatasetConfig,
    MethodConfig,
    ModelConfig,
    TrainFlowConfig,
    TrainingConfig,
)
from meanflow_audio_codec_tpu.models import ConditionalFlow, TrainState
from meanflow_audio_codec_tpu.training import (
    AutoencoderObjective,
    FlowMatchingObjective,
    ImprovedMeanFlowObjective,
    MeanFlowObjective,
    create_loss_strategy,
    make_train_step,
    train_step,
)

DIM, COND, LATENT, BLOCKS, BATCH = 8, 4, 4, 2, 16


def _tiny_state(seed=0, lr=1e-3):
    model = ConditionalFlow(noise_dimension=DIM, condition_dimension=COND,
                            num_blocks=BLOCKS, latent_dimension=LATENT)
    key = jax.random.PRNGKey(seed)
    variables = model.init(key, jnp.ones((BATCH, DIM)), jnp.zeros((BATCH, 2)),
                           method="init_all")
    return TrainState.create(apply_fn=model.apply, params=variables["params"],
                             tx=optax.adam(lr))


def _data(seed=0):
    # low-rank structured data the tiny model can fit
    rng = np.random.default_rng(seed)
    basis = rng.standard_normal((2, DIM))
    coeffs = rng.standard_normal((BATCH, 2))
    return jnp.asarray((coeffs @ basis).astype(np.float32))


# ---- mathematical properties -------------------------------------------------

def test_imf_boundary_condition():
    """At t = r the compound prediction collapses to u(z, t, t) = v(z, t)."""
    state = _tiny_state()
    x = _data()
    key = jax.random.PRNGKey(1)
    noise = jax.random.normal(key, x.shape)
    t = jnp.full((BATCH, 1), 0.7)
    r = t  # boundary
    noised = (1 - t) * x + t * noise
    latents = state.apply_fn({"params": state.params}, x, method="encode")

    def u_fn(z, t_in, r_in):
        th = jnp.concatenate([t_in, t_in - r_in], axis=-1)
        return state.apply_fn({"params": state.params}, z, th, latents)

    v = state.apply_fn({"params": state.params}, noised,
                       jnp.concatenate([t, jnp.zeros_like(t)], -1), latents)
    u, dudt = jax.jvp(u_fn, (noised, t, r),
                      (v, jnp.ones_like(t), jnp.zeros_like(r)))
    v_pred = u + (t - r) * jax.lax.stop_gradient(dudt)
    np.testing.assert_allclose(np.asarray(v_pred), np.asarray(u),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                               rtol=1e-5, atol=1e-5)


def test_jvp_matches_reverse_mode():
    """Forward-mode du/dt must equal the reverse-mode contraction
    sum_z dz*du/dz + du/dt (reference test_improved_mean_flow.py:57-100)."""
    state = _tiny_state()
    x = _data(1)
    key = jax.random.PRNGKey(2)
    noise = jax.random.normal(key, x.shape)
    t = jnp.full((BATCH, 1), 0.6)
    r = jnp.full((BATCH, 1), 0.2)
    noised = (1 - t) * x + t * noise
    latents = state.apply_fn({"params": state.params}, x, method="encode")
    tangent_z = noise - x

    def u_scalar(z, t_in):
        th = jnp.concatenate([t_in, t_in - r], axis=-1)
        out = state.apply_fn({"params": state.params}, z, th, latents)
        return jnp.sum(out)

    def u_fn(z, t_in):
        th = jnp.concatenate([t_in, t_in - r], axis=-1)
        return state.apply_fn({"params": state.params}, z, th, latents)

    _, jvp_val = jax.jvp(u_fn, (noised, t), (tangent_z, jnp.ones_like(t)))
    grad_z, grad_t = jax.grad(u_scalar, argnums=(0, 1))(noised, t)
    rev = jnp.sum(grad_z * tangent_z) + jnp.sum(grad_t)
    np.testing.assert_allclose(float(jnp.sum(jvp_val)), float(rev),
                               rtol=1e-4, atol=1e-4)


# ---- convergence smoke (one jitted step fn per objective) ---------------------

@pytest.mark.parametrize("objective", [
    AutoencoderObjective(),
    FlowMatchingObjective(),
    MeanFlowObjective(),
    ImprovedMeanFlowObjective(),
], ids=["ae", "fm", "mf", "imf"])
def test_objective_trains(objective):
    state = _tiny_state(lr=3e-3)
    x = _data(3)
    step = make_train_step(objective, donate=False)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(60):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sub, x)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10]), (
        f"{objective}: no improvement {np.mean(losses[:10])} -> "
        f"{np.mean(losses[-10:])}")


def test_reference_compatible_train_step():
    state = _tiny_state()
    objective = FlowMatchingObjective()
    new_state, loss = train_step(state, jax.random.PRNGKey(0), _data(),
                                 objective)
    assert np.isfinite(float(loss))
    assert new_state.step == 1


def test_train_step_with_in_graph_tokenizer():
    from meanflow_audio_codec_tpu.ops import ReshapeTokenization
    model = ConditionalFlow(noise_dimension=16, condition_dimension=4,
                            num_blocks=1, latent_dimension=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((2, 16)),
                           jnp.zeros((2, 2)), method="init_all")
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=optax.adam(1e-3))
    tok = ReshapeTokenization(patch_size=2, image_size=4)
    step = make_train_step(AutoencoderObjective(), tokenizer=tok,
                           donate=False)
    images = jnp.ones((2, 4, 4))  # raw [B, H, W] tokenized inside the jit
    state, metrics = step(state, jax.random.PRNGKey(1), images)
    assert np.isfinite(float(metrics["loss"]))


# ---- registry ----------------------------------------------------------------

def _config(**method_kwargs):
    return TrainFlowConfig(
        base=BaseConfig(batch_size=4, n_steps=1, base_lr=1e-4,
                        weight_decay=0.0, seed=0),
        model=ModelConfig(noise_dimension=DIM, condition_dimension=COND,
                          latent_dimension=LATENT, num_blocks=1),
        dataset=DatasetConfig(),
        method=MethodConfig(**method_kwargs),
        training=TrainingConfig(sample_every=1, sample_seed=0, sample_steps=1,
                                workdir=Path("/tmp/o")),
    )


def test_create_loss_strategy_mapping():
    assert isinstance(create_loss_strategy(_config()),
                      FlowMatchingObjective)
    assert isinstance(create_loss_strategy(_config(use_improved_mean_flow=True)),
                      ImprovedMeanFlowObjective)
    assert isinstance(create_loss_strategy(_config(method="mean_flow",
                                                   gamma=1.0, c=1e-2)),
                      MeanFlowObjective)
    assert isinstance(create_loss_strategy(_config(method="autoencoder")),
                      AutoencoderObjective)
    mf = create_loss_strategy(_config(method="mean_flow", gamma=2.0))
    assert mf.gamma == 2.0
    imf = create_loss_strategy(_config(
        method="improved_mean_flow", use_improved_mean_flow=True,
        noise_schedule="uniform", time_sampling="mean_flow",
        time_sampling_data_proportion=0.75))
    assert imf.time_sampling.data_proportion == 0.75


def test_full_interval_proportion_forces_corner_pairs():
    """The full-interval slice trains the exact (t=1, r=0) decode query."""
    from meanflow_audio_codec_tpu.ops.time_sampling import sample_tr

    t, r = sample_tr(jax.random.PRNGKey(0), 16, data_proportion=0.25,
                     full_interval_proportion=0.25)
    t, r = np.asarray(t), np.asarray(r)
    np.testing.assert_array_equal(t[:4], r[:4])        # r := t prefix
    np.testing.assert_array_equal(t[4:8], np.ones((4, 1)))   # t = 1
    np.testing.assert_array_equal(r[4:8], np.zeros((4, 1)))  # r = 0
    assert (r[8:] <= t[8:]).all()                       # ordered tail

    imf = create_loss_strategy(_config(
        method="improved_mean_flow", use_improved_mean_flow=True,
        time_sampling="mean_flow", time_sampling_full_proportion=0.5))
    assert imf.time_sampling.full_interval_proportion == 0.5


def test_full_interval_proportion_validation():
    with pytest.raises(ValueError, match="full_proportion"):
        _config(time_sampling_full_proportion=1.5)
    with pytest.raises(ValueError, match="must not exceed 1"):
        _config(time_sampling_data_proportion=0.75,
                time_sampling_full_proportion=0.5)


# ---- loss_weighting (uniform / time_dependent / learned) ---------------------

@pytest.mark.parametrize("cls,kwargs", [
    (FlowMatchingObjective, {}),
    (MeanFlowObjective, {}),
    (ImprovedMeanFlowObjective, {}),
])
def test_loss_weighting_settings_differ(cls, kwargs):
    """The three loss_weighting settings produce different losses on a
    fixed batch (the knob is live, unlike the reference's inert config)."""
    from meanflow_audio_codec_tpu.ops.losses import LEARNED_WEIGHT_KEY

    state = _tiny_state()
    x = _data()
    key = jax.random.PRNGKey(7)

    def run(weighting, params):
        obj = cls(loss_weighting=weighting, **kwargs)
        loss, _ = obj.loss(params, state.apply_fn, key, x)
        return float(loss)

    uniform = run("uniform", state.params)
    time_dep = run("time_dependent", state.params)
    # learned with a non-zero polynomial (zero-init equals uniform by design)
    learned_params = dict(state.params)
    learned_params[LEARNED_WEIGHT_KEY] = {
        "poly": jnp.asarray([0.1, 0.4, -0.3])}
    learned = run("learned", learned_params)

    assert uniform != pytest.approx(time_dep, rel=1e-6)
    assert uniform != pytest.approx(learned, rel=1e-6)
    assert np.isfinite([uniform, time_dep, learned]).all()


def test_learned_weighting_trains_polynomial():
    """The log-variance polynomial receives gradients (it is learned)."""
    from meanflow_audio_codec_tpu.ops.losses import LEARNED_WEIGHT_KEY

    state = _tiny_state()
    x = _data()
    params = dict(state.params)
    params[LEARNED_WEIGHT_KEY] = {"poly": jnp.zeros((3,))}
    obj = ImprovedMeanFlowObjective(loss_weighting="learned")

    def loss_fn(p):
        loss, _ = obj.loss(p, state.apply_fn, jax.random.PRNGKey(0), x)
        return loss

    grads = jax.grad(loss_fn)(params)
    assert float(jnp.abs(grads[LEARNED_WEIGHT_KEY]["poly"]).sum()) > 0


def test_learned_weighting_requires_params():
    state = _tiny_state()
    obj = FlowMatchingObjective(loss_weighting="learned")
    with pytest.raises(ValueError, match="learned"):
        obj.loss(state.params, state.apply_fn, jax.random.PRNGKey(0), _data())


def test_create_loss_strategy_passes_loss_weighting():
    obj = create_loss_strategy(_config(loss_weighting="time_dependent"))
    assert obj.loss_weighting == "time_dependent"


# ---- NaN/inf update guard -----------------------------------------------------

def test_skip_nonfinite_updates():
    """A NaN batch is skipped (params unchanged); a finite one applies."""
    state = _tiny_state()
    step = make_train_step(ImprovedMeanFlowObjective(), donate=False,
                           skip_nonfinite=True)
    bad = _data().at[0, 0].set(jnp.nan)
    new_state, metrics = step(state, jax.random.PRNGKey(0), bad)
    assert not bool(metrics["update_ok"])
    leaves_before = jax.tree_util.tree_leaves(state.params)
    leaves_after = jax.tree_util.tree_leaves(new_state.params)
    for a, b in zip(leaves_before, leaves_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    good_state, metrics = step(state, jax.random.PRNGKey(0), _data())
    assert bool(metrics["update_ok"])
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(good_state.params)))
    assert changed
