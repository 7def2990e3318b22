"""Samplers: Heun ODE + dual-time mean-flow interval sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from meanflow_audio_codec_tpu.models import ConditionalFlow, TrainState
from meanflow_audio_codec_tpu.ops.sampling import sample, sample_dual_time

DIM, COND, LATENT, BATCH = 8, 4, 4, 4


def _state():
    model = ConditionalFlow(noise_dimension=DIM, condition_dimension=COND,
                            num_blocks=1, latent_dimension=LATENT)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((BATCH, DIM)),
                           jnp.zeros((BATCH, 2)), method="init_all")
    return TrainState.create(apply_fn=model.apply,
                             params=variables["params"], tx=optax.sgd(0.1))


def test_heun_sampler_shapes_and_determinism():
    state = _state()
    latents = jnp.ones((BATCH, LATENT))
    out1 = sample(state.apply_fn, DIM, state.params, jax.random.PRNGKey(1),
                  latents, n_steps=4)
    out2 = sample(state.apply_fn, DIM, state.params, jax.random.PRNGKey(1),
                  latents, n_steps=4)
    assert out1.shape == (BATCH, DIM)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_sampler_requires_latents():
    state = _state()
    with pytest.raises(ValueError, match="latents"):
        sample(state.apply_fn, DIM, state.params, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="latents"):
        sample(state.apply_fn, DIM, state.params, jax.random.PRNGKey(0),
               latents=None, guidance_scale=2.0)


def test_cfg_equals_conditional_at_scale_one_latents_zero():
    """With zero latents, CFG blend is cond==uncond, so any scale matches."""
    state = _state()
    latents = jnp.zeros((BATCH, LATENT))
    base = sample(state.apply_fn, DIM, state.params, jax.random.PRNGKey(2),
                  latents, n_steps=3, guidance_scale=1.0)
    guided = sample(state.apply_fn, DIM, state.params, jax.random.PRNGKey(2),
                    latents, n_steps=3, guidance_scale=2.5)
    np.testing.assert_allclose(np.asarray(base), np.asarray(guided),
                               rtol=1e-4, atol=1e-5)


def test_dual_time_single_nfe_counts_one_model_call():
    """n_steps=1, heun=False must trace exactly ONE decoder evaluation."""
    state = _state()
    calls = []

    def counting_apply(variables, x, time=None, latents=None, **kwargs):
        if time is not None:
            calls.append(1)
        return state.apply_fn(variables, x, time, latents, **kwargs)

    latents = jnp.ones((BATCH, LATENT))
    out = sample_dual_time(counting_apply, DIM, state.params,
                           jax.random.PRNGKey(3), latents, n_steps=1)
    assert out.shape == (BATCH, DIM)
    assert len(calls) == 1


def test_dual_time_single_step_is_interval_transport():
    """1-NFE output must equal x1 - u(x1, t=1, r=0) exactly."""
    state = _state()
    latents = jnp.full((BATCH, LATENT), 0.5)
    key = jax.random.PRNGKey(4)
    out = sample_dual_time(state.apply_fn, DIM, state.params, key, latents,
                           n_steps=1)
    x1 = jax.random.normal(key, (BATCH, DIM), dtype=jnp.float32)
    t = jnp.ones((BATCH, 1))
    pair = jnp.concatenate([t, t], axis=-1)  # t=1, h=t-r=1
    u = state.apply_fn({"params": state.params}, x1, pair, latents)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x1 - u),
                               rtol=1e-5, atol=1e-5)


def test_use_improved_mean_flow_flag_routes_to_dual_time():
    """The reference ignored this flag (sampling.py:31); here it must route."""
    state = _state()
    latents = jnp.ones((BATCH, LATENT))
    via_flag = sample(state.apply_fn, DIM, state.params, jax.random.PRNGKey(5),
                      latents, n_steps=2, use_improved_mean_flow=True)
    direct = sample_dual_time(state.apply_fn, DIM, state.params,
                              jax.random.PRNGKey(5), latents, n_steps=2)
    np.testing.assert_array_equal(np.asarray(via_flag), np.asarray(direct))


def test_dual_time_heun_variant():
    state = _state()
    latents = jnp.ones((BATCH, LATENT))
    out = sample_dual_time(state.apply_fn, DIM, state.params,
                           jax.random.PRNGKey(6), latents, n_steps=2,
                           heun=True)
    assert out.shape == (BATCH, DIM)
    assert np.isfinite(np.asarray(out)).all()
