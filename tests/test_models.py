"""Model families: shapes, encode paths, factory wiring, dtype policy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meanflow_audio_codec_tpu.configs import (
    BaseConfig,
    DatasetConfig,
    MethodConfig,
    ModelConfig,
    TrainFlowConfig,
    TrainingConfig,
)
from meanflow_audio_codec_tpu.models import (
    ConditionalConvFlow,
    ConditionalFlow,
    ConditionalMLPMixerFlow,
    MLPMixerAutoencoder,
    SimpleConvFlow,
    TrainState,
    create_flow_model,
)

from pathlib import Path

NOISE_DIM = 64  # 8x8 "image"
COND_DIM = 16
LATENT_DIM = 8
BLOCKS = 2
BATCH = 4


def _config(architecture: str | None) -> TrainFlowConfig:
    return TrainFlowConfig(
        base=BaseConfig(batch_size=BATCH, n_steps=1, base_lr=1e-4,
                        weight_decay=0.0, seed=0),
        model=ModelConfig(noise_dimension=NOISE_DIM,
                          condition_dimension=COND_DIM,
                          latent_dimension=LATENT_DIM, num_blocks=BLOCKS,
                          architecture=architecture),
        dataset=DatasetConfig(),
        method=MethodConfig(),
        training=TrainingConfig(sample_every=1, sample_seed=0, sample_steps=1,
                                workdir=Path("/tmp/m")),
    )


def _init_and_apply(model):
    key = jax.random.PRNGKey(0)
    x = jnp.ones((BATCH, NOISE_DIM))
    time = jnp.zeros((BATCH, 2))
    variables = model.init(key, x, time, method="init_all")
    out = model.apply(variables, x, time)
    return variables, out


@pytest.mark.parametrize("architecture", ["mlp", "convnet", "mlp_mixer",
                                          "simple_conv"])
def test_factory_honors_architecture_and_shapes(architecture):
    model = create_flow_model(_config(architecture))
    variables, out = _init_and_apply(model)
    assert out.shape == (BATCH, NOISE_DIM)

    # every family must expose a working encode path (codec contract)
    latents = model.apply(variables, jnp.ones((BATCH, NOISE_DIM)),
                          method="encode")
    assert latents.shape[0] == BATCH

    # conditional pass with real latents
    out_cond = model.apply(variables, jnp.ones((BATCH, NOISE_DIM)),
                           jnp.zeros((BATCH, 2)), latents)
    assert out_cond.shape == (BATCH, NOISE_DIM)


def test_factory_default_and_unknown():
    model = create_flow_model(_config(None))
    assert isinstance(model, ConditionalFlow)
    config = _config(None)
    config.model.architecture = "transformer"  # bypass validation
    with pytest.raises(ValueError, match="Unknown architecture"):
        create_flow_model(config)


def test_unconditional_path_matches_zero_latents():
    """latents=None must equal explicit zero latents (CFG contract)."""
    model = ConditionalFlow(noise_dimension=NOISE_DIM,
                            condition_dimension=COND_DIM,
                            num_blocks=BLOCKS, latent_dimension=LATENT_DIM)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (BATCH, NOISE_DIM))
    time = jnp.full((BATCH, 2), 0.3)
    variables = model.init(key, x, time)
    out_none = model.apply(variables, x, time, None)
    out_zero = model.apply(variables, x, time,
                           jnp.zeros((BATCH, LATENT_DIM)))
    np.testing.assert_allclose(np.asarray(out_none), np.asarray(out_zero),
                               rtol=1e-6)


def test_mixer_flow_latent_token_shape():
    model = ConditionalMLPMixerFlow(
        noise_dimension=NOISE_DIM, condition_dimension=COND_DIM,
        num_blocks=BLOCKS, latent_dimension=LATENT_DIM,
        token_mix_dim=32, channel_mix_dim=32, num_channels=4,
        num_latent_tokens=4, encoder_context_tokens=8)
    key = jax.random.PRNGKey(0)
    x = jnp.ones((BATCH, NOISE_DIM))
    variables = model.init(key, x, jnp.zeros((BATCH, 2)), method="init_all")
    latents = model.apply(variables, x, method="encode")
    assert latents.shape == (BATCH, 4, LATENT_DIM)


def test_mixer_autoencoder_roundtrip_shapes():
    model = MLPMixerAutoencoder(input_dim=NOISE_DIM, num_latent_tokens=4,
                                latent_dim=8, num_context_tokens=8,
                                num_output_tokens=8, token_mix_dim=16,
                                channel_mix_dim=16)
    key = jax.random.PRNGKey(0)
    x = jnp.ones((BATCH, NOISE_DIM))
    variables = model.init(key, x)
    out = model.apply(variables, x)
    assert out.shape == (BATCH, NOISE_DIM)
    lat = model.apply(variables, x, method="encode")
    assert lat.shape == (BATCH, 4, 8)
    dec = model.apply(variables, lat, method="decode")
    assert dec.shape == (BATCH, NOISE_DIM)


def test_bfloat16_compute_dtype():
    """dtype=bf16 models keep f32 params but compute/emit bf16."""
    model = ConditionalFlow(noise_dimension=NOISE_DIM,
                            condition_dimension=COND_DIM, num_blocks=1,
                            latent_dimension=LATENT_DIM, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x = jnp.ones((BATCH, NOISE_DIM))
    variables = model.init(key, x, jnp.zeros((BATCH, 2)))
    leaf = jax.tree_util.tree_leaves(variables["params"])[0]
    assert leaf.dtype == jnp.float32
    out = model.apply(variables, x, jnp.zeros((BATCH, 2)))
    assert out.dtype == jnp.bfloat16


def test_jvp_through_decoder():
    """The mean-flow objectives jvp through __call__; must trace cleanly."""
    model = ConditionalConvFlow(noise_dimension=NOISE_DIM,
                                condition_dimension=COND_DIM,
                                num_blocks=1, latent_dimension=LATENT_DIM)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (BATCH, NOISE_DIM))
    t = jnp.full((BATCH, 1), 0.5)
    r = jnp.full((BATCH, 1), 0.2)
    variables = model.init(key, x, jnp.zeros((BATCH, 2)))

    def u_fn(z, t_in, r_in):
        th = jnp.concatenate([t_in, t_in - r_in], axis=-1)
        return model.apply(variables, z, th)

    u, dudt = jax.jvp(u_fn, (x, t, r),
                      (jnp.ones_like(x), jnp.ones_like(t), jnp.zeros_like(r)))
    assert u.shape == (BATCH, NOISE_DIM)
    assert dudt.shape == (BATCH, NOISE_DIM)
    assert np.isfinite(np.asarray(u)).all()
    assert np.isfinite(np.asarray(dudt)).all()


def test_train_state_ema():
    model = ConditionalFlow(noise_dimension=8, condition_dimension=4,
                            num_blocks=1, latent_dimension=4)
    import optax
    key = jax.random.PRNGKey(0)
    variables = model.init(key, jnp.ones((1, 8)), jnp.zeros((1, 2)))
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              tx=optax.sgd(0.1),
                              ema_params=variables["params"], ema_decay=0.5)
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    new_state = state.apply_gradients(grads=grads)
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(new_state.params)[0]
    e1 = jax.tree_util.tree_leaves(new_state.ema_params)[0]
    np.testing.assert_allclose(np.asarray(e1), 0.5 * np.asarray(p0)
                               + 0.5 * np.asarray(p1), rtol=1e-6)


def test_grn_jvp_finite_on_dead_channels():
    """sqrt'(0) is inf: a channel of exact zeros (GELU saturation) must not
    turn the mean-flow JVP tangent into NaN (observed on tonal audio)."""
    from meanflow_audio_codec_tpu.models.blocks import (
        GlobalResponseNormalization,
    )

    grn = GlobalResponseNormalization()
    x = jnp.zeros((2, 4, 4, 8))
    x = x.at[:, :, :, :4].set(1.0)  # half the channels alive, half dead
    variables = grn.init(jax.random.PRNGKey(0), x)

    def f(z):
        return grn.apply(variables, z)

    tangent = jnp.ones_like(x)
    out, jvp_out = jax.jvp(f, (x,), (tangent,))
    assert bool(jnp.isfinite(out).all())
    assert bool(jnp.isfinite(jvp_out).all())
