"""Legacy simple-trainer API + EMA wiring in the main trainer."""

import jax
import jax.numpy as jnp
import numpy as np
from pathlib import Path

from meanflow_audio_codec_tpu.models import ConditionalFlow
from meanflow_audio_codec_tpu.training.simple_trainer import (
    create_train_state,
    train_epoch,
    train_step_flow_matching,
    train_step_improved_mean_flow,
)


def _model():
    return ConditionalFlow(noise_dimension=8, condition_dimension=4,
                           num_blocks=1, latent_dimension=4)


def test_create_train_state_initialises_everything():
    state = create_train_state(_model(), jax.random.PRNGKey(0), batch_size=4)
    # encoder params must exist (single-pass init)
    assert "encoder" in state.params


def test_simple_steps_run_and_decrease():
    model = _model()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
    for step_fn in (train_step_flow_matching, train_step_improved_mean_flow):
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   batch_size=16, learning_rate=3e-3)
        losses = []
        key = jax.random.PRNGKey(1)
        for i in range(40):
            key, sub = jax.random.split(key)
            state, loss = step_fn(state, sub, x)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_train_epoch():
    model = _model()
    state = create_train_state(model, jax.random.PRNGKey(0), batch_size=4)
    batches = [np.zeros((4, 8), np.float32)] * 3
    state, mean_loss = train_epoch(state, jax.random.PRNGKey(1), batches)
    assert np.isfinite(mean_loss)
    assert int(state.step) == 3


def test_trainer_ema_wiring(tmp_path):
    from meanflow_audio_codec_tpu.configs import (
        BaseConfig, DatasetConfig, MethodConfig, ModelConfig,
        TrainFlowConfig, TrainingConfig)
    from meanflow_audio_codec_tpu.training.trainer import train_flow

    config = TrainFlowConfig(
        base=BaseConfig(batch_size=4, n_steps=2, base_lr=1e-3,
                        weight_decay=0.0, seed=0),
        model=ModelConfig(noise_dimension=784, condition_dimension=8,
                          latent_dimension=4, num_blocks=1),
        dataset=DatasetConfig(dataset="mnist",
                              tokenization_strategy="reshape"),
        method=MethodConfig(method="flow_matching"),
        training=TrainingConfig(sample_every=2, sample_seed=0, sample_steps=1,
                                workdir=tmp_path / "run", ema_decay=0.9),
    )
    summary = train_flow(config)
    assert np.isfinite(summary["loss"]["final"])


def test_ema_decay_validation():
    import pytest
    from meanflow_audio_codec_tpu.configs import TrainingConfig
    with pytest.raises(ValueError, match="ema_decay"):
        TrainingConfig(sample_every=1, sample_seed=0, sample_steps=1,
                       workdir=Path("/tmp/x"), ema_decay=1.5).validate()
