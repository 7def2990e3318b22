"""Sharding: mesh construction, DP/TP shardings, sharded train step on the
virtual 8-device CPU mesh (conftest pins XLA host device count to 8)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from meanflow_audio_codec_tpu.models import (
    ConditionalMLPMixerFlow,
    ConditionalFlow,
    TrainState,
)
from meanflow_audio_codec_tpu.parallel import (
    batch_sharding,
    create_mesh,
    shard_state,
    state_shardings,
)
from meanflow_audio_codec_tpu.training import (
    ImprovedMeanFlowObjective,
    make_train_step,
)


def test_mesh_construction():
    mesh = create_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = create_mesh(data=4, model=2)
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        create_mesh(data=3, model=2)  # 6 != 8
    with pytest.raises(ValueError, match="divisible"):
        create_mesh(model=3)


def _state(model=None):
    model = model or ConditionalFlow(noise_dimension=16,
                                     condition_dimension=8,
                                     num_blocks=1, latent_dimension=8)
    dim = model.noise_dimension
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((8, dim)),
                           jnp.zeros((8, 2)), method="init_all")
    return TrainState.create(apply_fn=model.apply,
                             params=variables["params"], tx=optax.adam(1e-3))


def test_dp_sharded_train_step_matches_single_device():
    """The 8-way DP step must produce the same loss as single-device."""
    mesh = create_mesh(data=8)
    state = _state()
    objective = ImprovedMeanFlowObjective()
    step = make_train_step(objective, donate=False)
    key = jax.random.PRNGKey(1)
    batch = jax.random.normal(jax.random.PRNGKey(2), (16, 16))

    _, metrics_single = step(state, key, batch)

    sharded_state = shard_state(state, mesh)
    sharded_batch = jax.device_put(batch, batch_sharding(mesh))
    _, metrics_sharded = step(sharded_state, key, sharded_batch)

    np.testing.assert_allclose(float(metrics_single["loss"]),
                               float(metrics_sharded["loss"]),
                               rtol=2e-5)


def test_dp_batch_actually_sharded():
    mesh = create_mesh(data=8)
    batch = jax.device_put(jnp.ones((16, 16)), batch_sharding(mesh))
    assert len(batch.sharding.device_set) == 8
    # each device holds 1/8 of the batch rows
    shard = batch.addressable_shards[0]
    assert shard.data.shape == (2, 16)


def test_tp_partitions_large_kernels():
    mesh = create_mesh(data=4, model=2)
    model = ConditionalMLPMixerFlow(
        noise_dimension=64, condition_dimension=16, num_blocks=1,
        latent_dimension=16, token_mix_dim=256, channel_mix_dim=256,
        num_channels=8, num_latent_tokens=4, encoder_context_tokens=8)
    state = _state(model)
    shardings = state_shardings(state, mesh)
    flat = jax.tree_util.tree_leaves_with_path(shardings.params)
    partitioned = [s for _, s in flat
                   if isinstance(s, NamedSharding) and s.spec == P(None, "model")]
    replicated_count = len(flat) - len(partitioned)
    assert partitioned, "no kernel was tensor-partitioned"
    assert replicated_count > 0  # biases etc. replicate

    sharded = shard_state(state, mesh)
    out = sharded.apply_fn({"params": sharded.params}, jnp.ones((8, 64)),
                           jnp.zeros((8, 2)))
    assert out.shape == (8, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_tp_step_runs_and_matches():
    mesh = create_mesh(data=4, model=2)
    model = ConditionalMLPMixerFlow(
        noise_dimension=64, condition_dimension=16, num_blocks=1,
        latent_dimension=16, token_mix_dim=256, channel_mix_dim=256,
        num_channels=8, num_latent_tokens=4, encoder_context_tokens=8)
    state = _state(model)
    objective = ImprovedMeanFlowObjective()
    step = make_train_step(objective, donate=False)
    key = jax.random.PRNGKey(3)
    batch = jax.random.normal(jax.random.PRNGKey(4), (8, 64))

    _, single = step(state, key, batch)
    sharded_state = shard_state(state, mesh)
    sharded_batch = jax.device_put(batch, batch_sharding(mesh))
    _, sharded = step(sharded_state, key, sharded_batch)
    np.testing.assert_allclose(float(single["loss"]), float(sharded["loss"]),
                               rtol=5e-4)


def test_tp_conv_flow_ch128_class_matches_replicated():
    """A ch=128-class conv config (4-d conv kernels + row/col-paired dense
    lifts) trains sharded over model=2 with the same loss as replicated.
    Tiny dims, same geometry class as the production config."""
    from meanflow_audio_codec_tpu.models import ConditionalConvFlow

    model = ConditionalConvFlow(
        noise_dimension=64, condition_dimension=16, num_blocks=2,
        latent_dimension=16, channels=128, bottleneck_dim=32,
        spatial=8, lift_channels=16)
    state = _state(model)
    mesh = create_mesh(data=4, model=2)
    shardings = state_shardings(state, mesh)
    flat = jax.tree_util.tree_leaves_with_path(shardings.params)
    conv_partitioned = [s for _, s in flat
                        if isinstance(s, NamedSharding)
                        and s.spec == P(None, None, None, "model")]
    row_partitioned = [s for _, s in flat
                       if isinstance(s, NamedSharding)
                       and s.spec == P("model", None)]
    assert conv_partitioned, "no 4-d conv kernel was tensor-partitioned"
    assert row_partitioned, "no dense projection was row-partitioned"

    objective = ImprovedMeanFlowObjective()
    step = make_train_step(objective, donate=False)
    key = jax.random.PRNGKey(5)
    batch = jax.random.normal(jax.random.PRNGKey(6), (8, 64))
    _, single = step(state, key, batch)
    sharded_state = shard_state(state, mesh)
    _, sharded = step(sharded_state, key,
                      jax.device_put(batch, batch_sharding(mesh)))
    np.testing.assert_allclose(float(single["loss"]), float(sharded["loss"]),
                               rtol=5e-4)


def test_tp_factorized_mixer_2k_matches_replicated():
    """A 2k-dim factorised mixer stage (the width that OOMs the reference's
    quadratic lift) trains sharded over model=2, loss matching replicated."""
    model = ConditionalMLPMixerFlow(
        noise_dimension=2048, condition_dimension=16, num_blocks=1,
        latent_dimension=16, token_mix_dim=256, channel_mix_dim=256,
        num_channels=64, num_latent_tokens=4, encoder_context_tokens=8,
        stage_tokens=32, factorized_stages=True)
    state = _state(model)
    # factorised: parameter count stays linear in the flat width
    n_params = sum(int(np.size(p))
                   for p in jax.tree_util.tree_leaves(state.params))
    assert n_params < 5_000_000, f"factorised stage too big: {n_params:,}"

    mesh = create_mesh(data=4, model=2)
    objective = ImprovedMeanFlowObjective()
    step = make_train_step(objective, donate=False)
    key = jax.random.PRNGKey(7)
    batch = jax.random.normal(jax.random.PRNGKey(8), (8, 2048))
    _, single = step(state, key, batch)
    sharded_state = shard_state(state, mesh)
    _, sharded = step(sharded_state, key,
                      jax.device_put(batch, batch_sharding(mesh)))
    np.testing.assert_allclose(float(single["loss"]), float(sharded["loss"]),
                               rtol=5e-4)


def test_sharded_training_trajectory_matches_single_device(tmp_path):
    """50-step convergence-grade equivalence (VERDICT r4 item 8): an 8-way
    DP-sharded training trajectory must track the single-device trajectory
    step for step, survive a mid-run sharded checkpoint save -> restore ->
    re-shard -> resume at step 25, and actually LEARN (late-window mse
    below the early window). One step proves the collectives; 50 steps prove the
    optimizer state, RNG folding, and checkpoint round-trip keep the two
    programs equivalent through real training."""
    from meanflow_audio_codec_tpu.training.checkpoints import (
        load_checkpoint_and_resume,
        save_checkpoint_with_metadata,
    )

    n_steps, resume_at = 50, 25
    mesh = create_mesh(data=8)
    objective = ImprovedMeanFlowObjective()
    step = make_train_step(objective, donate=False)
    root = jax.random.PRNGKey(9)

    def batch_at(i):
        return jax.random.normal(jax.random.fold_in(root, 1000 + i), (16, 16))

    def key_at(i):
        return jax.random.fold_in(root, i)

    # --- single-device trajectory ---------------------------------------
    state = _state()
    single_losses, single_mses = [], []
    for i in range(n_steps):
        state, metrics = step(state, key_at(i), batch_at(i))
        single_losses.append(float(metrics["loss"]))
        single_mses.append(float(metrics["mse"]))

    # --- sharded trajectory with a mid-run resume ------------------------
    sharded = shard_state(_state(), mesh)
    sharded_losses = []
    for i in range(n_steps):
        if i == resume_at:
            save_checkpoint_with_metadata(sharded, str(tmp_path), step=i)
            restored = load_checkpoint_and_resume(str(tmp_path), _state())
            assert restored is not None
            restored_state, start_step = restored
            assert start_step == resume_at
            sharded = shard_state(restored_state, mesh)
        data = jax.device_put(batch_at(i), batch_sharding(mesh))
        sharded, metrics = step(sharded, key_at(i), data)
        sharded_losses.append(float(metrics["loss"]))

    # Trajectories match step for step.  Reduction order differs between
    # the 8-way psum and the single-device sum, and the divergence
    # compounds through 50 parameter updates — hence the loose-ish rtol.
    np.testing.assert_allclose(sharded_losses, single_losses,
                               rtol=3e-3, atol=1e-5)
    # and training actually progressed: the adaptive loss is ~1.0 by
    # construction (CLAUDE.md), so convergence is read from the mse aux,
    # window-averaged against step-to-step noise.
    assert np.mean(single_mses[-10:]) < np.mean(single_mses[:10])
    assert int(sharded.step) == n_steps


def test_factorized_mixer_param_scaling():
    """Factorised stages scale linearly with width; dense stages do not."""
    def params_at(width, factorized):
        kwargs = dict(stage_tokens=32, factorized_stages=True) if factorized \
            else {}
        model = ConditionalMLPMixerFlow(
            noise_dimension=width, condition_dimension=16, num_blocks=1,
            latent_dimension=16, token_mix_dim=64, channel_mix_dim=64,
            num_channels=16, num_latent_tokens=4, encoder_context_tokens=8,
            **kwargs)
        variables = model.init(jax.random.PRNGKey(0), jnp.ones((2, width)),
                               jnp.zeros((2, 2)), method="init_all")
        return sum(int(np.size(p))
                   for p in jax.tree_util.tree_leaves(variables["params"]))

    fact_1k, fact_2k = params_at(1024, True), params_at(2048, True)
    dense_1k, dense_2k = params_at(1024, False), params_at(2048, False)
    assert fact_2k < 2.5 * fact_1k          # ~linear growth
    assert dense_2k > 3.0 * dense_1k        # quadratic growth
    assert fact_2k < dense_2k / 10          # order-of-magnitude smaller
