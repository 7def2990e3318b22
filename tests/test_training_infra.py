"""Checkpoints, logging, profiling, and an end-to-end CPU trainer smoke."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from meanflow_audio_codec_tpu.configs import (
    BaseConfig,
    DatasetConfig,
    MethodConfig,
    ModelConfig,
    TrainFlowConfig,
    TrainingConfig,
)
from meanflow_audio_codec_tpu.models import ConditionalFlow, TrainState
from meanflow_audio_codec_tpu.training.checkpoints import (
    cleanup_old_checkpoints,
    count_params,
    find_latest_checkpoint,
    find_valid_checkpoint,
    get_checkpoint_step,
    list_checkpoints,
    load_checkpoint,
    load_checkpoint_and_resume,
    load_params_only,
    save_checkpoint_with_metadata,
    save_params_only,
    validate_checkpoint_file,
    validate_config_compatibility,
)
from meanflow_audio_codec_tpu.training.logging import (
    LogWriter,
    MetricsAggregator,
    append_metrics_csv,
    experiment_tag,
    generate_training_summary,
    read_log,
)
from meanflow_audio_codec_tpu.training.profiling import ProfilingTrainer


def _state(seed=0):
    model = ConditionalFlow(noise_dimension=8, condition_dimension=4,
                            num_blocks=1, latent_dimension=4)
    variables = model.init(jax.random.PRNGKey(seed), jnp.ones((2, 8)),
                           jnp.zeros((2, 2)), method="init_all")
    return TrainState.create(apply_fn=model.apply,
                             params=variables["params"], tx=optax.adam(1e-3))


def _config(workdir: Path) -> TrainFlowConfig:
    return TrainFlowConfig(
        base=BaseConfig(batch_size=4, n_steps=3, base_lr=1e-3,
                        weight_decay=0.0, seed=0),
        model=ModelConfig(noise_dimension=784, condition_dimension=8,
                          latent_dimension=4, num_blocks=1),
        dataset=DatasetConfig(dataset="mnist",
                              tokenization_strategy="reshape"),
        method=MethodConfig(method="flow_matching"),
        training=TrainingConfig(sample_every=2, sample_seed=0, sample_steps=1,
                                workdir=workdir, max_checkpoints_to_keep=2),
    )


# ---- checkpoints ---------------------------------------------------------------

def test_checkpoint_roundtrip_with_metadata(tmp_path):
    state = _state()
    path = save_checkpoint_with_metadata(state, tmp_path, step=7,
                                         config=_config(tmp_path))
    assert path.name == "step_00007.msgpack"
    sidecar = tmp_path / "step_00007.metadata.json"
    meta = json.loads(sidecar.read_text())
    assert meta["step"] == 7
    assert meta["param_count"] == count_params(state.params)
    assert meta["config_hash"]
    assert meta["param_shapes"]

    restored = load_checkpoint(path, _state(seed=1))
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_discovery_and_retention(tmp_path):
    state = _state()
    for step in (5, 10, 15, 20):
        save_checkpoint_with_metadata(state, tmp_path, step=step)
    assert get_checkpoint_step("step_00015.msgpack") == 15
    assert find_latest_checkpoint(tmp_path).name == "step_00020.msgpack"
    deleted = cleanup_old_checkpoints(tmp_path, max_to_keep=2, final_step=20)
    assert len(deleted) == 2
    remaining = [p.name for p in list_checkpoints(tmp_path)]
    assert remaining == ["step_00015.msgpack", "step_00020.msgpack"]


def test_corrupted_checkpoint_skipped(tmp_path):
    state = _state()
    save_checkpoint_with_metadata(state, tmp_path, step=1)
    # corrupt the newest checkpoint
    bad = tmp_path / "step_00002.msgpack"
    bad.write_bytes(b"x" * 200)
    ok, reason = validate_checkpoint_file(bad)
    assert not ok and "msgpack" in reason
    found = find_valid_checkpoint(tmp_path, template=_state(1))
    assert found.name == "step_00001.msgpack"
    restored = load_checkpoint_and_resume(tmp_path, _state(1))
    assert restored is not None and restored[1] == 1


def test_params_only_checkpoint(tmp_path):
    state = _state()
    path = save_params_only(state, tmp_path / "params.msgpack")
    params = load_params_only(path, _state(seed=2).params)
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_config_compatibility_check(tmp_path):
    state = _state()
    config = _config(tmp_path)
    path = save_checkpoint_with_metadata(state, tmp_path, step=1,
                                         config=config)
    ok, _ = validate_config_compatibility(path, config)
    assert ok
    other = _config(tmp_path)
    other.base.batch_size = 999
    ok, reason = validate_config_compatibility(path, other)
    assert not ok and "mismatch" in reason


# ---- logging -------------------------------------------------------------------

def test_log_writer_and_aggregator(tmp_path):
    log_path = tmp_path / "train_log.jsonl"
    with LogWriter(log_path) as log:
        for step in range(10):
            log.write_step(step, loss=1.0 / (step + 1), step_time=0.01,
                           note="ok")
    records = read_log(log_path)
    assert len(records) == 10 and records[0]["note"] == "ok"
    agg = MetricsAggregator(records)
    stats = agg.stats("loss")
    assert stats["final"] == pytest.approx(0.1)
    assert stats["max"] == pytest.approx(1.0)
    trend = agg.trend("loss", window=3)
    assert trend["improvement_pct"] > 0

    summary = generate_training_summary(log_path, total_time=2.0,
                                        total_steps=10, param_count=123)
    assert summary["steps_per_sec"] == pytest.approx(5.0)
    assert summary["param_count"] == 123


def test_experiment_tag_and_csv(tmp_path):
    config = _config(tmp_path)
    tag = experiment_tag(config)
    assert tag == ("method=flow_matching--architecture=mlp--dataset=mnist"
                   "--tokenization=reshape")
    csv = tmp_path / "m.csv"
    append_metrics_csv(csv, {"a": 1, "b": 2.5})
    append_metrics_csv(csv, {"a": 3, "b": 4.5})
    lines = csv.read_text().strip().splitlines()
    assert lines[0] == "a,b" and len(lines) == 3


def test_profiler_mfu_accounting():
    profiler = ProfilingTrainer(flops_per_step=1e9)
    profiler.start_training(param_count=10)
    profiler.before_step()
    record = profiler.after_step(0)
    assert record["step_time"] > 0
    assert "achieved_tflops" in record
    summary = profiler.end_training(total_steps=1)
    assert summary["steps_per_sec"] > 0


# ---- end-to-end trainer smoke (CPU, synthetic MNIST) ---------------------------

def test_train_flow_end_to_end(tmp_path):
    from meanflow_audio_codec_tpu.training.trainer import train_flow

    config = _config(tmp_path / "run")
    summary = train_flow(config)
    workdir = tmp_path / "run"
    assert (workdir / "config.json").exists()
    assert (workdir / "metadata.json").exists()
    assert (workdir / "summary.json").exists()
    assert (workdir / "logs" / "train_log.jsonl").exists()
    assert find_latest_checkpoint(workdir / "checkpoints") is not None
    assert summary["total_steps"] == 3
    assert np.isfinite(summary["loss"]["final"])


def test_train_flow_resume(tmp_path):
    from meanflow_audio_codec_tpu.training.trainer import train_flow

    config = _config(tmp_path / "run")
    train_flow(config)
    config2 = _config(tmp_path / "run")
    config2.base.n_steps = 5
    summary = train_flow(config2, resume=True)
    assert summary["total_steps"] == 2  # resumed from step 3
    assert (tmp_path / "run" / "config_diff.json").exists()


def test_orbax_checkpoint_roundtrip(tmp_path):
    from meanflow_audio_codec_tpu.training.checkpoints import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )
    state = _state()
    path = save_checkpoint_orbax(state, tmp_path / "step_00003.orbax")
    assert path.is_dir()
    restored = load_checkpoint_orbax(path, _state(seed=9))
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_format_in_trainer(tmp_path):
    from meanflow_audio_codec_tpu.training.checkpoints import (
        find_latest_checkpoint,
        load_checkpoint_and_resume,
    )
    from meanflow_audio_codec_tpu.training.trainer import train_flow

    config = _config(tmp_path / "run")
    config.training.checkpoint_format = "orbax"
    train_flow(config)
    latest = find_latest_checkpoint(tmp_path / "run" / "checkpoints")
    assert latest is not None and latest.suffix == ".orbax"
    # a mismatched template must be skipped gracefully, not crash
    assert load_checkpoint_and_resume(tmp_path / "run" / "checkpoints",
                                      _state()) is None
    config2 = _config(tmp_path / "run")
    config2.training.checkpoint_format = "orbax"
    config2.base.n_steps = 5
    summary = train_flow(config2, resume=True)
    assert summary["total_steps"] == 2


def test_orbax_retention_cleanup(tmp_path):
    from meanflow_audio_codec_tpu.training.checkpoints import (
        cleanup_old_checkpoints,
        list_checkpoints,
        save_checkpoint_with_metadata,
    )
    state = _state()
    for step in (1, 2, 3):
        save_checkpoint_with_metadata(state, tmp_path, step=step, fmt="orbax")
    deleted = cleanup_old_checkpoints(tmp_path, max_to_keep=1, final_step=3)
    assert len(deleted) == 2
    assert [p.name for p in list_checkpoints(tmp_path)] == ["step_00003.orbax"]


def test_load_flow_state_restores_ema_and_prefers_it():
    """Checkpoints from EMA-tracking runs restore ema_params; the
    comprehensive evaluator samples from them."""
    import numpy as np
    import optax
    from meanflow_audio_codec_tpu.configs import create_mnist_config
    from meanflow_audio_codec_tpu.models import TrainState
    from meanflow_audio_codec_tpu.models.factories import create_flow_model
    from meanflow_audio_codec_tpu.training.checkpoints import save_checkpoint
    from meanflow_audio_codec_tpu.training.trainer import load_flow_state

    cfg = create_mnist_config(**{
        "model": {"noise_dimension": 16, "condition_dimension": 8,
                  "latent_dimension": 8, "num_blocks": 1},
        "training": {"sample_every": 1, "sample_seed": 0, "sample_steps": 1,
                     "workdir": "/tmp/ema_load_test", "ema_decay": 0.99},
    })
    model = create_flow_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 16)),
                           jnp.zeros((2, 2)), method="init_all")
    ema = jax.tree_util.tree_map(lambda p: p + 1.0, variables["params"])
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              tx=optax.adamw(cfg.base_lr, weight_decay=cfg.weight_decay),
                              ema_params=ema)
    path = Path("/tmp/ema_load_test_ckpt.msgpack")
    save_checkpoint(state, path)

    restored, _ = load_flow_state(path, cfg)
    assert restored.ema_params is not None
    p0 = jax.tree_util.tree_leaves(restored.params)[0]
    e0 = jax.tree_util.tree_leaves(restored.ema_params)[0]
    np.testing.assert_allclose(np.asarray(e0), np.asarray(p0) + 1.0,
                               rtol=1e-6)


def test_load_flow_state_without_ema_falls_back():
    """Checkpoints from runs without EMA still load (plain template)."""
    import optax
    from meanflow_audio_codec_tpu.configs import create_mnist_config
    from meanflow_audio_codec_tpu.models import TrainState
    from meanflow_audio_codec_tpu.models.factories import create_flow_model
    from meanflow_audio_codec_tpu.training.checkpoints import save_checkpoint
    from meanflow_audio_codec_tpu.training.trainer import load_flow_state

    cfg = create_mnist_config(**{
        "model": {"noise_dimension": 16, "condition_dimension": 8,
                  "latent_dimension": 8, "num_blocks": 1},
        "training": {"sample_every": 1, "sample_seed": 0, "sample_steps": 1,
                     "workdir": "/tmp/noema_load_test"},
    })
    model = create_flow_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 16)),
                           jnp.zeros((2, 2)), method="init_all")
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              tx=optax.adamw(cfg.base_lr, weight_decay=cfg.weight_decay))
    path = Path("/tmp/noema_load_test_ckpt.msgpack")
    save_checkpoint(state, path)
    restored, _ = load_flow_state(path, cfg)
    assert int(restored.step) == 0


def test_serving_checkpoint_roundtrip(tmp_path):
    """The git-committable serving artifact (EMA params only) loads
    through load_flow_state with the EMA set served in both param slots —
    the disaster-recovery path for host restores that drop untracked
    full checkpoints."""
    import optax
    from meanflow_audio_codec_tpu.configs import create_mnist_config
    from meanflow_audio_codec_tpu.models import TrainState
    from meanflow_audio_codec_tpu.models.factories import create_flow_model
    from meanflow_audio_codec_tpu.training.checkpoints import (
        find_latest_serving_checkpoint,
        save_checkpoint,
        save_serving_checkpoint,
    )
    from meanflow_audio_codec_tpu.training.trainer import load_flow_state

    cfg = create_mnist_config(**{
        "model": {"noise_dimension": 16, "condition_dimension": 8,
                  "latent_dimension": 8, "num_blocks": 1},
        "training": {"sample_every": 1, "sample_seed": 0, "sample_steps": 1,
                     "workdir": str(tmp_path), "ema_decay": 0.99},
    })
    model = create_flow_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 16)),
                           jnp.zeros((2, 2)), method="init_all")
    ema = jax.tree_util.tree_map(lambda p: p + 1.0, variables["params"])
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=optax.adamw(cfg.base_lr, weight_decay=cfg.weight_decay),
        ema_params=ema).replace(step=41)

    serving = save_serving_checkpoint(state, tmp_path, step=41)
    assert serving.name == "serving_step_00041.msgpack"
    full = save_checkpoint(state, tmp_path / "step_00041.msgpack")
    # the serving file is ~1/4 the full TrainState (no optimizer moments,
    # one param set instead of two)
    assert serving.stat().st_size < 0.5 * full.stat().st_size
    assert find_latest_serving_checkpoint(tmp_path) == serving

    restored, _ = load_flow_state(serving, cfg)
    assert int(restored.step) == 41
    for got, want in zip(jax.tree_util.tree_leaves(restored.ema_params),
                         jax.tree_util.tree_leaves(ema)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6)
    # serving files expose the EMA set through BOTH slots (codec.params
    # prefers EMA; plain params consumers get the same weights)
    p0 = jax.tree_util.tree_leaves(restored.params)[0]
    e0 = jax.tree_util.tree_leaves(restored.ema_params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(e0))


def test_grad_clip_and_warmup_optimizer():
    """grad_clip_norm bounds the update scale; warmup ramps the LR; the
    checkpoint template (load_flow_state) matches the trained state tree."""
    import optax
    from meanflow_audio_codec_tpu.configs import create_mnist_config
    from meanflow_audio_codec_tpu.models import TrainState
    from meanflow_audio_codec_tpu.models.factories import create_flow_model
    from meanflow_audio_codec_tpu.training.checkpoints import save_checkpoint
    from meanflow_audio_codec_tpu.training.trainer import (
        load_flow_state,
        make_optimizer,
    )

    cfg = create_mnist_config(**{
        "base": {"batch_size": 4, "n_steps": 2, "base_lr": 1e-3,
                 "weight_decay": 0.0, "seed": 0, "grad_clip_norm": 1e-8,
                 "warmup_steps": 10},
        "model": {"noise_dimension": 16, "condition_dimension": 8,
                  "latent_dimension": 8, "num_blocks": 1},
        "training": {"sample_every": 1, "sample_seed": 0, "sample_steps": 1,
                     "workdir": "/tmp/clip_test"},
    })
    model = create_flow_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 16)),
                           jnp.zeros((2, 2)), method="init_all")
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              tx=make_optimizer(cfg))
    x = jnp.ones((4, 16))

    def loss_fn(p):
        out = model.apply({"params": p}, x, jnp.zeros((4, 2)))
        return jnp.mean(jnp.square(out - x))

    grads = jax.grad(loss_fn)(state.params)
    new_state = state.apply_gradients(grads=grads)
    # clip 1e-8 + warmup lr ~0 at step 0 => essentially no movement
    delta = max(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(new_state.params)))
    assert delta < 1e-6

    # checkpoint template rebuilds the same optimizer tree
    path = Path("/tmp/clip_test_ckpt.msgpack")
    save_checkpoint(new_state, path)
    restored, _ = load_flow_state(path, cfg)
    assert int(restored.step) == 1


def test_cosine_lr_schedule():
    """lr_schedule='cosine' ramps over warmup then decays to
    lr_final_fraction * base_lr by n_steps; invalid names are rejected."""
    import pytest
    from meanflow_audio_codec_tpu.configs import create_mnist_config

    base = {"batch_size": 4, "n_steps": 100, "base_lr": 1e-3,
            "weight_decay": 0.0, "seed": 0, "warmup_steps": 10,
            "lr_schedule": "cosine", "lr_final_fraction": 0.1}
    cfg = create_mnist_config(**{"base": base})
    # rebuild the schedule the optimizer uses and probe it directly
    import optax
    warmup = cfg.base.warmup_steps
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=cfg.base_lr, warmup_steps=warmup,
        decay_steps=cfg.n_steps, end_value=cfg.base_lr * 0.1)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(warmup)) - cfg.base_lr) < 1e-9
    assert abs(float(sched(cfg.n_steps)) - cfg.base_lr * 0.1) < 1e-9
    # the trainer's optimizer builds with the cosine config
    from meanflow_audio_codec_tpu.training.trainer import make_optimizer
    assert make_optimizer(cfg) is not None

    with pytest.raises(ValueError, match="lr_schedule"):
        create_mnist_config(**{"base": {**base, "lr_schedule": "linear"}})
    with pytest.raises(ValueError, match="lr_final_fraction"):
        create_mnist_config(**{"base": {**base, "lr_final_fraction": 2.0}})
