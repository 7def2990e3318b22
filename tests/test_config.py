"""Config system: validation, migration, round-trip, merge, diff, factories.

Covers the reference's config contract (reference test/test_config.py:25-275)
plus the additive TPU section.
"""

import json
from pathlib import Path

import pytest

from meanflow_audio_codec_tpu.configs import (
    AudioConfig,
    BaseConfig,
    DatasetConfig,
    MethodConfig,
    MNISTConfig,
    ModelConfig,
    TPUConfig,
    TrainFlowConfig,
    TrainingConfig,
    create_audio_config,
    create_mnist_config,
    diff_configs,
    load_config_from_json,
    merge_configs,
    migrate_config_v1_to_v2,
    save_config_to_json,
)


def _make_config(**method_kwargs) -> TrainFlowConfig:
    return TrainFlowConfig(
        base=BaseConfig(batch_size=32, n_steps=100, base_lr=1e-4,
                        weight_decay=1e-4, seed=0),
        model=ModelConfig(noise_dimension=784, condition_dimension=64,
                          latent_dimension=32, num_blocks=2),
        dataset=DatasetConfig(dataset="mnist", tokenization_strategy="reshape"),
        method=MethodConfig(**method_kwargs),
        training=TrainingConfig(sample_every=10, sample_seed=0, sample_steps=5,
                                workdir=Path("/tmp/test_run")),
    )


# ---- validation --------------------------------------------------------------

def test_validation_errors():
    with pytest.raises(ValueError, match="batch_size"):
        BaseConfig(batch_size=0, n_steps=1, base_lr=1e-4,
                   weight_decay=0.0, seed=0).validate()
    with pytest.raises(ValueError, match="must be even"):
        ModelConfig(noise_dimension=4, condition_dimension=3,
                    latent_dimension=2, num_blocks=1).validate()
    with pytest.raises(ValueError, match="architecture"):
        ModelConfig(noise_dimension=4, condition_dimension=4,
                    latent_dimension=2, num_blocks=1,
                    architecture="transformer").validate()
    with pytest.raises(ValueError, match="dataset"):
        DatasetConfig(dataset="cifar").validate()
    with pytest.raises(ValueError, match="noise_min"):
        MethodConfig(noise_min=1.5).validate()
    with pytest.raises(ValueError, match="must be <"):
        MethodConfig(noise_min=0.9, noise_max=0.5).validate()
    with pytest.raises(ValueError, match="use_improved_mean_flow"):
        MethodConfig(method="improved_mean_flow").validate()
    with pytest.raises(ValueError, match="precision"):
        TPUConfig(precision="fp8").validate()


def test_cross_field_method_validation_on_construction():
    with pytest.raises(ValueError, match="use_improved_mean_flow"):
        _make_config(method="improved_mean_flow", use_improved_mean_flow=False)
    config = _make_config(method="improved_mean_flow",
                          use_improved_mean_flow=True)
    assert config.method == "improved_mean_flow"


# ---- flat backward-compat access ----------------------------------------------

def test_flat_property_access():
    config = _make_config(gamma=0.5, noise_schedule="linear")
    assert config.batch_size == 32
    assert config.noise_dimension == 784
    assert config.gamma == 0.5
    assert config.noise_schedule == "linear"
    assert config.dataset == "mnist"          # name string, not section
    assert config.method is None or isinstance(config.method, str)
    assert config.tokenization_strategy == "reshape"
    assert config.workdir == Path("/tmp/test_run")
    assert config.sample_steps == 5
    with pytest.raises(AttributeError):
        _ = config.nonexistent_field


# ---- migration / round-trip -----------------------------------------------------

def test_v1_flat_migration():
    flat = {
        "batch_size": 16, "n_steps": 50, "base_lr": 1e-3, "weight_decay": 0.0,
        "seed": 1, "noise_dimension": 784, "condition_dimension": 64,
        "latent_dimension": 32, "num_blocks": 2, "architecture": "mlp",
        "dataset": "mnist", "use_improved_mean_flow": True, "gamma": 1.0,
        "sample_every": 10, "sample_seed": 0, "sample_steps": 5,
        "workdir": "/tmp/v1_run", "method": "improved_mean_flow",
    }
    migrated = migrate_config_v1_to_v2(flat)
    assert migrated["config_version"] == "2.0"
    assert migrated["base"]["batch_size"] == 16
    assert migrated["method"]["gamma"] == 1.0

    config = TrainFlowConfig.from_dict(flat)  # auto-migrates
    assert config.batch_size == 16
    assert config.use_improved_mean_flow is True
    assert config.workdir == Path("/tmp/v1_run")


def test_json_roundtrip(tmp_path):
    config = _make_config(method="mean_flow", gamma=0.5, c=1e-3)
    path = tmp_path / "config.json"
    save_config_to_json(config, path)
    loaded = load_config_from_json(path)
    assert loaded.to_dict() == config.to_dict()
    assert loaded.gamma == 0.5
    # v2 on-disk layout contract
    raw = json.loads(path.read_text())
    assert set(raw) >= {"config_version", "base", "model", "dataset",
                        "method", "training"}


def test_invalid_format_raises():
    with pytest.raises(ValueError, match="Invalid config format"):
        TrainFlowConfig.from_dict({"something": 1})


# ---- merge / diff -----------------------------------------------------------------

def test_merge_hierarchical_and_flat():
    config = _make_config()
    merged = merge_configs(config, {"base": {"batch_size": 64}})
    assert merged.batch_size == 64
    assert merged.n_steps == 100  # untouched

    merged_flat = merge_configs(config, {"batch_size": 8, "n_steps": 100,
                                         "base_lr": 1e-4})
    assert merged_flat.batch_size == 8
    assert merged_flat.noise_dimension == 784


def test_diff_configs():
    a = _make_config()
    b = merge_configs(a, {"base": {"batch_size": 64}})
    diff = diff_configs(a, b)
    assert diff["changed"] == {"base.batch_size": {"old": 32, "new": 64}}
    assert diff["added"] == [] and diff["removed"] == []
    empty = diff_configs(a, a)
    assert not (empty["changed"] or empty["added"] or empty["removed"])


# ---- factories ---------------------------------------------------------------------

def test_dataset_factories():
    mnist = create_mnist_config()
    assert mnist.dataset == "mnist"
    assert mnist.tokenization_strategy == "reshape"
    assert mnist.noise_dimension == 784
    assert "mnist" in str(mnist.workdir)  # reference had these swapped

    audio = create_audio_config()
    assert audio.dataset == "audio"
    assert audio.tokenization_strategy == "mdct"
    assert "audio" in str(audio.workdir)

    small = create_mnist_config(batch_size=4, n_steps=2, base_lr=1e-4)
    assert small.batch_size == 4
    assert small.dataset == "mnist"


def test_dataset_specific_constructors():
    assert MNISTConfig().tokenization_strategy == "reshape"
    assert AudioConfig().tokenization_strategy == "mdct"
    assert AudioConfig(tokenization_strategy="reshape").tokenization_strategy == "reshape"


# ---- deprecated workdir handling ----------------------------------------------------

def test_output_dir_deprecation():
    with pytest.warns(DeprecationWarning):
        config = TrainFlowConfig(
            base=BaseConfig(batch_size=1, n_steps=1, base_lr=1e-4,
                            weight_decay=0.0, seed=7),
            model=ModelConfig(noise_dimension=4, condition_dimension=4,
                              latent_dimension=2, num_blocks=1),
            dataset=DatasetConfig(),
            method=MethodConfig(use_improved_mean_flow=True),
            training=TrainingConfig(sample_every=1, sample_seed=0,
                                    sample_steps=1),
            output_dir=Path("/tmp/out"),
        )
    assert config.workdir == Path("/tmp/out/seed7_improved")

    with pytest.raises(ValueError, match="workdir or output_dir"):
        TrainFlowConfig(
            base=BaseConfig(batch_size=1, n_steps=1, base_lr=1e-4,
                            weight_decay=0.0, seed=0),
            model=ModelConfig(noise_dimension=4, condition_dimension=4,
                              latent_dimension=2, num_blocks=1),
            dataset=DatasetConfig(),
            method=MethodConfig(),
            training=TrainingConfig(sample_every=1, sample_seed=0,
                                    sample_steps=1),
        )


# ---- schema / docs -------------------------------------------------------------------

def test_schema_and_documentation():
    config = _make_config()
    schema = config.get_schema()
    assert schema["model"]["architecture"]["allowed_values"] == [
        "mlp", "mlp_mixer", "convnet", "simple_conv"]
    assert schema["base"]["batch_size"]["required"] is True
    docs = config.get_documentation()
    assert "TrainFlowConfig Documentation" in docs
    assert "batch_size" in docs and "TPUConfig" in docs


def test_tpu_section_defaults_and_roundtrip(tmp_path):
    config = _make_config()
    assert config.tpu.precision == "mixed"
    assert config.tpu.mesh_data == -1
    path = tmp_path / "c.json"
    save_config_to_json(config, path)
    loaded = load_config_from_json(path)
    assert loaded.tpu.precision == "mixed"
    merged = merge_configs(config, {"tpu": {"precision": "float32"}})
    assert merged.tpu.precision == "float32"


def test_architecture_options_flow_through_factory_and_json():
    """model.architecture_options passes family-specific sizing to the
    builder and survives the JSON round trip."""
    import json
    import tempfile
    from pathlib import Path

    from meanflow_audio_codec_tpu.configs import (
        create_audio_config,
        load_config_from_json,
    )
    from meanflow_audio_codec_tpu.models.factories import create_flow_model

    cfg = create_audio_config(**{"model": {
        "architecture": "convnet",
        "architecture_options": {"channels": 32, "bottleneck_dim": 64,
                                 "spatial": 8, "lift_channels": 4},
        "noise_dimension": 64, "condition_dimension": 16,
        "latent_dimension": 16, "num_blocks": 2}})
    model = create_flow_model(cfg)
    assert (model.channels, model.bottleneck_dim, model.spatial,
            model.lift_channels) == (32, 64, 8, 4)

    path = Path(tempfile.mkdtemp()) / "c.json"
    path.write_text(json.dumps(cfg.to_dict()))
    cfg2 = load_config_from_json(path)
    assert cfg2.model.architecture_options == {
        "channels": 32, "bottleneck_dim": 64, "spatial": 8,
        "lift_channels": 4}

    with pytest.raises(ValueError, match="architecture_options"):
        create_audio_config(**{"model": {
            "architecture_options": "not-a-dict",
            "noise_dimension": 64, "condition_dimension": 16,
            "latent_dimension": 16, "num_blocks": 2}})


def test_full_plus_default_data_proportion_rejected():
    """Validation uses the EFFECTIVE data proportion (0.5 default when
    unset, matching create_loss_strategy) so an over-full batch cannot
    pass validation and be silently clipped by sample_tr."""
    from meanflow_audio_codec_tpu.configs import create_mnist_config
    with pytest.raises(ValueError, match="must not exceed 1"):
        create_mnist_config(**{"method": {
            "method": "improved_mean_flow", "use_improved_mean_flow": True,
            "time_sampling_full_proportion": 0.6}})
    # explicit data proportion that fits passes
    cfg = create_mnist_config(**{"method": {
        "method": "improved_mean_flow", "use_improved_mean_flow": True,
        "time_sampling_data_proportion": 0.2,
        "time_sampling_full_proportion": 0.6}})
    assert cfg.time_sampling_full_proportion == 0.6
    # flow_ratio stands in for an unset data proportion
    with pytest.raises(ValueError, match="must not exceed 1"):
        create_mnist_config(**{"method": {
            "method": "improved_mean_flow", "use_improved_mean_flow": True,
            "flow_ratio": 0.7, "time_sampling_full_proportion": 0.4}})
