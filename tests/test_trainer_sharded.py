"""End-to-end trainer on the virtual 8-device CPU mesh (auto-DP path)."""

from pathlib import Path

import jax
import numpy as np

from meanflow_audio_codec_tpu.configs import (
    BaseConfig,
    DatasetConfig,
    MethodConfig,
    ModelConfig,
    TrainFlowConfig,
    TrainingConfig,
)
from meanflow_audio_codec_tpu.training.trainer import train_flow


def test_train_flow_auto_shards_over_8_devices(tmp_path, capsys):
    assert len(jax.devices()) == 8  # conftest contract
    config = TrainFlowConfig(
        base=BaseConfig(batch_size=16, n_steps=3, base_lr=1e-3,
                        weight_decay=0.0, seed=0),
        model=ModelConfig(noise_dimension=784, condition_dimension=8,
                          latent_dimension=4, num_blocks=1),
        dataset=DatasetConfig(dataset="mnist",
                              tokenization_strategy="reshape"),
        method=MethodConfig(method="improved_mean_flow",
                            use_improved_mean_flow=True),
        training=TrainingConfig(sample_every=3, sample_seed=0, sample_steps=1,
                                workdir=tmp_path / "run"),
    )
    summary = train_flow(config)
    out = capsys.readouterr().out
    assert "Sharding over mesh" in out
    assert np.isfinite(summary["loss"]["final"])
    assert (tmp_path / "run" / "checkpoints").exists()


def test_sharded_convnet_audio_trains_with_mesh_pool(tmp_path, capsys):
    """Flagship family end-to-end on the mesh: ConvNeXt decoder with
    factorised lift + TP=2 over 'model', audio MDCT frames DP-sharded over
    'data', fed by the mesh-aware device replay pool."""
    from meanflow_audio_codec_tpu.configs import TPUConfig

    config = TrainFlowConfig(
        base=BaseConfig(batch_size=8, n_steps=3, base_lr=1e-3,
                        weight_decay=0.0, seed=0),
        model=ModelConfig(noise_dimension=128, condition_dimension=16,
                          latent_dimension=8, num_blocks=1,
                          architecture="convnet",
                          architecture_options={
                              "channels": 64, "bottleneck_dim": 128,
                              "spatial": 8, "lift_channels": 8,
                              "remat": True,
                              "remat_policy": "dots_saveable"}),
        dataset=DatasetConfig(dataset="audio",
                              tokenization_strategy="mdct",
                              tokenization_config={
                                  "frame_size": 2048,
                                  "window_size": 64,
                                  "device_pool_clips": 16,
                              }),
        method=MethodConfig(method="improved_mean_flow",
                            use_improved_mean_flow=True),
        training=TrainingConfig(sample_every=1000, sample_seed=0,
                                sample_steps=1, workdir=tmp_path / "run",
                                checkpoint_step=3),
        tpu=TPUConfig(mesh_data=4, mesh_model=2),
    )
    summary = train_flow(config)
    out = capsys.readouterr().out
    assert "Sharding over mesh" in out
    assert "Mesh device replay pool" in out
    assert np.isfinite(summary["loss"]["final"])


def test_train_flow_indivisible_batch_falls_back(tmp_path, capsys):
    config = TrainFlowConfig(
        base=BaseConfig(batch_size=6, n_steps=2, base_lr=1e-3,  # 6 % 8 != 0
                        weight_decay=0.0, seed=0),
        model=ModelConfig(noise_dimension=784, condition_dimension=8,
                          latent_dimension=4, num_blocks=1),
        dataset=DatasetConfig(dataset="mnist",
                              tokenization_strategy="reshape"),
        method=MethodConfig(method="flow_matching"),
        training=TrainingConfig(sample_every=2, sample_seed=0, sample_steps=1,
                                workdir=tmp_path / "run"),
    )
    summary = train_flow(config)
    out = capsys.readouterr().out
    assert "running single-device" in out
    assert np.isfinite(summary["loss"]["final"])
