"""Trainer with tpu.steps_per_call > 1 (scan-chunked hot loop)."""

import json

import numpy as np

from meanflow_audio_codec_tpu.configs import (
    BaseConfig,
    DatasetConfig,
    MethodConfig,
    ModelConfig,
    TPUConfig,
    TrainFlowConfig,
    TrainingConfig,
)
from meanflow_audio_codec_tpu.training.logging import read_log
from meanflow_audio_codec_tpu.training.trainer import train_flow


def _config(workdir, n_steps: int, steps_per_call: int) -> TrainFlowConfig:
    return TrainFlowConfig(
        base=BaseConfig(batch_size=8, n_steps=n_steps, base_lr=1e-3,
                        weight_decay=0.0, seed=0),
        model=ModelConfig(noise_dimension=784, condition_dimension=8,
                          latent_dimension=4, num_blocks=1),
        dataset=DatasetConfig(dataset="mnist",
                              tokenization_strategy="reshape"),
        method=MethodConfig(method="improved_mean_flow",
                            use_improved_mean_flow=True),
        training=TrainingConfig(sample_every=4, sample_seed=0, sample_steps=1,
                                workdir=workdir),
        tpu=TPUConfig(steps_per_call=steps_per_call),
    )


def test_multi_step_trainer_logs_every_step(tmp_path):
    summary = train_flow(_config(tmp_path / "run", n_steps=7,
                                 steps_per_call=3))
    records = [r for r in read_log(tmp_path / "run" / "logs" /
                                   "train_log.jsonl") if "loss" in r]
    steps = sorted(r["step"] for r in records)
    assert steps == list(range(7))  # 3 + 3 + 1 (partial final chunk)
    assert all(np.isfinite(r["loss"]) for r in records)
    assert summary["total_steps"] == 7
    # sampling + checkpoint fired on the crossed boundary
    assert (tmp_path / "run" / "samples" / "step_00006.png").exists()
    config_json = json.loads((tmp_path / "run" / "config.json").read_text())
    assert config_json["tpu"]["steps_per_call"] == 3


def test_multi_step_matches_single_step_loss_curve(tmp_path):
    train_flow(_config(tmp_path / "a", n_steps=4, steps_per_call=1))
    train_flow(_config(tmp_path / "b", n_steps=4, steps_per_call=2))
    a = [r["loss"] for r in read_log(tmp_path / "a" / "logs" /
                                     "train_log.jsonl") if "loss" in r]
    b = [r["loss"] for r in read_log(tmp_path / "b" / "logs" /
                                     "train_log.jsonl") if "loss" in r]
    # same seed but different key-split structure; both must be finite and
    # the same length — not bitwise equal
    assert len(a) == len(b) == 4
    assert np.isfinite(a).all() and np.isfinite(b).all()
