"""tools/export_samples: regenerable listenable evidence from a run dir.

Guards the evidence-export path end to end on a tiny trained workdir:
held-out float-latent pairs, the full byte-path bitstream pairs (default
8-bit and rate-aware ECSQ), the JSON sidecar, and the CLI wrapper.
"""

import json
import wave

import pytest

from meanflow_audio_codec_tpu.configs import (
    BaseConfig,
    DatasetConfig,
    MethodConfig,
    ModelConfig,
    TrainFlowConfig,
    TrainingConfig,
)
from meanflow_audio_codec_tpu.tools.export_samples import (
    export_samples,
    main,
)
from meanflow_audio_codec_tpu.training.trainer import train_flow

WINDOW = 64
FRAME_SIZE = 1024


def _config(workdir) -> TrainFlowConfig:
    return TrainFlowConfig(
        base=BaseConfig(batch_size=2, n_steps=2, base_lr=1e-3,
                        weight_decay=0.0, seed=0),
        model=ModelConfig(noise_dimension=WINDOW * 2, condition_dimension=8,
                          latent_dimension=6, num_blocks=1),
        dataset=DatasetConfig(dataset="audio", tokenization_strategy="mdct",
                              tokenization_config={
                                  "frame_size": FRAME_SIZE,
                                  "window_size": WINDOW,
                                  "coeff_scale": 2.0,
                              }),
        method=MethodConfig(method="improved_mean_flow",
                            use_improved_mean_flow=True),
        training=TrainingConfig(sample_every=1000, sample_seed=0,
                                sample_steps=1, workdir=workdir,
                                checkpoint_step=2),
    )


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp("export_run") / "run"
    train_flow(_config(str(wd)))
    return wd


def test_export_writes_pairs_and_sidecar(workdir):
    sidecar = export_samples(workdir, num_clips=2)
    out = workdir / "samples"
    for i in range(2):
        assert (out / f"heldout_{i}_original.wav").exists()
        assert (out / f"heldout_{i}_recon_nfe1.wav").exists()
    bitstream_wavs = sorted(out.glob("bitstream_*_recon_*kbps.wav"))
    assert len(bitstream_wavs) == 2
    assert len(sidecar["heldout"]) == 2
    assert len(sidecar["bitstream"]) == 2
    for row in sidecar["bitstream"]:
        assert row["kbps_measured"] > 0
    on_disk = json.loads((out / "export_samples.json").read_text())
    assert on_disk["num_clips"] == 2

    # pairs are equal-length, playable 16-bit PCM at the framework rate
    with wave.open(str(out / "heldout_0_original.wav")) as a, \
            wave.open(str(out / "heldout_0_recon_nfe1.wav")) as b:
        assert a.getnframes() == b.getnframes()
        assert a.getsampwidth() == 2
        assert a.getframerate() == 44100


def test_export_ecsq_and_cli(workdir, tmp_path, capsys):
    rc = main(["--workdir", str(workdir), "--num-clips", "1",
               "--step-frac", "0.5", "--out-dir", str(tmp_path)])
    assert rc == 0
    sidecar = json.loads((tmp_path / "export_samples.json").read_text())
    assert sidecar["bitstream"][0]["step_frac"] == 0.5
    assert "kbps" in capsys.readouterr().out
