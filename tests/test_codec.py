"""AudioCodec product surface: encode -> latents -> 1-NFE decode."""

import numpy as np
import pytest

from meanflow_audio_codec_tpu.codec import AudioCodec
from meanflow_audio_codec_tpu.configs import (
    BaseConfig,
    DatasetConfig,
    MethodConfig,
    ModelConfig,
    TrainFlowConfig,
    TrainingConfig,
)
from meanflow_audio_codec_tpu.training.trainer import train_flow

WINDOW = 64
FRAME_SIZE = 1024
NOISE_DIM = WINDOW * 2  # stereo frame token


def _audio_config(workdir, n_steps: int = 2) -> TrainFlowConfig:
    return TrainFlowConfig(
        base=BaseConfig(batch_size=2, n_steps=n_steps, base_lr=1e-3,
                        weight_decay=0.0, seed=0),
        model=ModelConfig(noise_dimension=NOISE_DIM, condition_dimension=8,
                          latent_dimension=6, num_blocks=1),
        dataset=DatasetConfig(dataset="audio",
                              tokenization_strategy="mdct",
                              tokenization_config={
                                  "frame_size": FRAME_SIZE,
                                  "window_size": WINDOW,
                                  "coeff_scale": 2.0,
                              }),
        method=MethodConfig(method="improved_mean_flow",
                            use_improved_mean_flow=True),
        training=TrainingConfig(sample_every=1000, sample_seed=0,
                                sample_steps=1, workdir=workdir,
                                checkpoint_step=n_steps),
    )


@pytest.fixture(scope="module")
def trained_workdir(tmp_path_factory):
    workdir = tmp_path_factory.mktemp("codec_run") / "run"
    train_flow(_audio_config(str(workdir)))
    return workdir


def test_from_workdir_roundtrip_shapes(trained_workdir):
    codec = AudioCodec.from_workdir(trained_workdir)
    rng = np.random.default_rng(0)
    audio = rng.uniform(-0.5, 0.5, (2, FRAME_SIZE, 2)).astype(np.float32)

    latents = np.asarray(codec.encode(audio))
    assert latents.ndim == 3
    assert latents.shape[0] == 2 and latents.shape[2] == 6
    n_frames = latents.shape[1]

    recon = np.asarray(codec.decode(latents))
    assert recon.shape[0] == 2 and recon.shape[2] == 2
    assert recon.shape[1] >= FRAME_SIZE - WINDOW  # overlap-add trim
    assert np.isfinite(recon).all()

    # roundtrip == decode(encode(.)) under the same key
    rt = np.asarray(codec.roundtrip(audio))
    np.testing.assert_allclose(rt, recon, rtol=1e-5, atol=1e-5)

    # latent sequence length scales with audio length
    longer = rng.uniform(-0.5, 0.5, (1, 2 * FRAME_SIZE, 2)).astype(np.float32)
    latents2 = np.asarray(codec.encode(longer))
    assert latents2.shape[1] > n_frames


def test_decode_is_keyed(trained_workdir):
    import jax
    codec = AudioCodec.from_workdir(trained_workdir)
    rng = np.random.default_rng(1)
    audio = rng.uniform(-0.5, 0.5, (1, FRAME_SIZE, 2)).astype(np.float32)
    latents = codec.encode(audio)
    a = np.asarray(codec.decode(latents, key=jax.random.PRNGKey(1)))
    b = np.asarray(codec.decode(latents, key=jax.random.PRNGKey(2)))
    c = np.asarray(codec.decode(latents, key=jax.random.PRNGKey(1)))
    np.testing.assert_array_equal(a, c)      # reproducible
    assert np.abs(a - b).max() > 0           # stochastic transport

    # nfe > 1 runs the multi-interval path
    multi = np.asarray(codec.decode(latents, nfe=2))
    assert multi.shape == a.shape and np.isfinite(multi).all()


def test_codec_metadata(trained_workdir):
    codec = AudioCodec.from_workdir(trained_workdir)
    assert codec.frames_per_second == pytest.approx(44100.0 / (WINDOW // 2))
    assert codec.compression_ratio == pytest.approx((WINDOW // 2) * 2 / 6)


def test_packed_bitstream_roundtrip(trained_workdir):
    """encode_packed -> decode_packed: the stored-format product path."""
    import jax
    from meanflow_audio_codec_tpu.ops.latent_quant import dequantize_latents

    codec = AudioCodec.from_workdir(trained_workdir)
    rng = np.random.default_rng(7)
    audio = rng.uniform(-0.5, 0.5, (2, FRAME_SIZE, 2)).astype(np.float32)

    bs = codec.encode_packed(audio, bits=8)
    latents = np.asarray(codec.encode(audio))
    assert bs.codes.shape == latents.shape and bs.codes.dtype == np.int8

    # 8-bit dequantized latents track the float latents closely
    deq = np.asarray(dequantize_latents(bs))
    peak = np.abs(latents).max(axis=-1, keepdims=True)
    assert np.all(np.abs(deq - latents) <= peak * 2.5e-2 + 1e-7)

    # decode_packed == decode(dequantize(.)) under the same key
    key = jax.random.PRNGKey(3)
    a = np.asarray(codec.decode_packed(bs, key=key))
    b = np.asarray(codec.decode(dequantize_latents(bs), key=key))
    np.testing.assert_array_equal(a, b)

    # the bitrate is a real number derived from the run geometry
    kbps = codec.bitrate_kbps(bits=8)
    fps = codec.frames_per_second
    assert kbps == pytest.approx(fps * (6 * 8 + 32) / 1000.0)


def test_codec_cli_roundtrip(trained_workdir, tmp_path, capsys):
    """encode -> info -> decode through the user-facing CLI."""
    from meanflow_audio_codec_tpu.data.audio import load_audio_file, write_wav
    from meanflow_audio_codec_tpu.tools.codec_cli import main

    rng = np.random.default_rng(11)
    wav_in = tmp_path / "in.wav"
    write_wav(wav_in, rng.uniform(-0.5, 0.5, (FRAME_SIZE, 2)))

    macb = tmp_path / "in.macb"
    assert main(["encode", str(wav_in), "--workdir", str(trained_workdir),
                 "-o", str(macb)]) == 0
    assert macb.exists() and macb.read_bytes()[:4] == b"MACB"

    assert main(["info", str(macb)]) == 0
    out = capsys.readouterr().out
    assert "MACB v1" in out and "8-bit" in out

    wav_out = tmp_path / "recon.wav"
    assert main(["decode", str(macb), "--workdir", str(trained_workdir),
                 "-o", str(wav_out)]) == 0
    recon = load_audio_file(wav_out)
    assert recon is not None
    # frame-implied length: original padded by at most one window span
    assert FRAME_SIZE <= recon.shape[1] <= FRAME_SIZE + 2 * WINDOW
    assert np.isfinite(recon).all()


def test_codec_decode_under_data_sharding(trained_workdir):
    """Serving scales over a data mesh: decode with batch-sharded latents
    equals the unsharded decode (per-frame independence => DP subsumes
    sequence scaling, SURVEY.md §5.7; training sharding is covered by
    tests/test_trainer_sharded.py — this is the inference side."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    from meanflow_audio_codec_tpu.parallel import create_mesh

    codec = AudioCodec.from_workdir(trained_workdir)
    rng = np.random.default_rng(21)
    audio = rng.uniform(-0.5, 0.5, (8, FRAME_SIZE, 2)).astype(np.float32)
    latents = codec.encode(audio)

    mesh = create_mesh(data=8, model=1, devices=jax.devices()[:8])
    sharded = jax.device_put(
        latents, NamedSharding(mesh, PartitionSpec("data", None, None)))
    key = jax.random.PRNGKey(5)
    out_sharded = np.asarray(codec.decode(sharded, key=key))
    out_local = np.asarray(codec.decode(latents, key=key))
    np.testing.assert_allclose(out_sharded, out_local, rtol=1e-4, atol=1e-5)


def test_codec_rejects_non_frame_layout(tmp_path):
    from meanflow_audio_codec_tpu.configs import create_mnist_config
    cfg = create_mnist_config(**{"training": {"workdir": str(tmp_path)}})
    with pytest.raises(ValueError, match="per-frame"):
        AudioCodec(state=None, model=None, config=cfg)


def test_from_workdir_serving_fallback(trained_workdir, tmp_path):
    """A workdir restored from git (serving artifact only, full
    checkpoints lost with the host) still serves the codec, with the
    EMA/sampling param set."""
    import shutil

    from meanflow_audio_codec_tpu.training.checkpoints import (
        find_latest_checkpoint,
        save_serving_checkpoint,
    )
    from meanflow_audio_codec_tpu.training.trainer import load_flow_state

    restored = tmp_path / "restored_run"
    shutil.copytree(trained_workdir, restored)
    ckpt_dir = restored / "checkpoints"
    full = find_latest_checkpoint(ckpt_dir)
    state, _ = load_flow_state(
        full, __import__(
            "meanflow_audio_codec_tpu.configs.config",
            fromlist=["load_config_from_json"],
        ).load_config_from_json(restored / "config.json"))
    save_serving_checkpoint(state, ckpt_dir)
    full.unlink()  # simulate the untracked full checkpoint dying

    codec = AudioCodec.from_workdir(restored)
    reference = AudioCodec.from_workdir(trained_workdir)
    rng = np.random.default_rng(3)
    audio = rng.uniform(-0.5, 0.5, (2, FRAME_SIZE, 2)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(codec.roundtrip(audio)),
        np.asarray(reference.roundtrip(audio)), rtol=1e-5, atol=1e-6)
