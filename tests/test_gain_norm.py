"""Gain/shape coding (TokenAdapter ``gain_norm``): the round-5 fix for the
mixed-family training stall.

Per-frame token energy spans ~3 orders of magnitude across the synthetic
families; the adaptive loss weight ``1/sqrt(d2+c)`` (ops/losses.py) then
lets low-energy frames starve the learnable ones (the ch256 mixed frontier
run sat at grad_norm ~0.003 and never converged). With ``gain_norm`` on,
every flow example is a unit-RMS *shape* and the gain becomes codec side
info — one 8-bit log-gain per frame in the MACB bitstream.

Covers: adapter normalise/restore inversion, the codec surfaces
(roundtrip / packed / bytes), the bitstream gain section, and streaming
parity with gains flowing encoder -> decoder.
"""

import dataclasses

import jax
import jax.numpy as jnp
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
from meanflow_audio_codec_tpu.ops.latent_quant import (
    dequantize_gains,
    describe_bitstream,
    pack_bitstream,
    quantize_gains,
    quantize_latents,
    unpack_bitstream,
)
from meanflow_audio_codec_tpu.ops.tokenize import create_tokenization_strategy
from meanflow_audio_codec_tpu.streaming import (
    StreamingCodec,
    StreamingDecoder,
    StreamingEncoder,
    frame_noise,
)
from meanflow_audio_codec_tpu.training.trainer import TokenAdapter, train_flow

WINDOW = 64
HOP = WINDOW // 2
FRAME_SIZE = 1024
NOISE_DIM = WINDOW * 2  # stereo frame token
GAIN_EPS = 0.05


def _audio(seed=0, batch=2, length=FRAME_SIZE):
    rng = np.random.default_rng(seed)
    # strongly non-uniform per-frame energy: bursts over near-silence,
    # the regime gain/shape coding exists for
    t = np.arange(length, dtype=np.float32)
    env = np.exp(-0.5 * ((t - length / 3) / (length / 12)) ** 2)
    x = rng.uniform(-0.5, 0.5, (batch, length, 2)).astype(np.float32)
    return (x * (env[None, :, None] + 0.003)).astype(np.float32)


def _config(workdir) -> TrainFlowConfig:
    return TrainFlowConfig(
        base=BaseConfig(batch_size=2, n_steps=2, base_lr=1e-3,
                        weight_decay=0.0, seed=0),
        model=ModelConfig(noise_dimension=NOISE_DIM, condition_dimension=8,
                          latent_dimension=6, num_blocks=1),
        dataset=DatasetConfig(dataset="audio",
                              tokenization_strategy="mdct",
                              tokenization_config={
                                  "frame_size": FRAME_SIZE,
                                  "window_size": WINDOW,
                                  "coeff_scale": 2.0,
                                  "gain_norm": GAIN_EPS,
                              }),
        method=MethodConfig(method="improved_mean_flow",
                            use_improved_mean_flow=True),
        training=TrainingConfig(sample_every=1000, sample_seed=0,
                                sample_steps=1, workdir=workdir,
                                checkpoint_step=2),
    )


@pytest.fixture(scope="module")
def codec(tmp_path_factory):
    """A (2-step) trained gain-normalised codec — the fixture itself
    exercises train_flow with gain_norm on."""
    workdir = tmp_path_factory.mktemp("gain_norm_run") / "run"
    train_flow(_config(str(workdir)))
    return AudioCodec.from_workdir(workdir)


# ---------------------------------------------------------------------------
# TokenAdapter
# ---------------------------------------------------------------------------

def test_adapter_normalises_to_unit_frame_rms():
    strat = create_tokenization_strategy("mdct", {"window_size": WINDOW})
    ad = TokenAdapter(strat, "frames", scale=2.0, gain_norm=GAIN_EPS)
    flat, gains = ad.tokenize_with_gain(jnp.asarray(_audio()))
    rms = np.asarray(jnp.sqrt(jnp.mean(flat * flat, axis=-1)))
    # loud frames sit at ~1; silent frames are *below* 1 (epsilon floor
    # keeps silence from being amplified into unit noise), never above
    assert rms.max() <= 1.0 + 1e-4
    assert np.median(rms[rms > 0.5]) == pytest.approx(1.0, abs=0.1)
    assert gains.shape == (2, ad.token_shape[0], 1)
    assert np.asarray(gains).min() >= GAIN_EPS - 1e-7


def test_adapter_gain_restore_matches_plain_roundtrip():
    strat = create_tokenization_strategy("mdct", {"window_size": WINDOW})
    x = jnp.asarray(_audio(seed=3))
    ad = TokenAdapter(strat, "frames", scale=2.0, gain_norm=GAIN_EPS)
    flat, gains = ad.tokenize_with_gain(x)
    rec = ad.detokenize_flat(flat, ad.token_shape, gains=gains)
    plain = TokenAdapter(strat, "frames", scale=2.0)
    rec0 = plain.detokenize_flat(plain.tokenize(x), plain.token_shape)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(rec0),
                               rtol=1e-4, atol=1e-6)


def test_adapter_clip_mode_gain_is_per_clip():
    strat = create_tokenization_strategy("mdct", {"window_size": WINDOW})
    ad = TokenAdapter(strat, "flat", scale=2.0, gain_norm=GAIN_EPS)
    flat, gains = ad.tokenize_with_gain(jnp.asarray(_audio()))
    assert gains.shape == (2, 1, 1)
    rms = np.asarray(jnp.sqrt(jnp.mean(flat * flat, axis=-1)))
    np.testing.assert_allclose(rms, 1.0, rtol=0.05)


def test_adapter_off_is_identity_with_unit_gains():
    strat = create_tokenization_strategy("mdct", {"window_size": WINDOW})
    x = jnp.asarray(_audio(seed=4))
    ad = TokenAdapter(strat, "frames", scale=2.0)
    flat, gains = ad.tokenize_with_gain(x)
    np.testing.assert_array_equal(np.asarray(gains), 1.0)
    np.testing.assert_allclose(np.asarray(flat), np.asarray(ad.tokenize(x)))


# ---------------------------------------------------------------------------
# 8-bit log-gain grid
# ---------------------------------------------------------------------------

def test_gain_grid_roundtrip_error_bounded():
    g = np.exp2(np.random.default_rng(0).uniform(-11.5, 3.5,
                                                 (4, 64, 1))).astype(
        np.float32)
    gq = dequantize_gains(quantize_gains(g))
    # half-step of the [-12, 4] / 256 log2 grid = 2^(16/512)-1 ~ 2.2%
    assert np.max(np.abs(gq / g - 1.0)) < 0.023


def test_gain_grid_saturates_not_wraps():
    codes = quantize_gains(np.asarray([[1e-9], [1e6]], dtype=np.float32))
    assert codes[0, 0] == 0 and codes[1, 0] == 255


# ---------------------------------------------------------------------------
# Bitstream side-info section
# ---------------------------------------------------------------------------

def test_bitstream_gain_section_roundtrip():
    lat = np.random.default_rng(1).standard_normal((2, 16, 8)).astype(
        np.float32)
    g = dequantize_gains(quantize_gains(
        np.abs(np.random.default_rng(2).standard_normal((2, 16, 1))) + 0.01))
    stream = dataclasses.replace(quantize_latents(jnp.asarray(lat), bits=8),
                                 gains=jnp.asarray(g))
    data = pack_bitstream(stream)
    back = unpack_bitstream(data)
    np.testing.assert_allclose(np.asarray(back.gains), g, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(back.codes),
                                  np.asarray(stream.codes))
    info = describe_bitstream(data)
    assert info["gain_shape"] is True
    # exactly one byte per frame of side info
    plain = pack_bitstream(quantize_latents(jnp.asarray(lat), bits=8))
    assert len(data) - len(plain) == 2 * 16
    assert describe_bitstream(plain)["gain_shape"] is False
    assert unpack_bitstream(plain).gains is None


# ---------------------------------------------------------------------------
# Codec surfaces
# ---------------------------------------------------------------------------

def test_codec_roundtrip_restores_energy_profile(codec):
    audio = _audio(seed=5)
    latents, gains = codec.encode_with_gains(audio)
    assert gains.shape == (latents.shape[0], latents.shape[1], 1)
    rt = np.asarray(codec.roundtrip(audio))
    assert np.isfinite(rt).all()
    # decode without gains is the unit-RMS shape decode — a gain-normalised
    # codec's roundtrip must differ from it (energy restored)
    flat_decode = np.asarray(codec.decode(latents))
    assert not np.allclose(rt, flat_decode[:, :rt.shape[1]])
    # roundtrip == decode(encode) with gains under the same key
    manual = np.asarray(codec.decode(latents, gains=gains))
    np.testing.assert_allclose(rt, manual, rtol=1e-5, atol=1e-6)


def test_codec_packed_and_bytes_carry_gains(codec):
    audio = _audio(seed=6)
    stream = codec.encode_packed(audio, bits=8)
    assert stream.gains is not None
    # in-memory packed decode == full byte-path decode (gains identical
    # because encode_packed stores grid-quantized gains)
    key = jax.random.PRNGKey(3)
    a = np.asarray(codec.decode_packed(stream, key=key))
    data = pack_bitstream(stream)
    b = np.asarray(codec.decode_bytes(bytes(data), key=key))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    assert describe_bitstream(data)["gain_shape"] is True


# ---------------------------------------------------------------------------
# Streaming parity with gains
# ---------------------------------------------------------------------------

def test_streaming_encoder_emits_gains_matching_batch(codec):
    audio = _audio(seed=7)
    _, gains = codec.encode_with_gains(audio)
    enc = StreamingEncoder(codec)
    got = []
    for i in range(0, audio.shape[1], 4 * HOP):
        out = enc.push(jnp.asarray(audio[:, i:i + 4 * HOP]))
        if out.shape[1]:
            got.append(np.asarray(enc.last_gains))
        else:
            assert enc.last_gains is None
    out = enc.flush()
    if out.shape[1]:
        got.append(np.asarray(enc.last_gains))
    np.testing.assert_allclose(np.concatenate(got, axis=1),
                               np.asarray(gains), rtol=1e-5, atol=1e-7)


def test_streaming_duplex_matches_batch_decode_with_gains(codec):
    audio = _audio(seed=8)
    latents, gains = codec.encode_with_gains(audio)
    b, nf, _ = latents.shape
    key = jax.random.PRNGKey(11)

    noise = frame_noise(key, 0, nf, b, codec.noise_dim)
    tokens = codec._decode_tokens(codec.params, latents, key, nfe=1,
                                  noise=noise.reshape(b * nf, -1))
    batch_audio = np.asarray(codec.adapter.detokenize_flat(
        tokens.reshape(b * nf, -1), (nf, codec.noise_dim), gains=gains))

    dec = StreamingDecoder(codec, key=key)
    parts = [np.asarray(dec.push(latents[:, i:i + 3],
                                 gains=gains[:, i:i + 3]))
             for i in range(0, nf, 3)]
    parts.append(np.asarray(dec.flush()))
    stream_audio = np.concatenate(parts, axis=1)

    assert stream_audio.shape == batch_audio.shape
    np.testing.assert_allclose(stream_audio, batch_audio,
                               rtol=1e-4, atol=1e-5)


def test_streaming_packet_path_carries_gains(codec):
    audio = _audio(seed=9)
    enc = StreamingEncoder(codec)
    packet = b""
    i = 0
    while not packet:
        packet = enc.push_bytes(jnp.asarray(audio[:, i:i + 8 * HOP]))
        i += 8 * HOP
    assert describe_bitstream(packet)["gain_shape"] is True
    dec = StreamingDecoder(codec)
    out = dec.push_bytes(packet)
    assert np.isfinite(np.asarray(out)).all()


def test_duplex_roundtrip_runs_gain_normalised(codec):
    duplex = StreamingCodec(codec)
    audio = _audio(seed=10)
    parts = [np.asarray(duplex.push(jnp.asarray(audio[:, i:i + 8 * HOP])))
             for i in range(0, audio.shape[1], 8 * HOP)]
    parts.append(np.asarray(duplex.flush()))
    out = np.concatenate(parts, axis=1)
    assert out.shape[1] >= audio.shape[1]
    assert np.isfinite(out).all()
