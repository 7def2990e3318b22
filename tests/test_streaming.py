"""Streaming codec surface: chunked push/flush == batch encode/decode.

The load-bearing property is *exact batch parity*: any chunking of the
input stream must produce the same latents (encoder) and the same samples
(decoder, per-frame fold_in noise) as one whole-clip AudioCodec call.
"""

import jax
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
from meanflow_audio_codec_tpu.streaming import (
    StreamingDecoder,
    StreamingEncoder,
    frame_noise,
)
from meanflow_audio_codec_tpu.training.trainer import train_flow

WINDOW = 64
HOP = WINDOW // 2
SPAN = 2 * WINDOW
FRAME_SIZE = 1024
NOISE_DIM = WINDOW * 2  # stereo frame token


def _audio_config(workdir) -> TrainFlowConfig:
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
                              }),
        method=MethodConfig(method="improved_mean_flow",
                            use_improved_mean_flow=True),
        training=TrainingConfig(sample_every=1000, sample_seed=0,
                                sample_steps=1, workdir=workdir,
                                checkpoint_step=2),
    )


@pytest.fixture(scope="module")
def codec(tmp_path_factory):
    workdir = tmp_path_factory.mktemp("streaming_run") / "run"
    train_flow(_audio_config(str(workdir)))
    return AudioCodec.from_workdir(workdir)


def _audio(batch=2, t=FRAME_SIZE, ch=2, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-0.5, 0.5, (batch, t, ch)).astype(np.float32)


def _stream_encode(codec, audio, sizes):
    enc = StreamingEncoder(codec)
    parts, pos = [], 0
    for s in sizes:
        parts.append(np.asarray(enc.push(audio[:, pos:pos + s])))
        pos += s
    parts.append(np.asarray(enc.flush(audio[:, pos:] if pos < audio.shape[1]
                                      else None)))
    return np.concatenate(parts, axis=1)


@pytest.mark.parametrize("sizes", [
    [FRAME_SIZE],                       # one push == batch
    [256, 256, 256, 256],               # hop-aligned chunks
    [SPAN],                             # single span, rest via flush
    [96, 512, 100, 31],                 # ragged, non-hop-aligned + tail
    [16] * 8,                           # every push smaller than a frame
])
def test_streaming_encode_matches_batch(codec, sizes):
    audio = _audio()
    batch_latents = np.asarray(codec.encode(audio))
    stream_latents = _stream_encode(codec, audio, sizes)
    assert stream_latents.shape == batch_latents.shape
    np.testing.assert_allclose(stream_latents, batch_latents,
                               rtol=1e-5, atol=1e-6)


def test_encoder_flush_resets_for_reuse(codec):
    """flush() resets state: the same encoder re-streams a second clip."""
    enc = StreamingEncoder(codec)
    first, second = _audio(seed=1), _audio(seed=2)
    for clip in (first, second):
        parts = [np.asarray(enc.push(clip[:, :512])),
                 np.asarray(enc.push(clip[:, 512:])),
                 np.asarray(enc.flush())]
        got = np.concatenate(parts, axis=1)
        np.testing.assert_allclose(got, np.asarray(codec.encode(clip)),
                                   rtol=1e-5, atol=1e-6)


def test_streaming_decode_chunking_invariant(codec):
    latents = np.asarray(codec.encode(_audio(seed=3)))
    key = jax.random.PRNGKey(7)

    def run(chunks):
        dec = StreamingDecoder(codec, key=key)
        parts = [np.asarray(dec.push(latents[:, a:b])) for a, b in chunks]
        parts.append(np.asarray(dec.flush()))
        return np.concatenate(parts, axis=1)

    nf = latents.shape[1]
    one = run([(0, nf)])
    fours = run([(i, min(i + 4, nf)) for i in range(0, nf, 4)])
    ragged = run([(0, 1), (1, 6), (6, 7), (7, nf)])
    np.testing.assert_allclose(fours, one, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ragged, one, rtol=1e-5, atol=1e-6)


def test_streaming_decode_matches_batch_with_same_noise(codec):
    """Streaming == the batch decode driven by the same per-frame noise."""
    audio = _audio(seed=5)
    latents = codec.encode(audio)
    b, nf, _ = latents.shape
    key = jax.random.PRNGKey(11)

    noise = frame_noise(key, 0, nf, b, codec.noise_dim)
    tokens = codec._decode_tokens(codec.params, latents, key, nfe=1,
                                  noise=noise.reshape(b * nf, -1))
    batch_audio = np.asarray(codec.adapter.detokenize_flat(
        tokens.reshape(b * nf, -1), (nf, codec.noise_dim)))

    dec = StreamingDecoder(codec, key=key)
    parts = [np.asarray(dec.push(latents[:, i:i + 3]))
             for i in range(0, nf, 3)]
    parts.append(np.asarray(dec.flush()))
    stream_audio = np.concatenate(parts, axis=1)

    assert stream_audio.shape == batch_audio.shape
    np.testing.assert_allclose(stream_audio, batch_audio,
                               rtol=1e-4, atol=1e-5)


def test_duplex_latency_and_alignment(codec):
    """Duplex push emits exactly chunk-size samples lagged by 2W - H."""
    duplex = codec.streaming(key=jax.random.PRNGKey(0))
    assert duplex.latency_samples == SPAN - HOP
    audio = _audio(t=4 * SPAN)
    chunk = SPAN  # hop-aligned
    outs = [np.asarray(duplex.push(audio[:, i:i + chunk]))
            for i in range(0, audio.shape[1], chunk)]
    # steady state: every push after the first emits exactly `chunk`
    assert [o.shape[1] for o in outs[1:]] == [chunk] * (len(outs) - 1)
    total_pushed = sum(o.shape[1] for o in outs)
    assert audio.shape[1] - total_pushed == duplex.latency_samples
    tail = np.asarray(duplex.flush())
    full = np.concatenate(outs + [tail], axis=1)
    # batch output length convention: (nf-1)*hop + 2W
    nf = (audio.shape[1] - WINDOW) // HOP + 1
    assert full.shape[1] == (nf - 1) * HOP + SPAN
    assert np.isfinite(full).all()


def test_decoder_noise_is_frame_indexed(codec):
    """Different keys decode differently; same key is chunking-stable."""
    latents = np.asarray(codec.encode(_audio(seed=9)))[:, :4]
    a = np.asarray(StreamingDecoder(codec,
                                    key=jax.random.PRNGKey(1)).push(latents))
    b = np.asarray(StreamingDecoder(codec,
                                    key=jax.random.PRNGKey(2)).push(latents))
    assert np.abs(a - b).max() > 0


def test_packet_streaming_roundtrip(codec):
    """push_bytes packets decode to the same audio as float streaming,
    up to the 8-bit latent quantization."""
    audio = _audio(seed=13, t=2048)
    key = jax.random.PRNGKey(4)

    enc, dec = StreamingEncoder(codec), StreamingDecoder(codec, key=key)
    parts, packets = [], []
    # first push smaller than the 2W lookahead -> empty packet passthrough
    bounds = [0, 64] + list(range(64 + 512, 2048 + 1, 512))
    for a, b in zip(bounds[:-1], bounds[1:]):
        pkt = enc.push_bytes(audio[:, a:b])
        assert isinstance(pkt, bytes)
        packets.append(pkt)
        parts.append(np.asarray(dec.push_bytes(pkt)))
    assert packets[0] == b""  # lookahead still filling on the first push
    assert parts[0].size == 0  # placeholder emission for the empty packet
    assert all(p[:4] == b"MACB" for p in packets[1:])
    got = np.concatenate([p for p in parts if p.size], axis=1)

    # transport-layer contract: the packets decode to exactly what one
    # stateful decode of their unpacked latents produces
    from meanflow_audio_codec_tpu.ops.latent_quant import (
        dequantize_latents, unpack_bitstream)
    lat = np.concatenate([
        np.asarray(dequantize_latents(unpack_bitstream(p)))
        for p in packets if p], axis=1)
    ref_dec = StreamingDecoder(codec, key=key)
    ref = np.asarray(ref_dec.push(lat))
    # XLA retiles the model matmuls at different row counts (15/16-frame
    # pushes vs one 61-frame push), giving ~1e-4-level fp drift on a few
    # elements; the exact cross-boundary state contract is already proven
    # by test_streaming_decode_chunking_invariant.
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=2e-4)


def test_empty_emissions_concatenate_with_data(codec):
    """Pre-lookahead pushes emit [B, 0, C] (not 2-D), so a caller can
    np.concatenate every per-push emission without filtering."""
    duplex = codec.streaming()
    audio = _audio(t=8 * HOP)
    outs = [np.asarray(duplex.push(audio[:, i:i + HOP]))
            for i in range(0, 8 * HOP, HOP)]  # hop-sized: first pushes empty
    assert outs[0].shape == (2, 0, 2)
    full = np.concatenate(outs, axis=1)  # must not raise
    assert full.shape[0] == 2 and full.shape[2] == 2

    dec = StreamingDecoder(codec)
    empty = np.asarray(dec.push_bytes(b""))
    assert empty.ndim == 3 and empty.shape[1] == 0


def test_flush_before_push_raises(codec):
    with pytest.raises(RuntimeError):
        StreamingEncoder(codec).flush()
    with pytest.raises(RuntimeError):
        StreamingDecoder(codec).flush()
