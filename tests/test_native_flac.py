"""Native FLAC decoder round-trip tests (native/dataloader.cpp decode_flac).

FLAC is lossless, so every test asserts *exact* recovery of the integer
samples through the full encode (data/flac_write.py, a spec-exact
minimal encoder) -> native decode path. Covers each subframe type the
decoder implements, Rice partitions and escapes, wasted bits, all stereo
decorrelation modes, multi-frame streams, non-16-bit depths, CRC
rejection, and the loader/pipeline integration tiers.
"""

from __future__ import annotations

import numpy as np
import pytest

from meanflow_audio_codec_tpu.data import native
from meanflow_audio_codec_tpu.data.flac_write import (write_flac,
                                                      write_flac_pcm16)

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native loader unavailable: {native.load_error()}")


def _roundtrip(tmp_path, audio, bits=16, **kw):
    path = tmp_path / "t.flac"
    write_flac(path, audio, sample_rate=44100, bits=bits, **kw)
    decoded = native.decode_audio_native(path)
    assert decoded is not None, "native decode failed"
    samples, rate = decoded
    assert rate == 44100
    audio = np.atleast_2d(audio)
    assert samples.shape == audio.shape
    ints = np.round(samples * (1 << (bits - 1))).astype(np.int64)
    np.testing.assert_array_equal(ints, audio)
    return path


def _walk(rng, channels, n, lim=12000):
    steps = rng.integers(-500, 501, size=(channels, n))
    return np.clip(np.cumsum(steps, axis=1), -lim, lim).astype(np.int64)


def test_constant_subframe(tmp_path):
    audio = np.full((1, 512), -321, dtype=np.int64)
    _roundtrip(tmp_path, audio, mode="constant")


def test_verbatim_mono(tmp_path):
    rng = np.random.default_rng(0)
    audio = rng.integers(-32768, 32768, size=(1, 777), dtype=np.int64)
    _roundtrip(tmp_path, audio, mode="verbatim")


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_orders(tmp_path, order):
    rng = np.random.default_rng(order)
    audio = _walk(rng, 1, 600)
    _roundtrip(tmp_path, audio, mode=f"fixed{order}")


def test_lpc_subframe(tmp_path):
    rng = np.random.default_rng(7)
    audio = _walk(rng, 1, 1024)
    # Second-order low-pass-ish predictor: s[i] ~ (3*s[i-1] - s[i-2]) / 2.
    _roundtrip(tmp_path, audio, mode="lpc", lpc=([3, -1], 1, 4))


def test_lpc_high_order_high_precision(tmp_path):
    rng = np.random.default_rng(8)
    audio = _walk(rng, 1, 2048)
    coefs = [1205, -310, 44, 12, -9, 3, 1, -2]  # arbitrary, 12-bit, shift 10
    _roundtrip(tmp_path, audio, mode="lpc", lpc=(coefs, 10, 12))


def test_rice_partitions(tmp_path):
    rng = np.random.default_rng(3)
    audio = _walk(rng, 1, 1024)
    _roundtrip(tmp_path, audio, mode="fixed2", partition_order=3)


def test_rice_escape_raw_bits(tmp_path):
    rng = np.random.default_rng(4)
    audio = _walk(rng, 1, 256)
    _roundtrip(tmp_path, audio, mode="fixed1", escape=True)


def test_wasted_bits(tmp_path):
    rng = np.random.default_rng(5)
    audio = _walk(rng, 1, 512, lim=4000) << 3  # multiples of 8: 3 wasted bits
    _roundtrip(tmp_path, audio, mode="fixed1", wasted=3)


@pytest.mark.parametrize("stereo", ["independent", "left_side",
                                    "right_side", "mid_side"])
def test_stereo_modes(tmp_path, stereo):
    rng = np.random.default_rng(6)
    audio = _walk(rng, 2, 800)
    _roundtrip(tmp_path, audio, mode="fixed2", stereo=stereo)


def test_multi_frame_with_partial_tail(tmp_path):
    rng = np.random.default_rng(9)
    audio = _walk(rng, 2, 3000)  # 3000 = 2 full 1024-frames + 952 tail
    _roundtrip(tmp_path, audio, mode="fixed1", blocksize=1024,
               stereo="mid_side")


@pytest.mark.parametrize("bits", [8, 24])
def test_bit_depths(tmp_path, bits):
    rng = np.random.default_rng(bits)
    lim = 1 << (bits - 1)
    audio = rng.integers(-lim, lim, size=(1, 400), dtype=np.int64)
    _roundtrip(tmp_path, audio, bits=bits, mode="verbatim")


def test_corrupt_crc16_rejected(tmp_path):
    rng = np.random.default_rng(10)
    audio = _walk(rng, 1, 512)
    path = tmp_path / "bad.flac"
    write_flac(path, audio, bits=16, mode="fixed1", corrupt_crc16=True)
    assert native.decode_audio_native(path) is None


def test_truncated_file_rejected(tmp_path):
    rng = np.random.default_rng(11)
    audio = _walk(rng, 1, 512)
    path = tmp_path / "trunc.flac"
    write_flac(path, audio, bits=16, mode="fixed1")
    data = path.read_bytes()
    path.write_bytes(data[:len(data) - 7])
    assert native.decode_audio_native(path) is None


def test_loader_over_flac_corpus(tmp_path):
    """NativeAudioLoader end-to-end over a directory of FLAC files."""
    rng = np.random.default_rng(12)
    files = []
    for i in range(3):
        path = tmp_path / f"clip{i}.flac"
        audio = _walk(rng, 2, 2048)
        write_flac(path, audio, sample_rate=44100, bits=16, mode="fixed2",
                   stereo="mid_side", blocksize=1024)
        files.append(path)
    loader = native.NativeAudioLoader(files, frame_size=512, channels=2,
                                      batch_size=4, n_threads=2, seed=0)
    batch = next(loader)
    assert batch.shape == (4, 512, 2)
    assert np.isfinite(batch).all()
    assert loader.files_skipped == 0
    loader.close()


def test_write_flac_pcm16_roundtrip(tmp_path):
    """Float-audio corpus writer: exact int16 recovery through decode."""
    rng = np.random.default_rng(14)
    t = np.arange(8192) / 44100.0
    audio = (np.stack([np.sin(2 * np.pi * 440 * t),
                       np.sin(2 * np.pi * 660 * t)], axis=1) * 0.5
             + rng.normal(0, 0.01, (8192, 2))).astype(np.float32)
    path = tmp_path / "p.flac"
    write_flac_pcm16(path, audio, 44100)
    decoded = native.decode_audio_native(path)
    assert decoded is not None
    samples, rate = decoded  # (C, T)
    assert rate == 44100
    expect = (np.clip(audio, -1.0, 1.0) * 32767.0).astype(np.int64).T
    got = np.round(samples * 32768).astype(np.int64)
    np.testing.assert_array_equal(got, expect)


def test_pipeline_routes_flac_natively(tmp_path):
    """build_audio_pipeline picks the native loader for a FLAC corpus."""
    from meanflow_audio_codec_tpu.data.audio import (build_audio_pipeline,
                                                     load_audio_file)
    rng = np.random.default_rng(13)
    for i in range(2):
        audio = _walk(rng, 2, 4096)
        write_flac(tmp_path / f"c{i}.flac", audio, sample_rate=44100,
                   bits=16, mode="fixed1")
    # Single-file Python-tier decode also goes through the native core.
    single = load_audio_file(tmp_path / "c0.flac")
    assert single is not None and single.shape[0] == 2
    pipe = build_audio_pipeline(tmp_path, seed=0, frame_size=1024,
                                batch_size=2, buffer_size=8)
    batch = next(iter(pipe))
    assert batch.shape == (2, 1024, 2)


def test_fuzz_mutated_flac_never_crashes(tmp_path):
    """Single-byte mutations and truncations of a valid stream must decode
    to either a clean result or a clean failure — never a crash (the
    decoder does raw-pointer bitstream work; this guards its arithmetic).
    Frame bodies are CRC-16-protected so most mutations must be rejected;
    STREAMINFO is not CRC'd, so a changed header may still decode."""
    rng = np.random.default_rng(99)
    t = np.arange(4096 * 3) / 44100.0
    audio = np.stack([np.sin(2 * np.pi * 330 * t),
                      np.sin(2 * np.pi * 550 * t)], axis=1) * 0.7
    path = tmp_path / "base.flac"
    write_flac_pcm16(path, audio.astype(np.float32), 44100)
    data = bytearray(path.read_bytes())

    mutated = tmp_path / "mut.flac"
    for trial in range(300):
        buf = bytearray(data)
        pos = int(rng.integers(0, len(buf)))
        buf[pos] ^= int(rng.integers(1, 256))
        mutated.write_bytes(bytes(buf))
        native.decode_audio_native(mutated)  # must simply not crash

    for trial in range(60):
        cut = int(rng.integers(0, len(data)))
        mutated.write_bytes(bytes(data[:cut]))
        native.decode_audio_native(mutated)

    # Sanity: the unmutated file still round-trips.
    decoded = native.decode_audio_native(path)
    assert decoded is not None and decoded[1] == 44100
