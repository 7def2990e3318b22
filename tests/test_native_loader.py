"""Native C++ data-loader core: decode parity, threading, pipeline wiring."""

import numpy as np
import pytest

from meanflow_audio_codec_tpu.data.audio import (
    build_audio_pipeline,
    load_audio_file,
    write_wav,
)
from meanflow_audio_codec_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason=f"native loader unavailable: "
                                       f"{native.load_error()}")


@pytest.fixture()
def corpus(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(4):
        write_wav(tmp_path / f"f{i}.wav",
                  rng.uniform(-0.5, 0.5, (44100, 2)).astype(np.float32))
    return tmp_path


def _extended80(value: float) -> bytes:
    """IEEE 754 80-bit extended float (AIFF COMM sampleRate field)."""
    import math
    if value == 0:
        return b"\x00" * 10
    m, e = math.frexp(value)          # value = m * 2**e, 0.5 <= m < 1
    exponent = e + 16382
    mantissa = int(m * (1 << 64))
    return exponent.to_bytes(2, "big") + mantissa.to_bytes(8, "big")


def write_aiff(path, audio: np.ndarray, sample_rate: int = 44100,
               bits: int = 16, sowt: bool = False) -> None:
    """Minimal AIFF (or AIFC-sowt) writer for decoder tests."""
    import struct
    audio = np.asarray(audio, dtype=np.float32)
    frames, ch = audio.shape
    pcm = np.clip(audio, -1.0, 1.0)
    if bits == 16:
        ints = (pcm * 32767.0).astype("<i2" if sowt else ">i2")
        data = ints.tobytes()
    elif bits == 24:
        v = (pcm * 8388607.0).astype(np.int32).reshape(-1)
        raw = np.empty((v.size, 3), np.uint8)
        raw[:, 0] = (v >> 16) & 0xFF
        raw[:, 1] = (v >> 8) & 0xFF
        raw[:, 2] = v & 0xFF
        data = raw.tobytes()
    elif bits == 8:
        data = (pcm * 127.0).astype(np.int8).tobytes()
    else:
        raise ValueError(bits)
    comm = (struct.pack(">hIh", ch, frames, bits) + _extended80(sample_rate))
    form_type = b"AIFF"
    if sowt:
        form_type = b"AIFC"
        comm += b"sowt" + b"\x00\x00"      # compressionType + empty pstring
    ssnd = struct.pack(">II", 0, 0) + data
    chunks = b""
    if sowt:
        chunks += b"FVER" + struct.pack(">I", 4) + struct.pack(">I", 0xA2805140)
    for cid, body in ((b"COMM", comm), (b"SSND", ssnd)):
        chunks += cid + struct.pack(">I", len(body)) + body
        if len(body) & 1:
            chunks += b"\x00"
    with open(path, "wb") as f:
        f.write(b"FORM" + struct.pack(">I", 4 + len(chunks)) + form_type
                + chunks)


def test_native_decode_aiff_matches_wav(tmp_path):
    rng = np.random.default_rng(2)
    audio = rng.uniform(-0.5, 0.5, (4096, 2)).astype(np.float32)
    write_wav(tmp_path / "a.wav", audio)
    write_aiff(tmp_path / "a.aiff", audio)
    wav_dec = native.decode_audio_native(tmp_path / "a.wav")
    aiff_dec = native.decode_audio_native(tmp_path / "a.aiff")
    assert wav_dec is not None and aiff_dec is not None
    np.testing.assert_array_equal(wav_dec[0], aiff_dec[0])
    assert wav_dec[1] == aiff_dec[1] == 44100


def test_native_decode_aifc_sowt_and_24bit(tmp_path):
    rng = np.random.default_rng(3)
    audio = rng.uniform(-0.5, 0.5, (2048, 2)).astype(np.float32)
    write_aiff(tmp_path / "be.aiff", audio, bits=16)
    write_aiff(tmp_path / "le.aifc", audio, bits=16, sowt=True)
    write_aiff(tmp_path / "deep.aiff", audio, bits=24)
    be = native.decode_audio_native(tmp_path / "be.aiff")
    le = native.decode_audio_native(tmp_path / "le.aifc")
    deep = native.decode_audio_native(tmp_path / "deep.aiff")
    assert be is not None and le is not None and deep is not None
    np.testing.assert_array_equal(be[0], le[0])  # endianness-exact
    np.testing.assert_allclose(deep[0], audio.T, atol=2.0 / 8388608)


def test_python_tier_decodes_aiff(tmp_path):
    rng = np.random.default_rng(4)
    audio = rng.uniform(-0.5, 0.5, (4096, 2)).astype(np.float32)
    write_aiff(tmp_path / "x.aiff", audio)
    decoded = load_audio_file(tmp_path / "x.aiff")
    assert decoded is not None and decoded.shape[0] == 2
    np.testing.assert_allclose(decoded, audio.T, atol=2.0 / 32768)


def test_native_loader_mixed_containers(tmp_path):
    rng = np.random.default_rng(5)
    for i in range(2):
        write_wav(tmp_path / f"w{i}.wav",
                  rng.uniform(-0.5, 0.5, (44100, 2)).astype(np.float32))
        write_aiff(tmp_path / f"a{i}.aiff",
                   rng.uniform(-0.5, 0.5, (44100, 2)).astype(np.float32))
    files = sorted(tmp_path.glob("*.wav")) + sorted(tmp_path.glob("*.aiff"))
    loader = native.NativeAudioLoader(files, frame_size=16384, batch_size=4,
                                      loop=False, n_threads=2, seed=0)
    batches = list(loader)
    assert len(batches) >= 2
    assert loader.files_skipped == 0
    loader.close()


def test_native_decode_matches_python(corpus):
    path = sorted(corpus.glob("*.wav"))[0]
    decoded = native.decode_wav_native(path)
    assert decoded is not None
    audio, rate = decoded
    assert rate == 44100
    py = load_audio_file(path)
    np.testing.assert_array_equal(audio, py)


def test_native_loader_batches(corpus):
    loader = native.NativeAudioLoader(sorted(corpus.glob("*.wav")),
                                      frame_size=16384, batch_size=8,
                                      buffer_frames=32, n_threads=2, seed=0)
    b1 = next(loader)
    b2 = next(loader)
    assert b1.shape == (8, 16384, 2) and b1.dtype == np.float32
    assert not np.array_equal(b1, b2)
    assert np.abs(b1).mean() > 0.01  # real audio content, not zeros
    assert loader.frames_produced >= 16
    assert loader.files_skipped == 0
    loader.close()


def test_native_loader_one_pass_terminates(corpus):
    loader = native.NativeAudioLoader(sorted(corpus.glob("*.wav")),
                                      frame_size=16384, batch_size=4,
                                      loop=False, n_threads=1, seed=1)
    batches = list(loader)
    # 4 files x ~3 frames each (44100 + offset over 16384) ~= 12 frames
    assert 2 <= len(batches) <= 4
    loader.close()


def test_native_loader_skips_wrong_rate(tmp_path):
    write_wav(tmp_path / "bad.wav", np.zeros((1000, 2), np.float32),
              sample_rate=22050)
    rng = np.random.default_rng(1)
    write_wav(tmp_path / "good.wav",
              rng.uniform(-0.5, 0.5, (44100, 2)).astype(np.float32))
    loader = native.NativeAudioLoader(sorted(tmp_path.glob("*.wav")),
                                      frame_size=16384, batch_size=2,
                                      n_threads=1, seed=0)
    next(loader)
    # loop mode cycles the file list; poll until the bad file is reached
    import time
    deadline = time.monotonic() + 10.0
    while loader.files_skipped < 1 and time.monotonic() < deadline:
        next(loader)
    assert loader.files_skipped >= 1
    loader.close()


def test_pipeline_auto_selects_native(corpus):
    pipeline = build_audio_pipeline(corpus, frame_size=8192, batch_size=4)
    assert isinstance(pipeline, type(iter(pipeline)))
    batch = next(pipeline)
    assert batch.shape == (4, 8192, 2)
    # explicit opt-out still works
    py_pipeline = build_audio_pipeline(corpus, frame_size=8192, batch_size=4,
                                       native=False, loop=False)
    batch_py = next(py_pipeline)
    assert batch_py.shape == (4, 8192, 2)


def test_one_pass_multithreaded_delivers_all_frames(corpus):
    """One-pass mode with several producers must not terminate early when
    the first thread finishes its share (exhaustion = ALL producers done).
    batch_size=1 so no frames are dropped in a final partial batch."""
    files = sorted(corpus.glob("*.wav"))
    delivered = 0
    loader = native.NativeAudioLoader(files, frame_size=16384, batch_size=1,
                                      buffer_frames=64, n_threads=3,
                                      loop=False, seed=3)
    for _ in loader:
        delivered += 1
    # 4 files x ceil((offset + 44100)/16384) in {3, 4} frames each
    assert delivered == loader.frames_produced
    assert delivered >= 12
    loader.close()


def test_malformed_wav_rejected_not_crash(tmp_path):
    """Truncated fmt chunks, invalid bit depths and hostile size fields must
    be rejected cleanly (no SIGFPE / OOB read / giant allocation)."""
    import struct

    def riff(body: bytes) -> bytes:
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    cases = {
        # fmt chunk only 12 bytes: bits field would be read out of bounds
        "short_fmt.wav": riff(
            b"fmt " + struct.pack("<I", 12) + b"\x01\x00\x02\x00" +
            struct.pack("<I", 44100) + struct.pack("<I", 176400) +
            b"data" + struct.pack("<I", 4) + b"\x00" * 4),
        # bits_per_sample = 0: divide-by-zero without validation
        "zero_bits.wav": riff(
            b"fmt " + struct.pack("<I", 16) + b"\x01\x00\x02\x00" +
            struct.pack("<I", 44100) + struct.pack("<I", 0) +
            b"\x04\x00\x00\x00" +
            b"data" + struct.pack("<I", 4) + b"\x00" * 4),
        # data chunk claims 3 GiB: must be capped, not allocated
        "huge_data.wav": riff(
            b"fmt " + struct.pack("<I", 16) + b"\x01\x00\x02\x00" +
            struct.pack("<I", 44100) + struct.pack("<I", 176400) +
            b"\x04\x00\x10\x00" +
            b"data" + struct.pack("<I", 3 << 30) + b"\x00" * 16),
        "truncated.wav": b"RIFF\x08\x00\x00\x00WAVE",
    }
    for name, payload in cases.items():
        (tmp_path / name).write_bytes(payload)
        assert native.decode_wav_native(tmp_path / name) is None, name

    # the loader skips them and still serves the one good file
    rng = np.random.default_rng(5)
    write_wav(tmp_path / "good.wav",
              rng.uniform(-0.5, 0.5, (44100, 2)).astype(np.float32))
    loader = native.NativeAudioLoader(sorted(tmp_path.glob("*.wav")),
                                      frame_size=16384, batch_size=2,
                                      n_threads=2, seed=0)
    batch = next(loader)
    assert batch.shape == (2, 16384, 2)
    assert loader.files_skipped >= len(cases)
    loader.close()
