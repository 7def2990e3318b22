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
