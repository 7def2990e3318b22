"""MP3 decode path: header parsing + the platform-codec backend.

The reference decodes MP3 via minimp3py (reference datasets/audio.py:93-132),
which is not installed in this image. The repo's fallback decodes through the
platform codec (SDL_mixer via pygame, baked into the image), after parsing
the MPEG frame header natively so the mixer is initialized at the file's own
sample rate (no hidden resample). These tests exercise the header parser on
constructed bitstreams and the full decode on a real MP3 shipped inside the
image (pygame's example asset).
"""

from __future__ import annotations

import shutil
from pathlib import Path

import numpy as np
import pytest

from meanflow_audio_codec_tpu.data.audio import (_decode_mp3,
                                                 glob_audio_files,
                                                 load_audio_file,
                                                 mp3_stream_info)

REAL_MP3 = Path("/opt/venv/lib/python3.12/site-packages/pygame/examples/"
                "data/house_lo.mp3")


def _pygame_available() -> bool:
    try:
        import os
        os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
        import pygame.mixer  # noqa: F401
        return True
    except Exception:
        return False


def _frame(version_bits: int, bitrate_idx: int, rate_idx: int,
           mode_bits: int, length: int) -> bytes:
    """One syntactically valid Layer III frame (zero payload)."""
    b1 = 0xE0 | (version_bits << 3) | (1 << 1) | 1  # sync tail, layer III
    b2 = (bitrate_idx << 4) | (rate_idx << 2)
    b3 = mode_bits << 6
    return bytes([0xFF, b1, b2, b3]) + b"\x00" * (length - 4)


# MPEG-1 Layer III, 128 kbps, 44.1 kHz, stereo: 144*128000/44100 = 417 bytes.
FRAME_44100 = _frame(3, 9, 0, 0, 417)
# MPEG-1 Layer III, 128 kbps, 48 kHz, mono: 144*128000/48000 = 384 bytes.
FRAME_48000_MONO = _frame(3, 9, 1, 3, 384)


def test_stream_info_two_frame_verification(tmp_path):
    path = tmp_path / "a.mp3"
    path.write_bytes(FRAME_44100 * 3)
    assert mp3_stream_info(path) == (44100, 2)


def test_stream_info_mono_and_rate(tmp_path):
    path = tmp_path / "b.mp3"
    path.write_bytes(FRAME_48000_MONO * 2)
    assert mp3_stream_info(path) == (48000, 1)


def test_stream_info_skips_id3v2(tmp_path):
    tag_body = b"\xff" * 100  # adversarial: tag full of sync-ish bytes
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 100]) + tag_body
    path = tmp_path / "c.mp3"
    path.write_bytes(id3 + FRAME_44100 * 2)
    assert mp3_stream_info(path) == (44100, 2)


def test_stream_info_rejects_false_sync(tmp_path):
    # A header-shaped byte run whose computed frame length does NOT land
    # on another sync word must be skipped; the real stream follows.
    spurious = _frame(3, 9, 2, 0, 4)  # claims 32 kHz; only 4 bytes present
    path = tmp_path / "d.mp3"
    path.write_bytes(b"\x01\x02" + spurious + b"\x00" * 600
                     + FRAME_48000_MONO * 2)
    assert mp3_stream_info(path) == (48000, 1)


def test_stream_info_garbage_returns_none(tmp_path):
    path = tmp_path / "e.mp3"
    path.write_bytes(b"\x00\x01\x02\x03" * 100)
    assert mp3_stream_info(path) is None


@pytest.mark.skipif(not REAL_MP3.exists(), reason="in-image MP3 asset absent")
def test_real_mp3_header():
    # house_lo.mp3 is MPEG-2.5, 11025 Hz, mono.
    assert mp3_stream_info(REAL_MP3) == (11025, 1)


@pytest.mark.skipif(not (REAL_MP3.exists() and _pygame_available()),
                    reason="needs in-image MP3 + pygame")
def test_real_mp3_decodes_nonsilent():
    decoded = _decode_mp3(REAL_MP3)
    assert decoded is not None
    audio, rate = decoded
    assert rate == 11025
    assert audio.shape[0] == 1  # mono, (C, T)
    assert audio.dtype == np.float32
    duration = audio.shape[1] / rate
    assert 7.0 < duration < 7.5  # known asset length ~7.26 s
    rms = float(np.sqrt(np.mean(audio ** 2)))
    assert rms > 0.05  # real music content, not silence


@pytest.mark.skipif(not (REAL_MP3.exists() and _pygame_available()),
                    reason="needs in-image MP3 + pygame")
def test_real_mp3_through_loader_resampled(tmp_path):
    # Full product path: glob -> decode -> mono duplication -> polyphase
    # resample to the 44.1 kHz training rate.
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    shutil.copy(REAL_MP3, corpus / "clip.mp3")
    files = glob_audio_files(corpus)
    assert [f.suffix for f in files] == [".mp3"]
    audio = load_audio_file(files[0], resample=True)
    assert audio is not None
    assert audio.shape[0] == 2  # stereo duplication
    assert abs(audio.shape[1] / 44100 - 7.26) < 0.1
    np.testing.assert_allclose(audio[0], audio[1])  # duplicated channels


@pytest.mark.skipif(not (REAL_MP3.exists() and _pygame_available()),
                    reason="needs in-image MP3 + pygame")
def test_pipeline_over_mp3_corpus(tmp_path):
    """Full training-input path over an MP3 corpus: glob -> SDL decode ->
    resample -> framing -> shuffle -> batch."""
    from meanflow_audio_codec_tpu.data.audio import build_audio_pipeline
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    for i in range(2):
        shutil.copy(REAL_MP3, corpus / f"clip{i}.mp3")
    stream = build_audio_pipeline(corpus, frame_size=4096, batch_size=2,
                                  buffer_size=4, resample=True)
    batch_out = next(stream)
    assert batch_out.shape == (2, 4096, 2)
    assert float(np.sqrt((batch_out ** 2).mean())) > 0.01
