"""Data pipelines: MNIST fallbacks and the streaming audio stages."""

import numpy as np
import pytest

from meanflow_audio_codec_tpu.data.audio import (
    audio_to_frames,
    batch,
    buffer_shuffle,
    build_audio_pipeline,
    glob_audio_files,
    load_audio_file,
    prefetch_batches,
    replay_pool_batches,
    synthetic_audio_pipeline,
    write_wav,
)
from meanflow_audio_codec_tpu.data.mnist import (
    load_mnist,
    synthetic_mnist,
)


def test_load_mnist_contract():
    train_iter, test_iter = load_mnist(batch_size=16, seed=0)
    b1 = next(train_iter)
    b2 = next(train_iter)
    assert b1.shape == (16, 784) and b1.dtype == np.float32
    assert b1.min() >= -1.0 and b1.max() <= 1.0
    assert not np.array_equal(b1, b2)  # random sampling
    t = next(test_iter)
    assert t.shape == (16, 784)


def test_synthetic_mnist_deterministic():
    a, _ = synthetic_mnist(num_train=32, num_test=8, seed=5)
    b, _ = synthetic_mnist(num_train=32, num_test=8, seed=5)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (32, 28, 28) and a.dtype == np.uint8
    assert len(np.unique(a)) > 2  # not degenerate


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    audio = rng.uniform(-0.5, 0.5, size=(4410, 2)).astype(np.float32)
    path = tmp_path / "x.wav"
    write_wav(path, audio, sample_rate=44100)
    decoded = load_audio_file(path)
    assert decoded is not None and decoded.shape == (2, 4410)
    np.testing.assert_allclose(decoded.T, audio, atol=2.0 / 32768)


def test_wrong_sample_rate_dropped(tmp_path):
    write_wav(tmp_path / "x.wav", np.zeros((100, 2), np.float32),
              sample_rate=22050)
    with pytest.warns(UserWarning, match="sample rate"):
        assert load_audio_file(tmp_path / "x.wav") is None


def test_resample_preserves_tone(tmp_path):
    """48 kHz sine loads at 44.1 kHz with the tone frequency intact."""
    sr_in, f0 = 48000, 1000.0
    t = np.arange(sr_in) / sr_in
    tone = (0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    path = tmp_path / "x48.wav"
    write_wav(path, np.stack([tone, tone], axis=1), sample_rate=sr_in)
    decoded = load_audio_file(path, resample=True)
    assert decoded is not None
    n = decoded.shape[1]
    assert abs(n - 44100) <= 2  # 1 s at the target rate
    spectrum = np.abs(np.fft.rfft(decoded[0] * np.hanning(n)))
    peak_hz = np.argmax(spectrum) * 44100 / n
    assert abs(peak_hz - f0) < 5.0
    # amplitude survives the polyphase filter
    assert 0.4 < np.abs(decoded[0][1000:-1000]).max() < 0.6


def test_audio_pipeline_stages(tmp_path):
    rng = np.random.default_rng(1)
    for i in range(3):
        write_wav(tmp_path / f"f{i}.wav",
                  rng.uniform(-0.5, 0.5, (3000, 2)).astype(np.float32))
    files = glob_audio_files(tmp_path, seed=0)
    assert len(files) == 3

    pipeline = build_audio_pipeline(tmp_path, seed=0, frame_size=1024,
                                    prefetch=2, buffer_size=4, batch_size=2,
                                    loop=False)
    batches = list(pipeline)
    assert batches, "pipeline yielded nothing"
    assert batches[0].shape == (2, 1024, 2)
    assert batches[0].dtype == np.float32


def test_audio_to_frames_pads_and_offsets():
    stream = iter([np.ones((2, 2500), dtype=np.float32)])
    frames = list(audio_to_frames(stream, frame_size=1000, seed=3))
    assert all(f.shape == (1000, 2) for f in frames)
    assert len(frames) >= 3  # 2500 samples + offset -> >= 3 frames
    total = np.concatenate([f[:, 0] for f in frames])
    assert total.sum() == pytest.approx(2500)  # padding is zeros, data kept


def test_buffer_shuffle_preserves_items():
    items = [np.full((2,), i, dtype=np.float32) for i in range(20)]
    out = list(buffer_shuffle(iter(items), buffer_size=5, seed=0))
    assert len(out) == 20
    assert sorted(int(o[0]) for o in out) == list(range(20))
    assert [int(o[0]) for o in out] != list(range(20))  # actually shuffled


def test_batch_stage_drops_remainder():
    items = [np.zeros((4,), np.float32)] * 7
    out = list(batch(iter(items), batch_size=3))
    assert len(out) == 2 and out[0].shape == (3, 4)


def test_synthetic_audio_pipeline_shape():
    it = synthetic_audio_pipeline(seed=0, frame_size=2048, batch_size=3)
    frames = next(it)
    assert frames.shape == (3, 2048, 2)
    assert frames.dtype == np.float32
    assert np.abs(frames).max() <= 2.0


def test_synthetic_pipeline_sine_reduction_accuracy():
    """The floor-based sin argument reduction must match float64 sin."""
    rng = np.random.default_rng(1)
    cycles = rng.uniform(-3, 5000, size=20000).astype(np.float32)
    ref = np.sin(2 * np.pi * np.float64(cycles))
    two_pi = np.float32(2 * np.pi)
    got = np.sin(two_pi * (cycles - np.floor(cycles + np.float32(0.5))))
    assert np.abs(ref - got).max() < 1e-5


def test_synthetic_rich_family_shape_and_stats():
    from meanflow_audio_codec_tpu.data.audio import (
        synthetic_audio_pipeline_rich,
        synthetic_pipeline_for_family,
    )
    it = synthetic_audio_pipeline_rich(seed=0, frame_size=2048, batch_size=4)
    frames = next(it)
    assert frames.shape == (4, 2048, 2)
    assert frames.dtype == np.float32
    assert np.isfinite(frames).all()
    # peak-normalized into [0.25, 0.9]
    peaks = np.abs(frames).max(axis=(1, 2))
    assert (peaks <= 0.9 + 1e-4).all() and (peaks >= 0.25 - 1e-4).all()
    # deterministic per seed, distinct across seeds
    again = next(synthetic_audio_pipeline_rich(seed=0, frame_size=2048,
                                               batch_size=4))
    assert np.array_equal(frames, again)
    other = next(synthetic_audio_pipeline_rich(seed=1, frame_size=2048,
                                               batch_size=4))
    assert not np.array_equal(frames, other)
    # dispatcher: default is the tonal family; unknown names raise
    tonal = next(synthetic_pipeline_for_family(None, seed=0, frame_size=2048,
                                               batch_size=4))
    assert not np.array_equal(frames, tonal)
    rich = next(synthetic_pipeline_for_family("rich", seed=0, frame_size=2048,
                                              batch_size=4))
    assert np.array_equal(frames, rich)
    with pytest.raises(ValueError):
        synthetic_pipeline_for_family("nope")


def test_synthetic_mixed_family_interleaves_all_three():
    from meanflow_audio_codec_tpu.data.audio import (
        synthetic_audio_pipeline,
        synthetic_audio_pipeline_mixed,
        synthetic_audio_pipeline_rich,
        synthetic_audio_pipeline_speech,
        synthetic_pipeline_for_family,
    )
    kwargs = dict(frame_size=2048, batch_size=32)
    mixed = next(synthetic_audio_pipeline_mixed(seed=0, **kwargs))
    assert mixed.shape == (32, 2048, 2)
    assert mixed.dtype == np.float32
    # every row comes verbatim from one of the three source streams
    tonal = next(synthetic_audio_pipeline(seed=0, **kwargs))
    rich = next(synthetic_audio_pipeline_rich(seed=1, **kwargs))
    speech = next(synthetic_audio_pipeline_speech(seed=2, **kwargs))
    from_tonal = [np.array_equal(mixed[i], tonal[i]) for i in range(32)]
    from_rich = [np.array_equal(mixed[i], rich[i]) for i in range(32)]
    from_speech = [np.array_equal(mixed[i], speech[i]) for i in range(32)]
    assert all(t or r or s
               for t, r, s in zip(from_tonal, from_rich, from_speech))
    # and a 32-row batch at this seed actually carries all three families
    assert any(from_tonal) and any(from_rich) and any(from_speech)
    # deterministic per seed; reachable through the dispatcher
    again = next(synthetic_pipeline_for_family("mixed", seed=0, **kwargs))
    assert np.array_equal(mixed, again)


def test_synthetic_mixed2_family_is_the_historical_two_way_mix():
    """``mixed2`` preserves the round-2..4 tonal/rich 50/50 stream so
    pre-speech evaluation rows stay reproducible."""
    from meanflow_audio_codec_tpu.data.audio import (
        synthetic_audio_pipeline,
        synthetic_audio_pipeline_mixed2,
        synthetic_audio_pipeline_rich,
        synthetic_pipeline_for_family,
    )
    kwargs = dict(frame_size=2048, batch_size=16)
    mixed = next(synthetic_audio_pipeline_mixed2(seed=0, **kwargs))
    tonal = next(synthetic_audio_pipeline(seed=0, **kwargs))
    rich = next(synthetic_audio_pipeline_rich(seed=1, **kwargs))
    from_tonal = [np.array_equal(mixed[i], tonal[i]) for i in range(16)]
    from_rich = [np.array_equal(mixed[i], rich[i]) for i in range(16)]
    assert all(t or r for t, r in zip(from_tonal, from_rich))
    assert any(from_tonal) and any(from_rich)
    again = next(synthetic_pipeline_for_family("mixed2", seed=0, **kwargs))
    assert np.array_equal(mixed, again)


def test_synthetic_speech_family_basics():
    from meanflow_audio_codec_tpu.data.audio import (
        synthetic_audio_pipeline_speech,
    )
    frames = next(synthetic_audio_pipeline_speech(seed=0, frame_size=4096,
                                                  batch_size=4))
    assert frames.shape == (4, 4096, 2)
    assert frames.dtype == np.float32
    assert np.isfinite(frames).all()
    peaks = np.abs(frames).max(axis=(1, 2))
    assert (peaks <= 0.9 + 1e-4).all() and (peaks >= 0.25 - 1e-4).all()
    # deterministic per seed, distinct across seeds
    again = next(synthetic_audio_pipeline_speech(seed=0, frame_size=4096,
                                                 batch_size=4))
    assert np.array_equal(frames, again)
    other = next(synthetic_audio_pipeline_speech(seed=1, frame_size=4096,
                                                 batch_size=4))
    assert not np.array_equal(frames, other)


def test_synthetic_speech_family_has_speech_band_structure():
    """Speech clips concentrate energy below ~5 kHz (formant band-limit)
    and carry syllabic (2.5-6 Hz) amplitude modulation."""
    from meanflow_audio_codec_tpu.data.audio import (
        synthetic_audio_pipeline_speech,
    )
    sr = 44100
    frames = next(synthetic_audio_pipeline_speech(seed=7, frame_size=65536,
                                                  batch_size=4,
                                                  sample_rate=sr))
    mono = frames.mean(axis=-1)                                    # [B, T]
    spec = np.abs(np.fft.rfft(mono, axis=-1)) ** 2
    fbin = np.arange(spec.shape[-1]) * sr / mono.shape[-1]
    low = spec[:, fbin < 5000].sum(axis=-1)
    total = spec.sum(axis=-1) + 1e-12
    # formant synthesis band-limits harmonics at 5 kHz; only the
    # fricative noise lives above, and it is quiet
    assert (low / total > 0.80).all()
    # syllabic modulation: the Hilbert-free envelope (abs + lowpass via
    # frame RMS at 10 ms) has substantial variance relative to its mean
    frame = 441  # 10 ms
    n = (mono.shape[-1] // frame) * frame
    rms = np.sqrt((mono[:, :n].reshape(4, -1, frame) ** 2).mean(-1))
    crest = rms.max(axis=-1) / (rms.mean(axis=-1) + 1e-9)
    assert (crest > 1.8).all()


def test_stoi_is_meaningful_on_speech_family():
    """VERDICT r4 weak#5: STOI must discriminate on STOI-valid content.
    Clean speech scores ~1.0 and degrades monotonically with noise."""
    from meanflow_audio_codec_tpu.data.audio import (
        synthetic_audio_pipeline_speech,
    )
    from meanflow_audio_codec_tpu.evaluators.audio_metrics import stoi

    sr = 44100
    clip = next(synthetic_audio_pipeline_speech(
        seed=3, frame_size=sr * 2, batch_size=1, sample_rate=sr))[0]
    mono = clip.mean(axis=-1)
    rng = np.random.default_rng(0)
    noise = rng.standard_normal(mono.shape).astype(np.float32)
    noise *= np.std(mono) / np.std(noise)

    def at_snr(snr_db):
        return mono + noise * (10.0 ** (-snr_db / 20.0))

    clean = stoi(mono, mono, sample_rate=sr)
    assert clean > 0.97
    scores = [stoi(mono, at_snr(snr), sample_rate=sr)
              for snr in (20.0, 5.0, -5.0)]
    assert clean >= scores[0] >= scores[1] >= scores[2]
    # the range actually discriminates (not a degenerate flat metric)
    assert scores[0] - scores[2] > 0.15


def test_synthetic_rich_family_has_transient_structure():
    """Rich clips must contain onset structure tonal clips lack: at least
    one clip in a batch with a large short-window crest factor."""
    from meanflow_audio_codec_tpu.data.audio import (
        synthetic_audio_pipeline_rich,
    )
    frames = next(synthetic_audio_pipeline_rich(seed=3, frame_size=16384,
                                                batch_size=8))
    mono = frames.mean(axis=-1)                       # [B, T]
    win = mono.reshape(mono.shape[0], -1, 512)        # [B, W, 512]
    rms = np.sqrt(np.mean(np.square(win), axis=-1) + 1e-12)
    crest = rms.max(axis=-1) / (np.median(rms, axis=-1) + 1e-6)
    assert crest.max() > 3.0


def test_prefetch_batches_preserves_stream():
    src = [np.full((2, 4), i, np.float32) for i in range(7)]
    out = list(prefetch_batches(iter(src), depth=2))
    assert len(out) == 7
    for i, item in enumerate(out):
        assert np.array_equal(item, src[i])


def test_prefetch_batches_abandoned_consumer_stops_worker():
    it = prefetch_batches(iter([np.zeros((1,))] * 100), depth=1)
    next(it)
    it.close()  # must not hang or leak: producer rechecks the stop flag


def test_replay_pool_batches_shapes_and_content():
    def src():
        i = 0
        while True:
            yield np.full((4, 8), i, np.float32)
            i += 1

    it = replay_pool_batches(src(), pool_batches=3, seed=0, refresh=False)
    for _ in range(5):
        out = next(it)
        assert out.shape == (4, 8)
        # every row comes from one of the pooled batches (values 0, 1, 2)
        assert set(np.unique(out)).issubset({0.0, 1.0, 2.0})
    it.close()


def test_replay_pool_batches_refresh_introduces_new_data():
    def src():
        i = 0
        while True:
            yield np.full((2, 4), i, np.float32)
            i += 1

    it = replay_pool_batches(src(), pool_batches=2, seed=0, refresh=True)
    seen = set()
    for _ in range(200):
        seen.update(np.unique(next(it)).tolist())
    it.close()
    assert max(seen) >= 2.0  # a refreshed slot (value > initial fill) showed up


def test_missing_audio_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        build_audio_pipeline(tmp_path / "nope", batch_size=1)


def test_prefetch_batches_propagates_producer_error():
    """A stream that raises mid-run surfaces the error in the consumer
    instead of presenting as clean exhaustion."""
    def bad_stream():
        yield np.zeros((1,))
        raise OSError("corrupt file")

    it = prefetch_batches(bad_stream(), depth=2)
    next(it)
    with pytest.raises(RuntimeError, match="prefetch producer failed"):
        list(it)


def test_offrate_corpus_starvation_raises(tmp_path):
    """A looped corpus in which every file is dropped (off-rate, resample
    off) must raise instead of blocking forever (the pre-fix behavior:
    q.get() hangs on an empty queue while the worker spins)."""
    write_wav(tmp_path / "off.wav", np.zeros((1000, 2), np.float32),
              sample_rate=22050)
    stream = build_audio_pipeline(tmp_path, frame_size=256, batch_size=1,
                                  native=False)
    with pytest.warns(UserWarning, match="sample rate"):
        with pytest.raises(RuntimeError, match="resample"):
            next(stream)


def test_offrate_corpus_starvation_raises_sync(tmp_path):
    from meanflow_audio_codec_tpu.data.audio import load_audio_files
    write_wav(tmp_path / "off.wav", np.zeros((1000, 2), np.float32),
              sample_rate=22050)
    stream = load_audio_files([tmp_path / "off.wav"], prefetch=0)
    with pytest.warns(UserWarning, match="sample rate"):
        with pytest.raises(RuntimeError, match="resample"):
            next(stream)


def test_pipeline_resamples_offrate_corpus(tmp_path):
    """resample=True converts a 22.05 kHz corpus to 44.1 kHz frames in the
    Python tier (no reference counterpart: its loader dropped such files)."""
    sr = 22050
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    write_wav(tmp_path / "off.wav", np.stack([tone, tone], 1), sample_rate=sr)
    stream = build_audio_pipeline(tmp_path, frame_size=1024, batch_size=2,
                                  buffer_size=4, resample=True)
    batch_out = next(stream)
    assert batch_out.shape == (2, 1024, 2)
    assert float(np.abs(batch_out).max()) > 0.1
