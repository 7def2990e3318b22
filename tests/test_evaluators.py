"""Evaluator metrics: property-based sanity checks + evaluator end-to-end."""

import numpy as np
import pytest

from meanflow_audio_codec_tpu.evaluators import (
    aggregate,
    batch_psnr,
    batch_ssim,
    frechet_distance,
    inference_time,
    kernel_inception_distance,
    psnr,
    si_snr,
    spectral_distance,
    ssim,
    stoi,
)
from meanflow_audio_codec_tpu.evaluators.audio_metrics import (
    log_mel_spectrogram,
    mel_filterbank,
)


# ---- image metrics ------------------------------------------------------------

def test_frechet_distance_properties():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((200, 8))
    b = rng.standard_normal((200, 8)) + 3.0  # shifted distribution
    same = frechet_distance(a, a)
    far = frechet_distance(a, b)
    assert same == pytest.approx(0.0, abs=1e-6)
    assert far > 8.0 * 3.0  # ~ ||mu diff||^2 = 8 * 9


def test_kid_properties():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((150, 16))
    b = rng.standard_normal((150, 16)) * 2.0
    near = kernel_inception_distance(a, a, num_subsets=4, subset_size=50)
    far = kernel_inception_distance(a, b, num_subsets=4, subset_size=50)
    assert abs(near) < 0.5
    assert far > near
    with pytest.raises(ValueError):
        kernel_inception_distance(a[:1], b[:1])


def test_psnr_and_ssim():
    rng = np.random.default_rng(2)
    img = rng.uniform(-1, 1, (28, 28))
    assert psnr(img, img) == float("inf")
    assert ssim(img, img) == pytest.approx(1.0, abs=1e-6)
    noisy = img + rng.normal(0, 0.1, img.shape)
    p = psnr(img, noisy)
    assert 15 < p < 35
    s = ssim(img, noisy)
    assert 0 < s < 1
    worse = img + rng.normal(0, 0.5, img.shape)
    assert psnr(img, worse) < p
    assert ssim(img, worse) < s
    with pytest.raises(ValueError):
        ssim(img, img[:14])


def test_batch_metrics():
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 1, (4, 28, 28))
    b = a + rng.normal(0, 0.05, a.shape)
    assert batch_psnr(a, b) > 20
    assert 0 < batch_ssim(a, b) <= 1


# ---- audio metrics ------------------------------------------------------------

def _tone(freq, seconds=1.0, rate=44100):
    t = np.arange(int(seconds * rate)) / rate
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def test_si_snr():
    x = _tone(440)
    assert si_snr(x, x) > 60  # identical -> huge SNR
    assert si_snr(x, 0.5 * x) > 60  # scale-invariant
    noisy = x + np.random.default_rng(0).normal(0, 0.1, x.shape)
    mid = si_snr(x, noisy)
    assert 5 < mid < 30
    assert si_snr(x, np.random.default_rng(1).normal(0, 1, x.shape)) < 0


def test_spectral_distance_domains():
    x = _tone(440)
    y = _tone(880)
    for domain in ("mdct", "logmel"):
        same = spectral_distance(x, x, domain=domain)
        diff = spectral_distance(x, y, domain=domain)
        assert same == pytest.approx(0.0, abs=1e-5)
        assert diff > same
    with pytest.raises(ValueError):
        spectral_distance(x, y, domain="cepstrum")


def test_mel_filterbank_shape_and_coverage():
    bank = mel_filterbank(64, 1024, 44100)
    assert bank.shape == (64, 513)
    assert (bank >= 0).all()
    assert bank.sum(axis=1).min() > 0  # every band covers some bins
    spec = log_mel_spectrogram(_tone(440, 0.5))
    assert spec.shape[1] == 64 and np.isfinite(spec).all()


def test_stoi_orders_quality():
    rng = np.random.default_rng(4)
    # speech-ish: amplitude-modulated multi-tone
    t = np.arange(44100) / 44100
    clean = (np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 4 * t))
             + 0.3 * np.sin(2 * np.pi * 800 * t)).astype(np.float32)
    perfect = stoi(clean, clean)
    noisy = stoi(clean, clean + rng.normal(0, 0.3, clean.shape))
    garbage = stoi(clean, rng.normal(0, 1, clean.shape))
    assert perfect == pytest.approx(1.0, abs=1e-3)
    assert perfect > noisy > garbage
    with pytest.raises(ValueError):
        stoi(clean[:1000], clean[:1000])  # too short


def test_stoi_matches_independent_oracle():
    """Absolute-scale cross-validation: the package STOI and an
    independently written implementation of Taal 2011 (tests/stoi_oracle,
    MATLAB-window + vectorized segments) must agree across the quality
    range — the strongest published-scale evidence available without the
    egress-blocked pystoi package."""
    from stoi_oracle import stoi_oracle

    rng = np.random.default_rng(7)
    t = np.arange(2 * 44100) / 44100
    # Broadband speech proxy: 1/f-shaped noise under a syllabic 4 Hz
    # envelope. STOI needs energy in all 15 one-third-octave bands —
    # sparse tonal signals leave noise-only bands whose zero correlation
    # pins the score low regardless of fidelity (a property of the
    # published metric, not a bug; documented in results.md).
    spectrum = np.fft.rfft(rng.standard_normal(len(t)))
    freqs = np.fft.rfftfreq(len(t), 1 / 44100)
    spectrum *= 1.0 / np.sqrt(np.maximum(freqs, 50.0))
    clean = np.fft.irfft(spectrum, len(t))
    clean = (clean / clean.std()
             * (0.55 + 0.45 * np.sin(2 * np.pi * 4 * t))).astype(np.float64)
    conditions = {
        "clean": clean,
        "snr20": clean + 10 ** (-20 / 20) * clean.std()
        * rng.standard_normal(clean.shape),
        "snr10": clean + 10 ** (-10 / 20) * clean.std()
        * rng.standard_normal(clean.shape),
        "snr0": clean + clean.std() * rng.standard_normal(clean.shape),
        "snr-5": clean + 10 ** (5 / 20) * clean.std()
        * rng.standard_normal(clean.shape),
        "lowpassed": np.convolve(clean, np.ones(32) / 32, mode="same"),
    }
    ours, oracle, ours_e = {}, {}, {}
    for name, deg in conditions.items():
        ours[name] = stoi(clean, deg)
        oracle[name] = stoi_oracle(clean, deg, 44100)
        assert ours[name] == pytest.approx(oracle[name], abs=0.02), name
        ours_e[name] = stoi(clean, deg, extended=True)
        oracle_e = stoi_oracle(clean, deg, 44100, extended=True)
        assert ours_e[name] == pytest.approx(oracle_e, abs=0.02), name
    # same quality ordering end to end; eSTOI must order the SNR ladder
    # monotonically (its lowpass ranking may differ from classic STOI's)
    order = sorted(ours, key=ours.get)
    assert order == sorted(oracle, key=oracle.get)
    assert (ours_e["snr-5"] < ours_e["snr0"] < ours_e["snr10"]
            < ours_e["snr20"] < ours_e["clean"])
    # the degraded range actually spans the scale (not all ~1.0)
    assert ours["snr-5"] < 0.85 < ours["snr20"]
    assert ours_e["snr-5"] < 0.85 < ours_e["snr20"]


# ---- performance + analysis ---------------------------------------------------

def test_inference_time_stats():
    import jax.numpy as jnp
    import jax
    fn = jax.jit(lambda x: x * 2.0)
    stats = inference_time(fn, jnp.ones((8, 8)), warmup=1, runs=5)
    assert stats["mean_sec"] > 0 and stats["runs"] == 5
    assert stats["min_sec"] <= stats["p50_sec"] <= stats["max_sec"]


def test_aggregate_confidence_intervals():
    rows = [{"nfe": 1.0, "method": "imf", "mse": 1.0},
            {"nfe": 1.0, "method": "imf", "mse": 3.0},
            {"nfe": 10.0, "method": "imf", "mse": 0.5}]
    summary = aggregate(rows, ("nfe", "method"), ("mse",))
    assert len(summary) == 2
    first = [s for s in summary if s["nfe"] == 1.0][0]
    assert first["mse_mean"] == pytest.approx(2.0)
    assert first["mse_ci95"] > 0
    assert first["n"] == 2


def test_comprehensive_evaluator_end_to_end(tmp_path):
    """Train 3 steps, checkpoint, evaluate the NFE sweep on synthetic MNIST."""
    from pathlib import Path
    from meanflow_audio_codec_tpu.configs import (
        BaseConfig, DatasetConfig, MethodConfig, ModelConfig,
        TrainFlowConfig, TrainingConfig)
    from meanflow_audio_codec_tpu.training.trainer import train_flow
    from meanflow_audio_codec_tpu.evaluators import ComprehensiveEvaluator
    from meanflow_audio_codec_tpu.training.checkpoints import (
        find_latest_checkpoint)
    from meanflow_audio_codec_tpu.data.mnist import load_mnist

    config = TrainFlowConfig(
        base=BaseConfig(batch_size=4, n_steps=2, base_lr=1e-3,
                        weight_decay=0.0, seed=0),
        model=ModelConfig(noise_dimension=784, condition_dimension=8,
                          latent_dimension=4, num_blocks=1),
        dataset=DatasetConfig(dataset="mnist",
                              tokenization_strategy="reshape"),
        method=MethodConfig(method="improved_mean_flow",
                            use_improved_mean_flow=True),
        training=TrainingConfig(sample_every=2, sample_seed=0, sample_steps=1,
                                workdir=tmp_path / "run"),
    )
    train_flow(config)
    checkpoint = find_latest_checkpoint(tmp_path / "run" / "checkpoints")
    assert checkpoint is not None

    evaluator = ComprehensiveEvaluator(checkpoint, config, nfe_list=[1, 2],
                                       num_samples=8, batch_size=8)
    _, test_iter = load_mnist(batch_size=8)
    results = evaluator.evaluate(next(test_iter))
    assert set(results["nfe_sweep"]) == {"1", "2"}
    entry = results["nfe_sweep"]["1"]
    assert "psnr_db" in entry and "ssim" in entry and "mse" in entry
    assert entry["inference"]["mean_sec"] > 0
    out = tmp_path / "results.json"
    evaluator.save_results(results, out)
    assert out.exists()


def test_comprehensive_evaluator_latent_bits(tmp_path):
    """latent_bits routes decode through the quantized stored format."""
    from meanflow_audio_codec_tpu.configs import (
        BaseConfig, DatasetConfig, MethodConfig, ModelConfig,
        TrainFlowConfig, TrainingConfig)
    from meanflow_audio_codec_tpu.training.trainer import train_flow
    from meanflow_audio_codec_tpu.evaluators import ComprehensiveEvaluator
    from meanflow_audio_codec_tpu.training.checkpoints import (
        find_latest_checkpoint)
    from meanflow_audio_codec_tpu.data.mnist import load_mnist

    config = TrainFlowConfig(
        base=BaseConfig(batch_size=4, n_steps=2, base_lr=1e-3,
                        weight_decay=0.0, seed=0),
        model=ModelConfig(noise_dimension=784, condition_dimension=8,
                          latent_dimension=4, num_blocks=1),
        dataset=DatasetConfig(dataset="mnist",
                              tokenization_strategy="reshape"),
        method=MethodConfig(method="improved_mean_flow",
                            use_improved_mean_flow=True),
        training=TrainingConfig(sample_every=2, sample_seed=0, sample_steps=1,
                                workdir=tmp_path / "run"),
    )
    train_flow(config)
    checkpoint = find_latest_checkpoint(tmp_path / "run" / "checkpoints")
    evaluator = ComprehensiveEvaluator(checkpoint, config, nfe_list=[1],
                                       num_samples=8, batch_size=8,
                                       latent_bits=8)
    _, test_iter = load_mnist(batch_size=8)
    results = evaluator.evaluate(next(test_iter))
    assert results["latent_bits"] == 8
    entry = results["nfe_sweep"]["1"]
    assert "mse" in entry and np.isfinite(entry["mse"])
