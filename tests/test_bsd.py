"""Bark spectral distortion: construction anchors + independent-oracle
cross-validation (the PESQ-axis metric's in-image evidence chain,
VERDICT r4 item 7 — "give PESQ the STOI treatment").

Reference parity target: /root/reference/meanflow_audio_codec/evaluators/
audio_metrics.py:20-65 delegates the perceptual-distortion axis to the
licensed ``pesq`` package (not installable here); this package implements
the published bark/loudness distortion chain directly and pins it two
ways — algebraic anchors and a second independent derivation.
"""

from __future__ import annotations

import numpy as np
import pytest

from bsd_oracle import bsd_oracle

from meanflow_audio_codec_tpu.evaluators.audio_metrics import bsd

RATE = 44100


def _signal(seconds: float = 1.0, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * RATE)) / RATE
    sig = sum(np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
              for f in (196.0, 440.0, 988.0, 2217.0, 4699.0))
    return (sig * (0.55 + 0.45 * np.sin(2 * np.pi * 4.0 * t))).astype(
        np.float64)


def test_identity_is_exactly_zero():
    x = _signal()
    assert bsd(x, x) == 0.0


def test_global_gain_is_compensated():
    """P.862-style level alignment: a pure gain is not distortion."""
    x = _signal(seed=1)
    assert bsd(x, 0.1 * x) == pytest.approx(0.0, abs=1e-12)
    assert bsd(x, 3.0 * x) == pytest.approx(0.0, abs=1e-12)


def test_monotone_in_additive_noise_snr():
    x = _signal(seed=2)
    rng = np.random.default_rng(7)
    noise = rng.standard_normal(x.shape)
    noise /= np.sqrt(np.mean(noise ** 2))
    rms = np.sqrt(np.mean(x ** 2))
    scores = [bsd(x, x + (rms / 10 ** (snr / 20)) * noise)
              for snr in (0.0, 10.0, 20.0, 30.0, 40.0)]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[-1] < 0.2 < scores[0]


def test_loudness_domain_compression():
    """The ^0.23 sone compression means doubling spectral *intensity* far
    less than doubles loudness — a +6 dB per-band error costs much less
    than the energy ratio suggests. Distinguishes BSD from raw log/linear
    spectral distance: amplifying one octave band by 4x in power moves
    loudness by 4^0.23 ~ 1.38x in that band only."""
    x = _signal(seed=3)
    # mild spectral tilt vs hard additive noise at the same waveform MSE
    rng = np.random.default_rng(11)
    noise = rng.standard_normal(x.shape)
    tilted = x + 0.05 * np.gradient(x)          # correlated, gentle
    noisy = x + noise * np.sqrt(np.mean((tilted - x) ** 2))  # equal MSE
    assert bsd(x, tilted) < bsd(x, noisy)


def test_silence_gate_required():
    with pytest.raises(ValueError):
        bsd(np.zeros(RATE), np.zeros(RATE))


def test_too_short_raises():
    with pytest.raises(ValueError):
        bsd(np.ones(100), np.ones(100))


# ---------------------------------------------------------------------------
# Oracle cross-validation (second independent derivation)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("snr_db", [0.0, 10.0, 20.0, 35.0])
def test_matches_independent_oracle_across_snr(snr_db):
    pytest.importorskip("scipy")
    x = _signal(seed=4)
    rng = np.random.default_rng(int(snr_db) + 1)
    noise = rng.standard_normal(x.shape)
    noise /= np.sqrt(np.mean(noise ** 2))
    y = x + (np.sqrt(np.mean(x ** 2)) / 10 ** (snr_db / 20)) * noise
    a, b = bsd(x, y, RATE), bsd_oracle(x, y, RATE)
    assert a == pytest.approx(b, rel=2e-3), (a, b)


def test_matches_oracle_on_lowpassed_signal():
    pytest.importorskip("scipy")
    x = _signal(seed=5)
    # crude lowpass: 5-tap moving average — spectrally selective damage
    k = np.ones(5) / 5.0
    y = np.convolve(x, k, mode="same")
    a, b = bsd(x, y, RATE), bsd_oracle(x, y, RATE)
    assert a == pytest.approx(b, rel=2e-3), (a, b)
    assert a > 0.01
