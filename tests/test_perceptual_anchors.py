"""Published-scale anchors for the perceptual metrics.

The native STOI implementation is already oracle-checked against an
independent Taal-2011 rewrite (tests/test_evaluators.py). These tests pin
the *absolute scale*: the algebraic endpoints every published STOI
implementation shares, the Taal-2011 logistic intelligibility mapping at
its published fixed points, and the NSIM similarity index's construction
anchors (identity == 1, quality-monotone). Reference parity target:
/root/reference/meanflow_audio_codec/evaluators/audio_metrics.py:20-109
(which delegates to the pesq/pystoi packages — unavailable in this image).
"""

from __future__ import annotations

import numpy as np
import pytest

from meanflow_audio_codec_tpu.evaluators.audio_metrics import (
    _STOI_LOGISTIC_A,
    _STOI_LOGISTIC_B,
    nsim,
    stoi,
    stoi_to_intelligibility,
)

RATE = 44100


def _speech_like(seconds: float = 1.5, seed: int = 0) -> np.ndarray:
    """Amplitude-modulated multi-tone: exercises the octave bands and the
    384 ms STOI analysis windows without needing a real corpus."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * RATE)) / RATE
    sig = sum(np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
              for f in (220.0, 470.0, 1130.0, 2310.0, 4500.0))
    envelope = 0.55 + 0.45 * np.sin(2 * np.pi * 3.7 * t)
    return (sig * envelope).astype(np.float64)


# ---------------------------------------------------------------------------
# STOI algebraic endpoints (shared by every conformant implementation)
# ---------------------------------------------------------------------------

def test_stoi_identity_is_exactly_one():
    """d is a mean of per-band/frame correlation coefficients; identical
    signals correlate at exactly 1 in every cell, so STOI(x, x) == 1."""
    clean = _speech_like()
    assert stoi(clean, clean) == pytest.approx(1.0, abs=1e-9)
    assert stoi(clean, clean, extended=True) == pytest.approx(1.0, abs=1e-9)
    # scale invariance of the identity anchor (correlation is scale-free;
    # clipping normalisation in Taal 2011 is relative to the clean energy)
    assert stoi(clean, 0.25 * clean) == pytest.approx(1.0, abs=1e-3)


def test_stoi_uncorrelated_noise_scores_near_zero():
    clean = _speech_like()
    noise = np.random.default_rng(99).standard_normal(clean.shape)
    assert abs(stoi(clean, noise)) < 0.25
    assert abs(stoi(clean, noise, extended=True)) < 0.25


def test_stoi_monotone_in_snr():
    """The d-measure must order additive-noise conditions by SNR — the
    property Taal 2011 Fig. 5 demonstrates on IEEE sentences."""
    clean = _speech_like()
    rng = np.random.default_rng(7)
    noise = rng.standard_normal(clean.shape)
    noise /= np.sqrt(np.mean(noise**2))
    rms = np.sqrt(np.mean(clean**2))
    scores = []
    for snr_db in (-10.0, -5.0, 0.0, 5.0, 10.0, 20.0):
        scale = rms / (10.0 ** (snr_db / 20.0))
        scores.append(stoi(clean, clean + scale * noise))
    assert all(b > a for a, b in zip(scores, scores[1:])), scores
    # bracketing on the published intelligibility axis: at -10 dB SNR the
    # IEEE-set fit predicts near-chance, at +20 dB near-ceiling
    assert scores[0] < 0.6 < scores[-1]


# ---------------------------------------------------------------------------
# Published Taal-2011 logistic mapping (eq. 7, IEEE-sentence fit)
# ---------------------------------------------------------------------------

def test_logistic_constants_are_the_published_fit():
    # a = -17.4906, b = 9.6921 — Taal et al. 2011, Table/eq. (7)
    assert _STOI_LOGISTIC_A == pytest.approx(-17.4906)
    assert _STOI_LOGISTIC_B == pytest.approx(9.6921)


def test_logistic_mapping_fixed_points():
    # 50% intelligibility crossover at d = -b/a = 0.55413...
    d50 = -_STOI_LOGISTIC_B / _STOI_LOGISTIC_A
    assert stoi_to_intelligibility(d50) == pytest.approx(50.0, abs=1e-6)
    assert d50 == pytest.approx(0.5541, abs=1e-4)
    # endpoints: perfect STOI ≈ ceiling, zero STOI ≈ floor
    assert stoi_to_intelligibility(1.0) > 99.9
    assert stoi_to_intelligibility(0.0) < 0.01
    # strictly increasing
    grid = np.linspace(0.0, 1.0, 21)
    vals = [stoi_to_intelligibility(d) for d in grid]
    assert all(b > a for a, b in zip(vals, vals[1:]))


# ---------------------------------------------------------------------------
# NSIM (neurogram similarity, the ViSQOL similarity kernel)
# ---------------------------------------------------------------------------

def test_nsim_identity_is_exactly_one():
    """SSIM-style kernels satisfy S(x, x) = 1 exactly (luminance and
    structure terms both collapse to 1 when the inputs coincide)."""
    clean = _speech_like()
    assert nsim(clean, clean) == pytest.approx(1.0, abs=1e-9)


def test_nsim_orders_quality_and_separates_noise():
    # broadband clean signal (tones + a noise bed) so every ERB band
    # carries content — the regime a codec evaluation actually sees
    rng = np.random.default_rng(3)
    tonal = _speech_like()
    clean = tonal + 0.05 * rng.standard_normal(tonal.shape)
    noise = np.random.default_rng(11).standard_normal(clean.shape)
    light = nsim(clean, clean + 0.05 * noise)
    heavy = nsim(clean, clean + 0.8 * noise)
    unrelated = nsim(clean, noise)
    assert 1.0 > light > heavy > unrelated
    assert light > 0.8
    assert unrelated < 0.5


def test_nsim_rejects_too_short_signals():
    with pytest.raises(ValueError):
        nsim(np.zeros(512), np.zeros(512), sample_rate=RATE)


def test_evaluator_quality_includes_new_metrics():
    """The comprehensive evaluator's audio quality dict must carry nsim and
    the intelligibility mapping alongside stoi/estoi/si-snr."""
    from meanflow_audio_codec_tpu.evaluators.comprehensive_evaluator import (
        ComprehensiveEvaluator,
    )
    clean = _speech_like(seconds=1.0)
    batch = np.stack([clean, _speech_like(seconds=1.0, seed=1)])
    degraded = batch + 0.1 * np.random.default_rng(5).standard_normal(
        batch.shape)
    evaluator = ComprehensiveEvaluator.__new__(ComprehensiveEvaluator)

    class _Cfg:
        dataset = "audio"

    evaluator.config = _Cfg()
    out = evaluator._quality(batch, degraded)
    for key in ("stoi", "estoi", "nsim", "intelligibility_pct", "si_snr_db"):
        assert key in out, key
    assert 0.0 < out["nsim"] <= 1.0
    assert 0.0 <= out["intelligibility_pct"] <= 100.0


# ---------------------------------------------------------------------------
# STOI validity on the speech synthetic family (round 5)
# ---------------------------------------------------------------------------

def test_stoi_is_meaningful_on_the_speech_family():
    """The round-4 scale fix left STOI ~0 on tonal content (results.md
    "STOI scale break") — correct, but it made the protocol-parity metric
    discriminate nothing the flagship trains on. The speech family
    (data/audio.py:synthetic_audio_pipeline_speech) exists so STOI
    measures what Taal 2011 built it for: on that family the score must
    span a useful range and order additive-noise conditions by SNR."""
    from meanflow_audio_codec_tpu.data.audio import (
        synthetic_audio_pipeline_speech,
    )
    clip = next(synthetic_audio_pipeline_speech(
        seed=3, frame_size=65536, batch_size=1))[0]  # [T, 2] @ 44.1 kHz
    mono = clip.mean(axis=-1).astype(np.float64)
    rng = np.random.default_rng(13)
    noise = rng.standard_normal(mono.shape)
    noise /= np.sqrt(np.mean(noise ** 2))
    rms = np.sqrt(np.mean(mono ** 2))
    snrs = (-20.0, -10.0, 0.0, 10.0, 25.0)
    deg = [mono + (rms / 10 ** (snr / 20)) * noise for snr in snrs]
    scores = [stoi(mono, d) for d in deg]
    escores = [stoi(mono, d, extended=True) for d in deg]
    assert all(b > a for a, b in zip(scores, scores[1:])), scores
    assert all(b > a for a, b in zip(escores, escores[1:])), escores
    # a useful dynamic range on THIS content (measured: STOI 0.54 -> 0.98,
    # eSTOI 0.06 -> 0.79 over -20 -> +25 dB; contrast the tonal family's
    # degenerate ~0.0-0.08 — results.md "STOI scale break"). The synthetic
    # glottal/formant structure is more noise-robust than real speech, so
    # the low anchor sits above the IEEE-sentence near-chance point.
    assert scores[0] < 0.65 and scores[-1] > 0.90
    assert escores[0] < 0.20 and escores[-1] > 0.60
    assert stoi(mono, mono) == pytest.approx(1.0, abs=1e-9)
