"""Audio quality metrics: PESQ (optional), STOI, spectral distances, SI-SNR.

Re-design of the reference audio metrics (meanflow_audio_codec/evaluators/
audio_metrics.py:20-211). The reference delegated everything to optional
packages (pesq/pystoi/librosa) — none installable in this zero-egress
image — so here:

  * **STOI** is implemented natively from the published algorithm
    (Taal et al. 2011): 10 kHz resample, 25.6 ms Hann STFT frames, 15
    one-third-octave bands from 150 Hz, 384 ms segments, per-segment
    normalisation + (1+10^(-beta/20)) clipping, banded correlation.
  * **spectral distance** runs in the MDCT domain through this framework's
    own transform, or on a native log-mel spectrogram (own mel filterbank).
  * **SI-SNR** (scale-invariant SNR) is added — the standard neural-codec
    fidelity number the reference lacked.
  * **PESQ** remains gated on the optional ``pesq`` package, matching the
    reference's behaviour when the dependency is missing.
"""

from __future__ import annotations

import numpy as np

from meanflow_audio_codec_tpu.ops.mdct import mdct as _mdct


# ============================================================================
# Spectral distances
# ============================================================================


def spectral_distance(reference: np.ndarray, test: np.ndarray,
                      window_size: int = 512,
                      domain: str = "mdct") -> float:
    """L2 distance between magnitude spectra, meaned over frames.

    domain='mdct' transforms through the framework MDCT; domain='logmel'
    uses a 64-band log-mel spectrogram (reference audio_metrics.py:112-211).
    """
    reference = np.asarray(reference, dtype=np.float32)
    test = np.asarray(test, dtype=np.float32)
    n = min(reference.shape[-1], test.shape[-1])
    reference, test = reference[..., :n], test[..., :n]
    if domain == "mdct":
        ref_spec = np.asarray(_mdct(reference[None], window_size))[0]
        test_spec = np.asarray(_mdct(test[None], window_size))[0]
    elif domain == "logmel":
        ref_spec = log_mel_spectrogram(reference)
        test_spec = log_mel_spectrogram(test)
    else:
        raise ValueError(f"Unknown domain {domain!r}; use 'mdct' or 'logmel'")
    return float(np.sqrt(np.mean((ref_spec - test_spec) ** 2)))


def _hz_to_mel(hz):
    return 2595.0 * np.log10(1.0 + np.asarray(hz) / 700.0)


def _mel_to_hz(mel):
    return 700.0 * (10.0 ** (np.asarray(mel) / 2595.0) - 1.0)


def mel_filterbank(num_bands: int, fft_size: int,
                   sample_rate: int) -> np.ndarray:
    """Triangular mel filterbank [num_bands, fft_size//2 + 1]."""
    num_bins = fft_size // 2 + 1
    mel_points = np.linspace(_hz_to_mel(0.0), _hz_to_mel(sample_rate / 2),
                             num_bands + 2)
    hz_points = _mel_to_hz(mel_points)
    bins = np.floor((fft_size + 1) * hz_points / sample_rate).astype(int)
    bank = np.zeros((num_bands, num_bins))
    for m in range(1, num_bands + 1):
        left, center, right = bins[m - 1], bins[m], bins[m + 1]
        for k in range(left, center):
            if center > left:
                bank[m - 1, k] = (k - left) / (center - left)
        for k in range(center, min(right, num_bins)):
            if right > center:
                bank[m - 1, k] = (right - k) / (right - center)
    return bank


def log_mel_spectrogram(audio: np.ndarray, sample_rate: int = 44100,
                        fft_size: int = 1024, hop: int = 256,
                        num_bands: int = 64, eps: float = 1e-8) -> np.ndarray:
    """[T] -> [frames, num_bands] log-mel magnitudes (own STFT)."""
    audio = np.asarray(audio, dtype=np.float64).reshape(-1)
    window = np.hanning(fft_size)
    n_frames = max(1, 1 + (len(audio) - fft_size) // hop)
    frames = np.stack([audio[i * hop:i * hop + fft_size]
                       for i in range(n_frames)])
    spec = np.abs(np.fft.rfft(frames * window, axis=-1))
    bank = mel_filterbank(num_bands, fft_size, sample_rate)
    return np.log(spec @ bank.T + eps)


# ============================================================================
# SI-SNR
# ============================================================================


def si_snr(reference: np.ndarray, test: np.ndarray,
           eps: float = 1e-8) -> float:
    """Scale-invariant signal-to-noise ratio in dB."""
    reference = np.asarray(reference, dtype=np.float64).reshape(-1)
    test = np.asarray(test, dtype=np.float64).reshape(-1)
    n = min(len(reference), len(test))
    reference, test = reference[:n] - reference[:n].mean(), test[:n] - test[:n].mean()
    alpha = np.dot(test, reference) / (np.dot(reference, reference) + eps)
    target = alpha * reference
    noise = test - target
    return float(10.0 * np.log10(
        (np.dot(target, target) + eps) / (np.dot(noise, noise) + eps)))


# ============================================================================
# STOI (native implementation of Taal et al. 2011)
# ============================================================================

_STOI_RATE = 10000
_STOI_FRAME = 256          # 25.6 ms at 10 kHz
_STOI_FFT = 512
_STOI_NUM_BANDS = 15
_STOI_MIN_FREQ = 150.0
_STOI_SEG = 30             # analysis segment length in frames (384 ms)
_STOI_BETA = -15.0         # lower SDR clipping bound (dB)
_STOI_DYN_RANGE = 40.0     # silent-frame removal energy range (dB)


def _resample(audio: np.ndarray, orig_rate: int, target_rate: int) -> np.ndarray:
    if orig_rate == target_rate:
        return audio
    from scipy.signal import resample_poly
    from math import gcd
    g = gcd(orig_rate, target_rate)
    return resample_poly(audio, target_rate // g, orig_rate // g)


def _third_octave_bank(fft_size: int, rate: int) -> np.ndarray:
    """Boolean-ish [bands, bins] one-third-octave band matrix."""
    freqs = np.fft.rfftfreq(fft_size, 1.0 / rate)
    centers = _STOI_MIN_FREQ * (2.0 ** (np.arange(_STOI_NUM_BANDS) / 3.0))
    lows = centers * 2 ** (-1 / 6)
    highs = centers * 2 ** (1 / 6)
    bank = np.zeros((_STOI_NUM_BANDS, len(freqs)))
    for b in range(_STOI_NUM_BANDS):
        bank[b] = (freqs >= lows[b]) & (freqs < highs[b])
    return bank


def _stoi_window() -> np.ndarray:
    # MATLAB hanning(N) convention (no zero endpoints) — the published
    # STOI code's window, kept so absolute values stay on its scale
    return np.hanning(_STOI_FRAME + 2)[1:-1]


def _windowed_frames(audio: np.ndarray) -> np.ndarray:
    hop = _STOI_FRAME // 2
    window = _stoi_window()
    n = max(0, 1 + (len(audio) - _STOI_FRAME) // hop)
    frames = np.stack([audio[i * hop:i * hop + _STOI_FRAME] * window
                       for i in range(n)]) if n else np.zeros((0, _STOI_FRAME))
    return frames


def stoi(reference: np.ndarray, test: np.ndarray,
         sample_rate: int = 44100, extended: bool = False) -> float:
    """Short-time objective intelligibility (higher is better).

    ``extended=True`` computes eSTOI (Jensen & Taal 2016): instead of
    per-band envelope correlations with normalisation + clipping, each
    384 ms segment's band x time block is row- then column-normalised
    and correlated whole — no clipping. The reference exposed both via
    pystoi (reference evaluators/audio_metrics.py:68-109); eSTOI also
    degrades more gracefully on non-speech material, where sparse-band
    signals pin classic STOI low.
    """
    reference = np.asarray(reference, dtype=np.float64).reshape(-1)
    test = np.asarray(test, dtype=np.float64).reshape(-1)
    n = min(len(reference), len(test))
    reference = _resample(reference[:n], sample_rate, _STOI_RATE)
    test = _resample(test[:n], sample_rate, _STOI_RATE)

    # remove silent frames (energy > max - 40 dB in the reference signal),
    # operating on the framed decomposition directly — frames are selected,
    # never re-concatenated (concatenating 50%-overlapped frames duplicates
    # samples and manufactures chimeric frames whose spectral spreading
    # inflates band correlations; caught by tests/stoi_oracle.py)
    ref_frames = _windowed_frames(reference)
    test_frames = _windowed_frames(test)
    n_frames = ref_frames.shape[0]
    if n_frames < _STOI_SEG:
        raise ValueError(
            f"signal too short for STOI ({n_frames} frames < {_STOI_SEG})")
    energies = 20 * np.log10(
        np.linalg.norm(ref_frames, axis=1) + 1e-12)
    keep = energies > energies.max() - _STOI_DYN_RANGE
    kept = np.flatnonzero(keep)
    if len(kept) < _STOI_SEG:
        kept = np.arange(n_frames)

    ref_spec = np.abs(np.fft.rfft(ref_frames[kept], n=_STOI_FFT, axis=-1))
    test_spec = np.abs(np.fft.rfft(test_frames[kept], n=_STOI_FFT, axis=-1))
    bank = _third_octave_bank(_STOI_FFT, _STOI_RATE)
    # banded energies [frames, bands]
    ref_bands = np.sqrt((ref_spec ** 2) @ bank.T + 1e-12)
    test_bands = np.sqrt((test_spec ** 2) @ bank.T + 1e-12)

    if extended:
        # eSTOI: per-segment [bands, SEG] blocks, row- (per-band over
        # time) then column- (per-frame over bands) mean/norm
        # normalisation, then a single correlation averaged over frames
        correlations = []
        for m in range(_STOI_SEG, ref_bands.shape[0] + 1):
            blocks = []
            for bands in (ref_bands, test_bands):
                b = bands[m - _STOI_SEG:m].T        # [bands, SEG]
                b = b - b.mean(axis=1, keepdims=True)
                b = b / (np.linalg.norm(b, axis=1, keepdims=True) + 1e-12)
                b = b - b.mean(axis=0, keepdims=True)
                b = b / (np.linalg.norm(b, axis=0, keepdims=True) + 1e-12)
                blocks.append(b)
            correlations.append(
                float((blocks[0] * blocks[1]).sum() / _STOI_SEG))
        return float(np.mean(correlations))

    clip_factor = 10.0 ** (-_STOI_BETA / 20.0)
    correlations = []
    for m in range(_STOI_SEG, ref_bands.shape[0] + 1):
        ref_seg = ref_bands[m - _STOI_SEG:m]     # [SEG, bands]
        test_seg = test_bands[m - _STOI_SEG:m]
        # normalise + clip the degraded segment per band
        alpha = np.linalg.norm(ref_seg, axis=0) / (
            np.linalg.norm(test_seg, axis=0) + 1e-12)
        test_norm = np.minimum(test_seg * alpha,
                               ref_seg * (1 + clip_factor))
        ref_c = ref_seg - ref_seg.mean(0)
        test_c = test_norm - test_norm.mean(0)
        denom = (np.linalg.norm(ref_c, axis=0)
                 * np.linalg.norm(test_c, axis=0) + 1e-12)
        correlations.append((ref_c * test_c).sum(0) / denom)
    return float(np.mean(correlations))


# ============================================================================
# PESQ (optional dependency, as in the reference)
# ============================================================================


def pesq_score(reference: np.ndarray, test: np.ndarray,
               sample_rate: int = 16000, mode: str = "wb") -> float:
    """ITU-T P.862 PESQ via the optional ``pesq`` package
    (reference audio_metrics.py:20-65)."""
    try:
        from pesq import pesq as _pesq
    except ImportError as exc:
        raise ImportError(
            "PESQ requires the optional 'pesq' package (not installed in "
            "this image); use stoi/si_snr/spectral_distance instead"
        ) from exc
    return float(_pesq(sample_rate, np.asarray(reference, dtype=np.float32),
                       np.asarray(test, dtype=np.float32), mode))


# ============================================================================
# Published-scale anchoring
# ============================================================================

#: Logistic mapping d -> intelligibility % fitted in Taal et al. (2011),
#: "An Algorithm for Intelligibility Prediction of Time-Frequency Weighted
#: Noisy Speech", IEEE TASLP 19(7), eq. (7): f(d) = 100 / (1 + exp(a*d + b))
#: with the IEEE-sentence dataset fit. These published constants tie the
#: native STOI d-scale to the paper's intelligibility axis.
_STOI_LOGISTIC_A = -17.4906
_STOI_LOGISTIC_B = 9.6921


def stoi_to_intelligibility(d: float) -> float:
    """Map a STOI score to predicted intelligibility % via the published
    Taal-2011 logistic fit (IEEE sentences in speech-shaped noise)."""
    return float(100.0 / (1.0 + np.exp(_STOI_LOGISTIC_A * d
                                       + _STOI_LOGISTIC_B)))


# ============================================================================
# NSIM (ViSQOL-style neurogram similarity)
# ============================================================================

#: NSIM spectrogram layout, following ViSQOL v3's audio mode (Hines et al.,
#: "ViSQOL: an objective speech quality model", 2015; Chinen et al. 2020):
#: ERB/gammatone-spaced bands from 50 Hz, ~80 ms windows, 20 ms hop.
_NSIM_BANDS = 32
_NSIM_MIN_FREQ = 50.0
_NSIM_WINDOW_SEC = 0.08
_NSIM_HOP_SEC = 0.02


def _erb_space(low: float, high: float, n: int) -> np.ndarray:
    """n centre frequencies equally spaced on the ERB-rate scale
    (Glasberg & Moore 1990: ERBrate(f) = 21.4 log10(1 + 0.00437 f))."""
    lo = 21.4 * np.log10(1.0 + 0.00437 * low)
    hi = 21.4 * np.log10(1.0 + 0.00437 * high)
    rates = np.linspace(lo, hi, n)
    return (10.0 ** (rates / 21.4) - 1.0) / 0.00437


def _erb_filterbank(fft_size: int, rate: int, n_bands: int) -> np.ndarray:
    """[bands, bins] triangular filters on ERB-spaced centres — a real
    gammatone bank's magnitude response collapsed to its main lobe; the
    NSIM literature's neurogram front-end approximated with the same
    band centres and bandwidth scale."""
    freqs = np.fft.rfftfreq(fft_size, 1.0 / rate)
    centers = _erb_space(_NSIM_MIN_FREQ, rate / 2.0 * 0.95, n_bands)
    erb = 24.7 * (0.00437 * centers + 1.0)  # equivalent rectangular bw
    bank = np.maximum(0.0, 1.0 - np.abs(freqs[None, :] - centers[:, None])
                      / (erb[:, None] * 1.5))
    norm = bank.sum(axis=1, keepdims=True)
    return bank / np.maximum(norm, 1e-12)


def _neurogram(audio: np.ndarray, rate: int) -> np.ndarray:
    """[bands, frames] log-compressed ERB-band energy spectrogram."""
    win = int(round(_NSIM_WINDOW_SEC * rate))
    hop = int(round(_NSIM_HOP_SEC * rate))
    fft_size = int(2 ** np.ceil(np.log2(win)))
    window = np.hanning(win)
    n = max(0, 1 + (len(audio) - win) // hop)
    if n < 3:
        raise ValueError(f"signal too short for NSIM ({n} frames < 3)")
    frames = np.stack([audio[i * hop:i * hop + win] * window
                       for i in range(n)])
    power = np.abs(np.fft.rfft(frames, n=fft_size, axis=-1)) ** 2
    bank = _erb_filterbank(fft_size, rate, _NSIM_BANDS)
    banded = power @ bank.T  # [frames, bands]
    return 10.0 * np.log10(banded.T + 1e-12)  # [bands, frames], dB


def nsim(reference: np.ndarray, test: np.ndarray,
         sample_rate: int = 44100) -> float:
    """Neurogram similarity index (Hines & Harte 2012; the similarity
    kernel inside ViSQOL). SSIM-like luminance * structure comparison of
    ERB-band log spectrograms over a sliding 3x3 window:

        NSIM = mean[ (2 mu_r mu_d + C1) / (mu_r^2 + mu_d^2 + C1)
                     * (cov_rd + C2) / (sigma_r sigma_d + C2) ]

    Anchors by construction: NSIM(x, x) = 1.0 exactly for any x;
    uncorrelated signals score near 0. The ViSQOL MOS regression stage is
    NOT reproduced (it needs its fitted SVR); this is the raw published
    similarity index. (Reference parity: the reference had no perceptual
    similarity metric at all — audio_metrics.py:20-109 delegates to
    optional pesq/pystoi.)
    """
    reference = np.asarray(reference, dtype=np.float64).reshape(-1)
    test = np.asarray(test, dtype=np.float64).reshape(-1)
    n = min(len(reference), len(test))
    ref_gram = _neurogram(reference[:n], sample_rate)
    test_gram = _neurogram(test[:n], sample_rate)

    # Clamp to a 60 dB dynamic range below the reference peak and shift
    # nonnegative. Without the clamp, the log epsilon pins silent bands at
    # -120 dB and any audible noise floor swings those cells by ~90 dB,
    # which is far outside the neurogram front-end's physiological range;
    # auditory-periphery models saturate/threshold at ~60 dB of range.
    floor = ref_gram.max() - 60.0
    ref_gram = np.maximum(ref_gram, floor) - floor
    test_gram = np.maximum(test_gram, floor) - floor
    span = 60.0
    c1 = (0.01 * span) ** 2
    c2 = (0.03 * span) ** 2

    # 3x3 local moments via a separable box filter
    def _box(x: np.ndarray) -> np.ndarray:
        pad = np.pad(x, 1, mode="edge")
        return sum(pad[i:i + x.shape[0], j:j + x.shape[1]]
                   for i in range(3) for j in range(3)) / 9.0

    mu_r, mu_d = _box(ref_gram), _box(test_gram)
    var_r = _box(ref_gram ** 2) - mu_r ** 2
    var_d = _box(test_gram ** 2) - mu_d ** 2
    cov = _box(ref_gram * test_gram) - mu_r * mu_d
    var_r = np.maximum(var_r, 0.0)
    var_d = np.maximum(var_d, 0.0)
    luminance = (2 * mu_r * mu_d + c1) / (mu_r ** 2 + mu_d ** 2 + c1)
    structure = (cov + c2) / (np.sqrt(var_r * var_d) + c2)
    return float(np.mean(luminance * structure))


# ============================================================================
# Bark spectral distortion (the PESQ-axis perceptual distortion measure)
# ============================================================================

#: Zwicker (1961) critical-band edges in Hz — the published bark scale
#: every perceptually-weighted spectral measure (BSD, PLP, PESQ's bark
#: warping) is built on. 24 bands up to 15.5 kHz.
_BARK_EDGES_HZ = np.array([
    0.0, 100.0, 200.0, 300.0, 400.0, 510.0, 630.0, 770.0, 920.0, 1080.0,
    1270.0, 1480.0, 1720.0, 2000.0, 2320.0, 2700.0, 3150.0, 3700.0,
    4400.0, 5300.0, 6400.0, 7700.0, 9500.0, 12000.0, 15500.0])

#: Zwicker intensity -> loudness power law exponent (sone scale; the same
#: compression PESQ applies in its loudness mapping, P.862 §10.2.2).
_BSD_LOUDNESS_EXP = 0.23

#: Silence gate: frames whose reference bark energy is this far (dB)
#: below the loudest frame carry no perceptual weight (cf. STOI's 40 dB
#: dynamic-range gate and P.862's VAD).
_BSD_DYN_RANGE_DB = 40.0

_BSD_FRAME_SEC = 0.032  # 32 ms Hann frames, 50% overlap


def _equal_loudness_weight(freq_hz: np.ndarray) -> np.ndarray:
    """Hermansky (1990, JASA 87(4), eq. 5) equal-loudness curve: the
    published 40-phon ear-sensitivity approximation used by PLP (and the
    same role PESQ's frequency response compensation plays)."""
    w2 = (2.0 * np.pi * np.asarray(freq_hz, np.float64)) ** 2
    return ((w2 + 56.8e6) * w2 ** 2) / ((w2 + 6.3e6) ** 2 * (w2 + 0.38e9))


def _bark_bank(fft_size: int, rate: int) -> np.ndarray:
    """[bands, bins] rectangular critical-band summation matrix over the
    rfft bins, equal-loudness weighted at the bin frequency."""
    freqs = np.fft.rfftfreq(fft_size, d=1.0 / rate)
    lo, hi = _BARK_EDGES_HZ[:-1], _BARK_EDGES_HZ[1:]
    keep = lo < rate / 2.0
    member = ((freqs[None, :] >= lo[keep, None])
              & (freqs[None, :] < hi[keep, None]))
    return member * _equal_loudness_weight(freqs)[None, :]


def _bark_loudness(audio: np.ndarray, rate: int) -> np.ndarray:
    """[frames, bands] specific-loudness spectrogram: Hann power spectrum
    -> equal-loudness-weighted critical-band energies -> Zwicker ^0.23."""
    x = np.asarray(audio, np.float64).reshape(-1)
    frame = int(round(_BSD_FRAME_SEC * rate))
    hop = frame // 2
    n = 1 + max(0, (len(x) - frame)) // hop
    if n < 2:
        raise ValueError(f"signal too short for BSD ({n} frames < 2)")
    idx = np.arange(frame)[None, :] + hop * np.arange(n)[:, None]
    frames = x[idx] * np.hanning(frame)[None, :]
    power = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
    bands = power @ _bark_bank(frame, rate).T
    return bands ** _BSD_LOUDNESS_EXP


def bsd(reference: np.ndarray, test: np.ndarray,
        sample_rate: int = 44100) -> float:
    """Bark spectral distortion (Wang, Sekey & Gersho 1992, IEEE JSAC
    10(5), eq. 8): mean squared loudness-domain critical-band error,
    normalised by the reference loudness energy.

        BSD = sum_j sum_b (L_x(j,b) - L_y(j,b))^2
              / sum_j sum_b L_x(j,b)^2

    This is the perceptually-weighted distortion family PESQ (ITU-T
    P.862) is built on — bark-scale band integration, equal-loudness
    weighting, Zwicker intensity->loudness compression — implemented
    from the published chain so the quality tables carry a
    perceptual-distortion number with an in-image oracle
    (tests/bsd_oracle.py), the way the reference relied on the licensed
    ``pesq`` package (reference audio_metrics.py:20-65, unavailable
    here). Anchors: BSD(x, x) == 0 exactly; monotone in additive-noise
    SNR; level-aligned (global gain of the test signal is compensated,
    as P.862 does). Lower is better; identity 0, ~1 means the error
    loudness rivals the signal loudness.
    """
    x = np.asarray(reference, np.float64).reshape(-1)
    y = np.asarray(test, np.float64).reshape(-1)
    n = min(len(x), len(y))
    x, y = x[:n], y[:n]
    # level alignment (P.862 §10.1 aligns both signals to a target level;
    # here: equalise RMS so BSD measures distortion, not gain)
    rx = np.sqrt(np.mean(x * x)) + 1e-300
    ry = np.sqrt(np.mean(y * y)) + 1e-300
    y = y * (rx / ry)
    lx = _bark_loudness(x, sample_rate)
    ly = _bark_loudness(y, sample_rate)
    # silence gate on reference frame loudness energy
    energy = (lx ** 2).sum(axis=1)
    gate = energy > energy.max() * 10.0 ** (-_BSD_DYN_RANGE_DB / 10.0)
    if not gate.any():
        raise ValueError("BSD: reference is silent")
    num = ((lx[gate] - ly[gate]) ** 2).sum()
    den = (lx[gate] ** 2).sum()
    return float(num / den)
