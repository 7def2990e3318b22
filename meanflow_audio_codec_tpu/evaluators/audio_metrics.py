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
