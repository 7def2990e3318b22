"""Independent STOI oracle, written directly from Taal et al. 2011
("An Algorithm for Intelligibility Prediction of Time-Frequency Weighted
Noisy Speech", IEEE TASLP 19(7)) for cross-validation of the package's
native implementation (evaluators/audio_metrics.py:stoi).

Deliberately a *second derivation*, not a refactor: MATLAB-convention
Hann window (``hanning(N)`` excludes the zero endpoints — the published
MATLAB/pystoi behavior), stride-trick framing, fully vectorized
segment correlations via cumulative sums of nothing shared with the
package's per-segment loop. Two implementations of the published
algorithm agreeing across conditions is the strongest absolute-scale
evidence available in this egress-blocked image (no pystoi wheel).
"""

from __future__ import annotations

import numpy as np

RATE = 10000
FRAME = 256
FFT = 512
BANDS = 15
MIN_FREQ = 150.0
SEG = 30
BETA = -15.0
DYN_RANGE = 40.0


def _matlab_hann(n: int) -> np.ndarray:
    # MATLAB hanning(n): sin^2 without the zero endpoints
    return np.hanning(n + 2)[1:-1]


def _frame(x: np.ndarray) -> np.ndarray:
    hop = FRAME // 2
    n = max(0, 1 + (len(x) - FRAME) // hop)
    idx = np.arange(FRAME)[None, :] + hop * np.arange(n)[:, None]
    return x[idx]


def _octave_band_matrix() -> np.ndarray:
    f = np.linspace(0, RATE, FFT, endpoint=False)[: FFT // 2 + 1]
    cf = MIN_FREQ * 2.0 ** (np.arange(BANDS) / 3.0)
    lo = cf * 2.0 ** (-1.0 / 6.0)
    hi = cf * 2.0 ** (1.0 / 6.0)
    return ((f[None, :] >= lo[:, None]) & (f[None, :] < hi[:, None])
            ).astype(np.float64)


def stoi_oracle(clean: np.ndarray, degraded: np.ndarray,
                sample_rate: int, extended: bool = False) -> float:
    from scipy.signal import resample_poly
    from math import gcd

    x = np.asarray(clean, np.float64).reshape(-1)
    y = np.asarray(degraded, np.float64).reshape(-1)
    n = min(len(x), len(y))
    x, y = x[:n], y[:n]
    if sample_rate != RATE:
        g = gcd(sample_rate, RATE)
        x = resample_poly(x, RATE // g, sample_rate // g)
        y = resample_poly(y, RATE // g, sample_rate // g)

    w = _matlab_hann(FRAME)
    xf, yf = _frame(x) * w, _frame(y) * w
    if xf.shape[0] < SEG:
        raise ValueError("signal too short for STOI")
    # silent-frame removal keyed on the clean signal's frame energy
    e = 20.0 * np.log10(np.linalg.norm(xf, axis=1) + 1e-12)
    keep = e > e.max() - DYN_RANGE
    if keep.sum() < SEG:
        keep[:] = True
    xf, yf = xf[keep], yf[keep]

    xs = np.abs(np.fft.rfft(xf, FFT, axis=1))
    ys = np.abs(np.fft.rfft(yf, FFT, axis=1))
    obm = _octave_band_matrix()
    X = np.sqrt(xs ** 2 @ obm.T + 1e-12)   # [frames, bands]
    Y = np.sqrt(ys ** 2 @ obm.T + 1e-12)

    m = X.shape[0] - SEG + 1               # segments, sliding by 1 frame
    sidx = np.arange(SEG)[None, :, None] + np.arange(m)[:, None, None]
    Xs = X[sidx[..., 0]]                   # [m, SEG, bands]
    Ys = Y[sidx[..., 0]]

    if extended:
        # eSTOI (Jensen & Taal 2016), fully batched over segments:
        # normalise over time (axis=1: each band row), then over bands
        # (axis=2: each frame column), correlate, average over frames
        def _rc(Z):
            Z = Z - Z.mean(axis=1, keepdims=True)
            Z = Z / (np.linalg.norm(Z, axis=1, keepdims=True) + 1e-12)
            Z = Z - Z.mean(axis=2, keepdims=True)
            Z = Z / (np.linalg.norm(Z, axis=2, keepdims=True) + 1e-12)
            return Z
        Xn, Yn = _rc(Xs), _rc(Ys)
        return float(((Xn * Yn).sum(axis=(1, 2)) / SEG).mean())
    alpha = (np.linalg.norm(Xs, axis=1, keepdims=True)
             / (np.linalg.norm(Ys, axis=1, keepdims=True) + 1e-12))
    clip = 10.0 ** (-BETA / 20.0)
    Yn = np.minimum(Ys * alpha, Xs * (1.0 + clip))
    Xc = Xs - Xs.mean(axis=1, keepdims=True)
    Yc = Yn - Yn.mean(axis=1, keepdims=True)
    num = (Xc * Yc).sum(axis=1)
    den = (np.linalg.norm(Xc, axis=1) * np.linalg.norm(Yc, axis=1) + 1e-12)
    return float((num / den).mean())
