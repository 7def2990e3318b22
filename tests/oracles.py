"""Independent NumPy reference implementations used as test oracles.

These mirror the mathematical contract of the reference's test utilities
(reference: test/test_mdct_utils.py) — pure-NumPy direct cosine transforms
with Python-loop overlap-add — implemented here from the transform
definition, in float64 for a tight error bound.
"""

from __future__ import annotations

import numpy as np


def _basis(window_size: int) -> np.ndarray:
    n = np.arange(2 * window_size, dtype=np.float64)[:, None]
    k = np.arange(window_size, dtype=np.float64)[None, :]
    return np.cos(np.pi / window_size * (n + window_size / 2 + 0.5) * (k + 0.5))


def _window(window_size: int) -> np.ndarray:
    n = np.arange(2 * window_size, dtype=np.float64)
    return np.sin(np.pi * (n + 0.5) / (2 * window_size))


def mdct_baseline(x: np.ndarray, window_size: int,
                  hop_size: int | None = None) -> np.ndarray:
    """Oracle forward MDCT: (..., T) -> (batch, n_frames, W) with batch dim."""
    hop = hop_size or window_size // 2
    w = _window(window_size)
    x = np.asarray(x, dtype=np.float64).reshape(-1, x.shape[-1])
    time_length = x.shape[1]
    nf = 1 if time_length < window_size else (time_length - window_size) // hop + 1
    need = (nf - 1) * hop + 2 * window_size
    if time_length < need:
        x = np.pad(x, ((0, 0), (0, need - time_length)))
    basis = _basis(window_size)
    frames = [
        (x[:, i * hop:i * hop + 2 * window_size] * w) @ basis for i in range(nf)
    ]
    return np.stack(frames, axis=1)


def imdct_baseline(X: np.ndarray, window_size: int,
                   hop_size: int | None = None) -> np.ndarray:
    """Oracle inverse MDCT with Python-loop overlap-add."""
    hop = hop_size or window_size // 2
    w = _window(window_size)
    X = np.asarray(X, dtype=np.float64).reshape(-1, X.shape[-2], X.shape[-1])
    batch, nf = X.shape[:2]
    out_len = (nf - 1) * hop + 2 * window_size
    basis = _basis(window_size)
    out = np.zeros((batch, out_len))
    for i in range(nf):
        out[:, i * hop:i * hop + 2 * window_size] += (
            (2.0 / window_size) * (X[:, i] @ basis.T) * w
        )
    return out
