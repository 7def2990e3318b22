"""Stateless Flax layers wrapping the MDCT transforms
(reference: meanflow_audio_codec/preprocessing/mdct.py:547-693).

Stereo inputs are handled by folding channels into the batch (one vectorised
transform) with left/right coefficient blocks concatenated along the
frequency axis, byte-identical to the reference's per-channel path.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from meanflow_audio_codec_tpu.ops.mdct import (
    DEFAULT_FFT_THRESHOLD,
    DEFAULT_WINDOW_SIZE,
    MDCTConfig,
    imdct,
    mdct,
)


class MDCTLayer(nn.Module):
    """Forward MDCT as a parameter-free network layer.

    ``[B, T] -> [B, n_frames, W]`` (mono) or
    ``[B, T, 2] -> [B, n_frames, 2W]`` (stereo, L block then R block).
    """

    window_size: int = DEFAULT_WINDOW_SIZE
    hop_size: int | None = None
    use_fft_threshold: int = DEFAULT_FFT_THRESHOLD
    config: MDCTConfig | None = None

    def _cfg(self) -> MDCTConfig:
        return self.config if self.config is not None else MDCTConfig(
            window_size=self.window_size, hop_size=self.hop_size,
            use_fft_threshold=self.use_fft_threshold)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self._cfg()
        if x.ndim == 3 and x.shape[-1] == 2:
            coeffs = mdct(jnp.moveaxis(x, -1, 1), config=cfg)  # [B, 2, nf, W]
            b, c, nf, w = coeffs.shape
            return jnp.moveaxis(coeffs, 1, -2).reshape(b, nf, c * w)
        return mdct(x, config=cfg)


class IMDCTLayer(nn.Module):
    """Inverse MDCT as a parameter-free network layer.

    ``[B, n_frames, W] -> [B, T]`` (mono) or
    ``[B, n_frames, 2W] -> [B, T, 2]`` (stereo).
    """

    window_size: int = DEFAULT_WINDOW_SIZE
    hop_size: int | None = None
    use_fft_threshold: int = DEFAULT_FFT_THRESHOLD
    config: MDCTConfig | None = None

    def _cfg(self) -> MDCTConfig:
        return self.config if self.config is not None else MDCTConfig(
            window_size=self.window_size, hop_size=self.hop_size,
            use_fft_threshold=self.use_fft_threshold)

    @nn.compact
    def __call__(self, X: jnp.ndarray) -> jnp.ndarray:
        cfg = self._cfg()
        w = cfg.window_size
        if X.shape[-1] == 2 * w:
            b, nf, _ = X.shape
            per_channel = jnp.moveaxis(X.reshape(b, nf, 2, w), 2, 1)
            audio = imdct(per_channel, config=cfg)  # [B, 2, T]
            return jnp.moveaxis(audio, 1, -1)
        return imdct(X, config=cfg)
