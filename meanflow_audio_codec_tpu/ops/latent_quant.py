"""Latent bitstream: scalar-quantized codec latents with a real bitrate.

The reference treats the codec's latents as float32 activations and never
defines a stored format (its only bitrate number is the 128 kbps of the
source MP3s, tools/download_wavegen.py:55). A codec's product surface is
a *bitstream*: this module packs the ``[B, n_frames, latent_dim]`` float
latents into per-frame symmetric scalar-quantized integer codes plus one
float32 scale per frame, giving an actual kbps figure

    kbps = frames_per_second * (latent_dim * bits + 32) / 1000

(358 kbps nominal for the v2 quality geometry — latent 256 x 8 bits at
44100/256 ~ 172 frames/s; the rANS-coded container measures **279.5 kbps**
on real v2 latents — a 5x reduction vs 1411 kbps raw 16-bit stereo, 4x
less than the float32 latents the reference would keep).
Quantization is a pure jit-friendly transform; the decode
path dequantizes and runs the unchanged 1-NFE flow — the flow decoder
doubles as the codec's *dequantization post-filter*, which is exactly the
"stochastic post-filter" framing of the reference README (README.md:3-7)
applied to a real storage format.

Per-frame (not per-clip) scales keep quiet frames precise next to loud
ones; symmetric quantization keeps zero exact (silence).

Two quantizer modes share the container:

- **MACB v1** (:func:`quantize_latents`): fixed-width symmetric codes,
  scale = per-frame peak / qmax. Simple, streaming-friendly (no
  cross-frame state).
- **MACB v2** (:func:`quantize_latents_ecsq`): mean-removed
  entropy-constrained scalar quantization — subtract a per-clip per-dim
  mean vector (the encoder's static offsets carry ~94% of latent energy),
  then quantize with a step proportional to the per-frame residual std.
  ``step_frac`` is a continuous rate knob; combined with the rANS coder
  it dominates v1's rate-distortion curve (measured: 98 kbps at
  22.7 dB latent SNR vs v1-4-bit's 105 kbps at 15.4 dB).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

#: storage dtype per code width; sub-byte widths live in int8 (the rANS
#: coder recovers their true entropy, so storage still tracks ~bits/code)
_INT_DTYPES = {4: jnp.int8, 8: jnp.int8, 16: jnp.int16}


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class LatentBitstream:
    """Quantized latents: integer codes + per-frame float32 scales.

    ``codes`` is ``[B, n_frames, latent_dim]`` int8/int16; ``scale`` is
    ``[B, n_frames, 1]`` float32. A pytree, so it moves through jit /
    device_put / serialization like any array bundle. ``qbits`` records
    the quantizer width when it is narrower than the storage dtype
    (4-bit codes ride int8 arrays); 0 means dtype-implied.

    The ECSQ mode (:func:`quantize_latents_ecsq`) additionally carries a
    per-clip per-dim *mean vector* as int8 codes + one float32 scale per
    clip (``mean_codes`` ``[B, 1, latent_dim]``, ``mean_scale``
    ``[B, 1, 1]``): the encoder's latent space has large static per-dim
    offsets (~94% of latent energy on the v2 codec), so subtracting a
    1-per-clip mean before scalar quantization buys ~2 bits/code of
    entropy at equal distortion. ``None`` for plain width-quantized
    streams (MACB v1).
    """

    codes: jnp.ndarray
    scale: jnp.ndarray
    qbits: int = 0
    mean_codes: jnp.ndarray | None = None
    mean_scale: jnp.ndarray | None = None
    gains: jnp.ndarray | None = None

    @property
    def bits(self) -> int:
        return self.qbits or jnp.dtype(self.codes.dtype).itemsize * 8

    def tree_flatten(self):
        return (self.codes, self.scale,
                self.mean_codes, self.mean_scale, self.gains), self.qbits

    @classmethod
    def tree_unflatten(cls, aux, children):
        codes, scale, mean_codes, mean_scale, gains = children
        return cls(codes, scale, qbits=aux,
                   mean_codes=mean_codes, mean_scale=mean_scale, gains=gains)


#: 8-bit log-gain grid: log2(gain) uniformly quantized over [-12, 4]
#: (96 dB down to +24 dB re unit RMS) — max 2.2% per-frame gain error,
#: ~-33 dB re signal, well under the codec's distortion floor.
_GAIN_LOG2_LO, _GAIN_LOG2_HI = -12.0, 4.0


def quantize_gains(gains):
    """[B, nf, 1] float gains -> uint8 log-domain codes (numpy)."""
    import numpy as np
    g = np.maximum(np.asarray(gains, dtype=np.float32), 2.0 ** _GAIN_LOG2_LO)
    t = (np.log2(g) - _GAIN_LOG2_LO) / (_GAIN_LOG2_HI - _GAIN_LOG2_LO)
    return np.clip(np.round(t * 255.0), 0, 255).astype(np.uint8)


def dequantize_gains(codes):
    """uint8 log-gain codes -> float32 gains (numpy)."""
    import numpy as np
    t = np.asarray(codes, dtype=np.float32) / 255.0
    return np.exp2(_GAIN_LOG2_LO
                   + t * (_GAIN_LOG2_HI - _GAIN_LOG2_LO)).astype(np.float32)


@partial(jax.jit, static_argnames=("bits",))
def quantize_latents(latents: jnp.ndarray, bits: int = 8) -> LatentBitstream:
    """[B, nf, D] float latents -> symmetric per-frame scalar codes."""
    if bits not in _INT_DTYPES:
        raise ValueError(f"bits must be one of {sorted(_INT_DTYPES)}")
    qmax = float(2 ** (bits - 1) - 1)
    latents = latents.astype(jnp.float32)
    peak = jnp.max(jnp.abs(latents), axis=-1, keepdims=True)
    scale = jnp.maximum(peak, 1e-12) / qmax
    codes = jnp.clip(jnp.round(latents / scale), -qmax, qmax)
    dtype = _INT_DTYPES[bits]
    qbits = bits if bits < jnp.dtype(dtype).itemsize * 8 else 0
    return LatentBitstream(codes.astype(dtype),
                           scale.astype(jnp.float32), qbits=qbits)


@partial(jax.jit, static_argnames=("step_frac",))
def quantize_latents_ecsq(latents: jnp.ndarray,
                          step_frac: float = 0.5) -> LatentBitstream:
    """Mean-removed entropy-constrained scalar quantization (MACB v2).

    The rate-aware stored format: subtract a per-clip per-dim mean
    (itself 8-bit quantized — static encoder offsets carry ~94% of the
    latent energy but no per-frame information), then quantize the
    residual on a uniform grid whose step is ``step_frac`` x the
    per-frame residual std, stored as int8 and entropy-coded by the
    native rANS at pack time. ``step_frac`` is a *continuous* rate knob:
    measured on the v2 codec latents, 1.0 ~ 98 kbps / 22.7 dB latent
    SNR, 0.5 ~ 140 kbps / 28.7 dB, 0.15 ~ 215 kbps / 39.2 dB — the last
    matching the plain 8-bit peak format (283 kbps) ~70 kbps cheaper.
    Uniform-grid + entropy coding is near-R-D-optimal for smooth
    sources (ECSQ, within 0.255 bit of the bound at high rate), which
    is why this replaces a Lloyd-Max codebook.

    Accepts ``[B, nf, D]`` (per-clip means) or ``[nf, D]`` (one stream).
    The quantized-mean reconstruction error folds into the residual, so
    decode error stays bounded by step/2 per element.
    """
    z = latents.astype(jnp.float32)
    mean = jnp.mean(z, axis=-2, keepdims=True)
    mean_scale = jnp.maximum(
        jnp.max(jnp.abs(mean), axis=-1, keepdims=True), 1e-12) / 127.0
    mean_codes = jnp.clip(jnp.round(mean / mean_scale), -127, 127)
    resid = z - mean_codes * mean_scale
    step = jnp.maximum(jnp.std(resid, axis=-1, keepdims=True),
                       1e-12) * step_frac
    codes = jnp.clip(jnp.round(resid / step), -127, 127)
    return LatentBitstream(codes.astype(jnp.int8), step.astype(jnp.float32),
                           mean_codes=mean_codes.astype(jnp.int8),
                           mean_scale=mean_scale.astype(jnp.float32))


@jax.tree_util.register_static
@dataclass(frozen=True)
class LatentQAT:
    """Quantization-aware training transform for codec latents.

    Applied to the encoder output *inside* the training objective so the
    flow decoder is trained on the latents it will actually see at decode
    time — the stored format stops being a bolted-on afterthought (the
    naive post-hoc 4-bit path measured +8.8 dB SI-SNR vs +17.9 unquantized;
    the rate-distortion knee this trains away). The reference has no stored
    format at all (its latents stay float activations, README.md:3-7), so
    there is no reference counterpart; the quantizer math is this module's
    own eval-side pair.

    Two modes (``mode``):

    - ``"ste"``: straight-through estimator — the forward pass is *exactly*
      the eval-time quantize→dequantize round-trip (`quantize_latents_ecsq`
      / `quantize_latents`), the backward pass treats it as identity, so
      encoder and decoder both train through the real grid.
    - ``"noise"``: additive uniform noise of one quantizer step — the
      classic soft relaxation (fully differentiable, no bias at the grid
      edges); matches the quantizer's *error statistics* rather than its
      exact grid.

    ``step_frac`` selects the rate-aware ECSQ grid (MACB v2, the format the
    trained checkpoint will serve); ``bits`` selects the fixed-width MACB
    v1 grid. Exactly one must be set. A pytree *static* (hashable config),
    so objectives carrying it stay jit-cache-friendly.
    """

    mode: str = "ste"
    step_frac: float | None = None
    bits: int | None = None

    def __post_init__(self):
        if (self.step_frac is None) == (self.bits is None):
            raise ValueError("set exactly one of step_frac (ECSQ) or "
                             "bits (fixed-width)")
        if self.mode not in ("ste", "noise"):
            raise ValueError(f"mode must be 'ste' or 'noise', got {self.mode!r}")

    def _roundtrip(self, z: jnp.ndarray) -> jnp.ndarray:
        if self.step_frac is not None:
            return dequantize_latents(
                quantize_latents_ecsq(z, step_frac=self.step_frac))
        return dequantize_latents(quantize_latents(z, bits=self.bits))

    def _step(self, z: jnp.ndarray) -> jnp.ndarray:
        """One quantizer step per frame (the uniform-noise amplitude)."""
        z = z.astype(jnp.float32)
        if self.step_frac is not None:
            mean = jnp.mean(z, axis=-2, keepdims=True)
            return jnp.maximum(jnp.std(z - mean, axis=-1, keepdims=True),
                               1e-12) * self.step_frac
        qmax = float(2 ** (self.bits - 1) - 1)
        peak = jnp.max(jnp.abs(z), axis=-1, keepdims=True)
        return jnp.maximum(peak, 1e-12) / qmax

    def __call__(self, latents: jnp.ndarray, key) -> jnp.ndarray:
        dtype = latents.dtype
        z = latents.astype(jnp.float32)
        if self.mode == "ste":
            out = z + jax.lax.stop_gradient(self._roundtrip(z) - z)
        else:
            noise = jax.random.uniform(key, z.shape, dtype=jnp.float32,
                                       minval=-0.5, maxval=0.5)
            out = z + noise * jax.lax.stop_gradient(self._step(z))
        return out.astype(dtype)


@jax.jit
def dequantize_latents(bitstream: LatentBitstream) -> jnp.ndarray:
    """Codes + scales (+ mean vector for ECSQ streams) -> float32 latents."""
    out = bitstream.codes.astype(jnp.float32) * bitstream.scale
    if bitstream.mean_codes is not None:
        out = out + (bitstream.mean_codes.astype(jnp.float32)
                     * bitstream.mean_scale)
    return out


def bitstream_kbps(latent_dim: int, frames_per_second: float,
                   bits: int = 8) -> float:
    """Stored bitrate: codes plus one float32 scale per frame."""
    return frames_per_second * (latent_dim * bits + 32) / 1000.0


# ============================================================================
# Serialization: LatentBitstream <-> bytes (native rANS entropy coding)
# ============================================================================

_MAGIC = b"MACB"
_FLAG_ENTROPY = 1
#: flag bit: a uint8 log-gain section ([B*nf] bytes, quantize_gains grid)
#: follows the scale section — orthogonal to v1/v2, old readers that
#: ignore unknown flags would mis-parse, so readers reject unknown flags.
_FLAG_GAINS = 2


def pack_bitstream(bitstream: LatentBitstream,
                   entropy: bool | None = None) -> bytes:
    """Serialize to actual stored bytes.

    8-bit codes go through the native rANS coder (native/entropy.cpp) when
    it is available — storage then tracks the codes' empirical entropy
    rather than the nominal 8 bits — with a transparent raw fallback
    (``entropy=False`` forces raw; ``None`` = auto). Scales are raw
    float32. The header records which path was taken, so ``unpack``
    needs no configuration.
    """
    import numpy as np

    codes = np.asarray(bitstream.codes)
    scale = np.asarray(bitstream.scale, dtype=np.float32)
    if codes.ndim == 2:  # single-stream [nf, D] from the 2D quantize path
        codes = codes[None]
        scale = scale[None]
    b, nf, d = codes.shape
    bits = bitstream.bits
    payload: bytes
    flags = 0
    if bits in (4, 8) and entropy is not False:
        from meanflow_audio_codec_tpu.ops import entropy as coder
        if coder.available():
            payload = coder.entropy_encode(codes)
            flags = _FLAG_ENTROPY
            if entropy is None and len(payload) >= codes.size:
                # auto mode: the 512-byte frequency table loses on tiny
                # streams — store whichever is smaller
                payload = codes.tobytes()
                flags = 0
        elif entropy is True:
            raise RuntimeError(
                f"entropy coder unavailable: {coder.load_error()}")
        else:
            payload = codes.tobytes()
    else:
        if entropy is True:
            raise ValueError("entropy coding supports int8-stored codes "
                             "(4/8-bit) only")
        payload = codes.tobytes()
    # version 2 when a mean vector rides along (ECSQ streams); version 1
    # (no mean section) stays byte-identical for plain width-quantized
    # streams, so old readers/writers interoperate unchanged
    version = 1 if bitstream.mean_codes is None else 2
    gain_section = b""
    if bitstream.gains is not None:
        flags |= _FLAG_GAINS
        gain_section = quantize_gains(bitstream.gains).tobytes()
    header = (_MAGIC + bytes([version, bits, flags, 0])
              + np.asarray([b, nf, d], dtype="<u4").tobytes())
    mean_section = b""
    if version == 2:
        mean_scale = np.asarray(bitstream.mean_scale, dtype=np.float32)
        mean_codes = np.asarray(bitstream.mean_codes, dtype=np.int8)
        mean_section = (mean_scale.reshape(-1).astype("<f4").tobytes()
                        + mean_codes.tobytes())
    sizes = np.asarray([len(payload)], dtype="<u8").tobytes()
    return (header + mean_section + scale.astype("<f4").tobytes()
            + gain_section + sizes + payload)


def unpack_bitstream(data: bytes) -> LatentBitstream:
    """Inverse of :func:`pack_bitstream` (exact code/scale recovery)."""
    import numpy as np

    if data[:4] != _MAGIC:
        raise ValueError("not a MACB latent bitstream")
    version, bits, flags, _ = data[4:8]
    if version not in (1, 2):
        raise ValueError(f"unsupported bitstream version {version}")
    if flags & ~(_FLAG_ENTROPY | _FLAG_GAINS):
        raise ValueError(f"unknown bitstream flags 0x{flags:02x} — "
                         "refusing to guess the section layout")
    b, nf, d = (int(x) for x in np.frombuffer(data[8:20], dtype="<u4"))
    off = 20
    mean_codes = mean_scale = None
    if version == 2:
        mean_scale = np.frombuffer(
            data[off:off + 4 * b], dtype="<f4").reshape(b, 1, 1)
        off += 4 * b
        mean_codes = np.frombuffer(
            data[off:off + b * d], dtype=np.int8).reshape(b, 1, d)
        off += b * d
    scale = np.frombuffer(data[off:off + 4 * b * nf],
                          dtype="<f4").reshape(b, nf, 1)
    off += 4 * b * nf
    gains = None
    if flags & _FLAG_GAINS:
        gains = dequantize_gains(np.frombuffer(
            data[off:off + b * nf], dtype=np.uint8).reshape(b, nf, 1))
        off += b * nf
    (payload_len,) = np.frombuffer(data[off:off + 8], dtype="<u8")
    off += 8
    payload = data[off:off + int(payload_len)]
    n = b * nf * d
    if flags & _FLAG_ENTROPY:
        from meanflow_audio_codec_tpu.ops import entropy as coder
        codes = coder.entropy_decode(payload, n)
    else:
        codes = np.frombuffer(payload, dtype=_np_dtype(bits), count=n)
    codes = codes.reshape(b, nf, d)
    return LatentBitstream(
        jnp.asarray(codes), jnp.asarray(scale),
        qbits=bits if bits == 4 else 0,
        mean_codes=None if mean_codes is None else jnp.asarray(mean_codes),
        mean_scale=None if mean_scale is None else jnp.asarray(mean_scale),
        gains=None if gains is None else jnp.asarray(gains))


def _np_dtype(bits: int):
    import numpy as np
    return {4: np.int8, 8: np.int8, 16: np.int16}[bits]


def describe_bitstream(data: bytes) -> dict:
    """Header summary of a packed stream (the format's single owner —
    codec_cli's ``info`` uses this instead of re-parsing bytes)."""
    import numpy as np

    if data[:4] != _MAGIC:
        raise ValueError("not a MACB latent bitstream")
    version, bits, flags, _ = data[4:8]
    b, nf, d = (int(x) for x in np.frombuffer(data[8:20], dtype="<u4"))
    return {"version": version, "bits": bits,
            "coding": "rANS" if flags & _FLAG_ENTROPY else "raw",
            "quantizer": "ecsq+mean" if version == 2 else "symmetric",
            "gain_shape": bool(flags & _FLAG_GAINS),
            "batch": b, "n_frames": nf, "latent_dim": d,
            "total_bytes": len(data)}
