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
    """

    codes: jnp.ndarray
    scale: jnp.ndarray
    qbits: int = 0

    @property
    def bits(self) -> int:
        return self.qbits or jnp.dtype(self.codes.dtype).itemsize * 8

    def tree_flatten(self):
        return (self.codes, self.scale), self.qbits

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, qbits=aux)


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


@jax.jit
def dequantize_latents(bitstream: LatentBitstream) -> jnp.ndarray:
    """Codes + scales -> [B, nf, D] float32 latents."""
    return bitstream.codes.astype(jnp.float32) * bitstream.scale


def bitstream_kbps(latent_dim: int, frames_per_second: float,
                   bits: int = 8) -> float:
    """Stored bitrate: codes plus one float32 scale per frame."""
    return frames_per_second * (latent_dim * bits + 32) / 1000.0


# ============================================================================
# Serialization: LatentBitstream <-> bytes (native rANS entropy coding)
# ============================================================================

_MAGIC = b"MACB"
_FLAG_ENTROPY = 1


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
    header = (_MAGIC + bytes([1, bits, flags, 0])
              + np.asarray([b, nf, d], dtype="<u4").tobytes())
    sizes = np.asarray([len(payload)], dtype="<u8").tobytes()
    return header + scale.astype("<f4").tobytes() + sizes + payload


def unpack_bitstream(data: bytes) -> LatentBitstream:
    """Inverse of :func:`pack_bitstream` (exact code/scale recovery)."""
    import numpy as np

    if data[:4] != _MAGIC:
        raise ValueError("not a MACB latent bitstream")
    version, bits, flags, _ = data[4:8]
    if version != 1:
        raise ValueError(f"unsupported bitstream version {version}")
    b, nf, d = np.frombuffer(data[8:20], dtype="<u4")
    off = 20
    scale = np.frombuffer(data[off:off + 4 * b * nf],
                          dtype="<f4").reshape(int(b), int(nf), 1)
    off += 4 * b * nf
    (payload_len,) = np.frombuffer(data[off:off + 8], dtype="<u8")
    off += 8
    payload = data[off:off + int(payload_len)]
    n = int(b) * int(nf) * int(d)
    if flags & _FLAG_ENTROPY:
        from meanflow_audio_codec_tpu.ops import entropy as coder
        codes = coder.entropy_decode(payload, n)
    else:
        codes = np.frombuffer(payload, dtype=_np_dtype(bits), count=n)
    codes = codes.reshape(int(b), int(nf), int(d))
    return LatentBitstream(jnp.asarray(codes), jnp.asarray(scale),
                           qbits=bits if bits == 4 else 0)


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
            "batch": b, "n_frames": nf, "latent_dim": d,
            "total_bytes": len(data)}
