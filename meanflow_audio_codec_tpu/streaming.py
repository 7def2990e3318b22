"""Streaming (chunked, stateful) codec surface on top of AudioCodec.

The reference's codec is batch-only: encode/decode whole clips (reference
meanflow_audio_codec/tokenization.py frames a complete signal in one call).
For production serving, a codec must run on an unbounded stream with
bounded memory and fixed latency. This module adds that surface with
**exact batch parity**: pushing a signal through the streaming encoder in
any chunking yields the same latents as ``AudioCodec.encode`` on the whole
signal, and the streaming decoder is chunking-invariant — any chunking of
the same latents under the same key produces identical samples, equal to
a one-shot decode driven by the same per-frame ``fold_in`` noise
(``sample_dual_time(..., noise=frame_noise(...))``; note this noise
construction differs from ``AudioCodec.decode``'s single key draw, so
streaming output is a different — equally valid — dither of the same
content than ``decode(latents, key=key)``).

Geometry (ops/mdct.py conventions): MDCT frames span ``2W`` samples at hop
``H``; frame ``j`` reads ``[jH, jH + 2W)``. The encoder therefore carries
the last ``< 2W`` un-emitted samples between pushes, and the decoder
carries a ``2W - H``-sample overlap-add tail. End-to-end algorithmic
latency of the duplex path is exactly ``2W - H`` samples (~17 ms at the
W=512 default and 44.1 kHz).

Everything under ``push`` is the codec's existing jit-compiled programs on
static shapes — one compile per distinct chunk size, then millisecond
dispatch; no per-chunk retracing.

    codec = AudioCodec.from_workdir("outputs/imf_audio_quality_v2")
    enc, dec = StreamingEncoder(codec), StreamingDecoder(codec)
    for chunk in mic:                       # [B, S, C], S % hop == 0
        audio_out = dec.push(enc.push(chunk))
    audio_out = dec.push(enc.flush())       # trailing zero-padded frames
    audio_out = dec.flush()                 # final overlap-add tail
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from meanflow_audio_codec_tpu.ops.mdct import num_frames_for_length


@partial(jax.jit, static_argnames=("n", "batch", "dim"))
def frame_noise(key, start, n: int, batch: int, dim: int) -> jnp.ndarray:
    """Per-frame decode noise, keyed by (batch row, absolute frame index).

    ``[B, n, dim]`` standard normals where row ``(b, start + i)`` depends
    only on the key and those two indices — so any chunking of a latent
    sequence draws identical noise for identical frames, which is what
    makes streaming decode equal batch decode.
    """
    rows = jnp.arange(batch)
    frames = start + jnp.arange(n)

    def one(b, f):
        k = jax.random.fold_in(jax.random.fold_in(key, b), f)
        return jax.random.normal(k, (dim,), dtype=jnp.float32)

    return jax.vmap(lambda b: jax.vmap(lambda f: one(b, f))(frames))(rows)


def _geometry(codec) -> tuple[int, int, int]:
    """(window, hop, span) of the codec's MDCT tokenizer; validates that
    the frame span is hop-aligned (true for the reference hop = W//2)."""
    cfg = codec.adapter.strategy.config
    window, hop = int(cfg.window_size), int(cfg.hop_size)
    span = 2 * window
    if span % hop:
        raise ValueError(
            f"streaming needs hop | 2*window; got window={window} "
            f"hop={hop}")
    return window, hop, span


class StreamingEncoder:
    """Chunked audio -> latents with exact AudioCodec.encode parity.

    ``push`` accepts ``[B, S, C]`` (or mono ``[B, S]``) chunks of any
    length and emits ``[B, n_new, latent_dim]`` for every frame that is
    now fully covered by real samples (possibly ``n_new = 0`` early on).
    ``flush`` zero-pads the remaining buffered samples exactly like the
    batch framing does, so push+flush over any chunking emits the same
    ``num_frames_for_length`` frames as one batch encode.
    """

    def __init__(self, codec):
        self.codec = codec
        self.window, self.hop, self.span = _geometry(codec)
        self.reset()

    def reset(self) -> None:
        self._carry = None        # stream[emitted*hop : consumed]
        self._consumed = 0        # total samples pushed
        self._emitted = 0         # frames emitted

    @property
    def frames_emitted(self) -> int:
        return self._emitted

    def _empty(self, batch: int) -> jnp.ndarray:
        return jnp.zeros((batch, 0, self.codec.latent_dim), jnp.float32)

    def _encode_tokens(self, tokens: jnp.ndarray) -> jnp.ndarray:
        adapter = self.codec.adapter
        if adapter.scale != 1.0:
            tokens = tokens / adapter.scale
        if adapter.gain_norm:
            # gain/shape runs: normalise each emitted frame and hold its
            # gain for the decoder (last_gains), mirroring batch encode
            gains = adapter._gains(tokens)
            tokens = tokens / gains
            self._last_gains = gains
        else:
            self._last_gains = None
        return self.codec._encode_tokens(self.codec.params, tokens)

    @property
    def last_gains(self) -> jnp.ndarray | None:
        """[B, n, 1] per-frame gains of the frames the last ``push``/
        ``flush`` emitted (``None`` on non-gain-normalised codecs or when
        nothing was emitted) — side info the decoder needs."""
        return getattr(self, "_last_gains", None)

    def push(self, chunk) -> jnp.ndarray:
        chunk = jnp.asarray(chunk)
        buf = (chunk if self._carry is None
               else jnp.concatenate([self._carry, chunk], axis=1))
        total = self._consumed + int(chunk.shape[1])
        n_ready = max(0, (total - self.span) // self.hop + 1)
        n_new = n_ready - self._emitted
        if n_new > 0:
            # tokenize pads past the buffer for its own trailing frames;
            # the first n_new are exactly the batch frames
            # [emitted, n_ready) (same windowed-basis matmul on the same
            # samples), so slice and drop the padded extras.
            tokens = self.codec.adapter.strategy.tokenize(buf)[:, :n_new]
            out = self._encode_tokens(tokens)
        else:
            out = self._empty(chunk.shape[0])
            self._last_gains = None  # nothing emitted -> no side info
        keep = total - max(n_ready, self._emitted) * self.hop
        self._carry = buf[:, buf.shape[1] - keep:]
        self._consumed = total
        self._emitted = max(n_ready, self._emitted)
        return out

    def push_bytes(self, chunk, bits: int = 8) -> bytes:
        """``push`` then pack the emitted frames as one self-contained
        MACB packet (empty bytes while the lookahead fills). Composes the
        streaming and stored-format surfaces for network serving; decode
        each packet with :meth:`StreamingDecoder.push_bytes`."""
        from meanflow_audio_codec_tpu.ops.latent_quant import (
            pack_bitstream,
            quantize_latents,
        )
        latents = self.push(chunk)
        if latents.shape[1] == 0:
            return b""
        stream = quantize_latents(latents, bits=bits)
        if self.last_gains is not None:
            import dataclasses
            stream = dataclasses.replace(stream, gains=self.last_gains)
        return pack_bitstream(stream)

    def flush(self, tail=None) -> jnp.ndarray:
        """Emit the trailing zero-padded frames; resets the encoder.

        ``tail`` is an optional final partial chunk. After flush, the
        cumulative emission equals ``AudioCodec.encode`` of the whole
        pushed signal (same ``(T - W)//H + 1`` frame count, same trailing
        zero-pad).
        """
        if self._carry is None and tail is None:
            raise RuntimeError("flush() before any push()")
        parts = [] if self._carry is None else [self._carry]
        if tail is not None:
            parts.append(jnp.asarray(tail))
            self._consumed += int(parts[-1].shape[1])
        buf = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        total, emitted = self._consumed, self._emitted
        self.reset()
        nf_total = num_frames_for_length(total, self.window, self.hop)
        m = nf_total - emitted
        if m <= 0:
            return self._empty(buf.shape[0])
        needed = (m - 1) * self.hop + self.span
        pad = needed - int(buf.shape[1])
        if pad > 0:
            widths = [(0, 0), (0, pad)] + [(0, 0)] * (buf.ndim - 2)
            buf = jnp.pad(buf, widths)
        tokens = self.codec.adapter.strategy.tokenize(buf)[:, :m]
        return self._encode_tokens(tokens)


class StreamingDecoder:
    """Chunked latents -> audio with exact batch-decode parity.

    Each ``push`` of ``[B, n, latent_dim]`` runs the 1-NFE (or ``nfe``)
    dual-time decode on those frames with per-frame ``fold_in`` noise and
    overlap-adds against the carried ``2W - H`` tail, emitting the
    ``n * hop`` samples no future frame can touch. ``flush`` emits the
    final tail, completing the batch output length
    ``(nf - 1)*hop + 2W``.
    """

    def __init__(self, codec, key=None, nfe: int = 1):
        self.codec = codec
        self.window, self.hop, self.span = _geometry(codec)
        self.key = jax.random.PRNGKey(0) if key is None else key
        self.nfe = int(nfe)
        self.reset()

    def reset(self) -> None:
        self._tail = None         # [B, span - hop, ...] overlap-add carry
        self._frame_index = 0     # absolute index of the next frame
        self._batch = None        # batch size, learned from the first push

    @property
    def frames_decoded(self) -> int:
        return self._frame_index

    def _empty(self, batch: int) -> jnp.ndarray:
        """Zero-sample emission with the real output rank/channels (from
        the codec geometry, so it concatenates with data emissions)."""
        ch = self.codec._channels
        shape = (batch, 0) if ch == 1 else (batch, 0, ch)
        return jnp.zeros(shape, jnp.float32)

    def push(self, latents, gains=None) -> jnp.ndarray:
        latents = jnp.asarray(latents)
        batch, n = int(latents.shape[0]), int(latents.shape[1])
        self._batch = batch
        if n == 0:
            return self._empty(batch)
        noise_dim = self.codec.noise_dim
        noise = frame_noise(self.key, self._frame_index, n, batch, noise_dim)
        tokens = self.codec._decode_tokens(
            self.codec.params, latents, self.key, nfe=self.nfe,
            noise=noise.reshape(batch * n, noise_dim))
        # detokenize_flat overlap-adds *within* the chunk, giving the
        # (n-1)*hop + 2W segment whose cross-chunk sum the tail carries
        # (overlap-add is linear, so chunked == batch exactly; per-frame
        # gains scale tokens BEFORE the overlap-add, so gain restoration
        # is chunking-invariant too).
        seg = self.codec.adapter.detokenize_flat(
            tokens.reshape(batch * n, noise_dim), (n, noise_dim),
            gains=None if gains is None else jnp.asarray(gains))
        carry = self.span - self.hop
        if self._tail is not None:
            seg = seg.at[:, :carry].add(self._tail)
        emit = n * self.hop
        self._tail = seg[:, emit:]
        self._frame_index += n
        return seg[:, :emit]

    def push_bytes(self, packet: bytes) -> jnp.ndarray:
        """Decode one MACB packet from :meth:`StreamingEncoder.push_bytes`
        (empty packets pass through as zero emitted samples; before any
        data packet has arrived, the zero emission's batch dim defaults
        to 1 since the stream hasn't declared a batch size yet)."""
        from meanflow_audio_codec_tpu.ops.latent_quant import (
            dequantize_latents,
            unpack_bitstream,
        )
        if not packet:
            return self._empty(self._batch or 1)
        stream = unpack_bitstream(packet)
        return self.push(dequantize_latents(stream), gains=stream.gains)

    def flush(self) -> jnp.ndarray:
        """Emit the final ``2W - H`` overlap-add tail; resets the decoder."""
        if self._tail is None:
            raise RuntimeError("flush() before any push()")
        tail = self._tail
        self.reset()
        return tail


class StreamingCodec:
    """Full-duplex chunked roundtrip: audio in -> reconstructed audio out.

    Output lags input by exactly ``latency_samples = 2W - H`` (the encoder
    holds frames until fully covered; the decoder holds the overlap-add
    tail — the two latencies telescope). ``push`` chunk sizes that are
    multiples of ``hop`` keep emissions aligned and compiles to two fixed
    programs.
    """

    def __init__(self, codec, key=None, nfe: int = 1):
        self.encoder = StreamingEncoder(codec)
        self.decoder = StreamingDecoder(codec, key=key, nfe=nfe)

    @property
    def latency_samples(self) -> int:
        return self.encoder.span - self.encoder.hop

    def push(self, chunk) -> jnp.ndarray:
        latents = self.encoder.push(chunk)
        return self.decoder.push(latents, gains=self.encoder.last_gains)

    def flush(self, tail=None) -> jnp.ndarray:
        latents = self.encoder.flush(tail)
        parts = [self.decoder.push(latents, gains=self.encoder.last_gains)]
        parts.append(self.decoder.flush())
        return jnp.concatenate(parts, axis=1)

    def reset(self) -> None:
        self.encoder.reset()
        self.decoder.reset()
