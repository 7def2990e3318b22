"""User-facing audio codec API: encode audio -> latents, decode -> audio.

The reference frames the codec as a training/eval harness only (README.md:
3-7 — encoder + conditional-flow "stochastic post-filter" decoder); this
module adds the missing product surface on top of a trained run: a single
object exposing ``encode``/``decode``/``roundtrip`` as jit-compiled
programs, defaulting to EMA params and the 1-NFE dual-time decode.

    codec = AudioCodec.from_workdir("outputs/imf_audio_quality")
    latents = codec.encode(audio)        # [B, n_frames, latent_dim]
    recon = codec.decode(latents)        # [B, T, C], one model call
    recon = codec.roundtrip(audio)       # encode + decode fused in one jit

Per-frame layout (SURVEY.md §5.7): each MDCT frame is an independent batch
row, so the latent sequence length scales with audio length while every
compiled program sees only flat [rows, width] tensors.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp

from meanflow_audio_codec_tpu.configs import (
    TrainFlowConfig,
    load_config_from_json,
)
from meanflow_audio_codec_tpu.ops.sampling import sample_dual_time
from meanflow_audio_codec_tpu.ops.tokenize import create_tokenization_strategy
from meanflow_audio_codec_tpu.training.checkpoints import (
    find_latest_checkpoint,
)
from meanflow_audio_codec_tpu.training.trainer import (
    TokenAdapter,
    adapter_from_config,
    load_flow_state,
    resolve_flatten_mode,
)


class AudioCodec:
    """A trained mean-flow codec: tokenizer + encoder + 1-NFE flow decoder."""

    def __init__(self, state, model, config: TrainFlowConfig):
        if resolve_flatten_mode(config) != "frames":
            raise ValueError(
                "AudioCodec requires the per-frame token layout "
                "(audio dataset + mdct tokenization); got flatten mode "
                f"{resolve_flatten_mode(config)!r}")
        self.state = state
        self.model = model
        self.config = config
        strategy = create_tokenization_strategy(config.tokenization_strategy,
                                                config.tokenization_config)
        self.adapter = adapter_from_config(config, strategy, "frames")
        self.noise_dim = config.noise_dimension
        self.latent_dim = config.latent_dimension
        self._build_compiled()

    # ---- construction --------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, checkpoint_path: Path | str,
                        config: TrainFlowConfig,
                        quantized: bool = False) -> "AudioCodec":
        """``quantized`` serves the bf16 checkpoint through the dynamic
        W8A8 int8 decode path (ops/quant.py) — same param tree, ~int8-MXU
        decode throughput; the encoder stays bf16."""
        if quantized:
            options = dict(config.model.architecture_options or {})
            options["quantized"] = True
            config.model.architecture_options = options
        state, model = load_flow_state(checkpoint_path, config)
        return cls(state, model, config)

    @classmethod
    def from_workdir(cls, workdir: Path | str,
                     quantized: bool = False) -> "AudioCodec":
        """Load the newest valid checkpoint + saved config from a run dir."""
        workdir = Path(workdir)
        config = load_config_from_json(workdir / "config.json")
        checkpoint = find_latest_checkpoint(workdir / "checkpoints")
        if checkpoint is None:
            # disaster-recovery path: full checkpoints are untracked and
            # die with the host; the git-committed serving artifact
            # (EMA params only) is enough for every inference surface
            from meanflow_audio_codec_tpu.training.checkpoints import (
                find_latest_serving_checkpoint,
            )
            checkpoint = find_latest_serving_checkpoint(
                workdir / "checkpoints")
        if checkpoint is None:
            raise FileNotFoundError(
                f"no checkpoint under {workdir / 'checkpoints'}")
        return cls.from_checkpoint(checkpoint, config, quantized=quantized)

    # ---- parameters ----------------------------------------------------------
    @property
    def params(self):
        """EMA params when the run tracked them (the sampling-quality set)."""
        ema = getattr(self.state, "ema_params", None)
        return ema if ema is not None else self.state.params

    # ---- compiled surfaces ---------------------------------------------------
    # Built per-instance (not @jit methods with a static self): a static
    # self would pin every AudioCodec — and its full on-device TrainState —
    # in the global jit cache for the life of the process.
    def _build_compiled(self):
        apply_fn, adapter, noise_dim = (self.state.apply_fn, self.adapter,
                                        self.noise_dim)

        @jax.jit
        def encode_tokens_fn(params, tokens):
            """[B, nf, width] scaled coeff tokens -> [B, nf, latent_dim]."""
            b, nf, width = tokens.shape
            flat = apply_fn({"params": params},
                            tokens.reshape(b * nf, width), method="encode")
            return flat.reshape(b, nf, -1)

        @jax.jit
        def encode_fn(params, audio):
            """audio -> (latents, per-frame gains). Gains are all-ones
            unless the run trained gain-normalised (adapter.gain_norm)."""
            tokens = adapter.strategy.tokenize(audio)
            if adapter.scale != 1.0:
                tokens = tokens / adapter.scale
            if adapter.gain_norm:
                gains = adapter._gains(tokens)
                tokens = tokens / gains
            else:
                gains = jnp.ones(tokens.shape[:2] + (1,), tokens.dtype)
            return encode_tokens_fn(params, tokens), gains

        @partial(jax.jit, static_argnames=("nfe",))
        def decode_tokens_fn(params, latents, key, nfe, noise=None):
            """[B, nf, latent_dim] -> [B, nf, width] scaled coeff tokens.

            ``noise`` ([B*nf, noise_dim]) overrides the key draw — the
            streaming decoder passes per-frame fold_in noise so chunked
            decodes match the batch decode (streaming.py).
            """
            b, nf, _ = latents.shape
            flat = sample_dual_time(apply_fn, noise_dim, params, key,
                                    latents.reshape(b * nf, -1), n_steps=nfe,
                                    noise=noise)
            return flat.reshape(b, nf, noise_dim)

        @partial(jax.jit, static_argnames=("nfe",))
        def decode_fn(params, latents, key, nfe, gains=None):
            nf = latents.shape[1]
            tokens = decode_tokens_fn(params, latents, key, nfe)
            return adapter.detokenize_flat(
                tokens.reshape(-1, noise_dim), (nf, noise_dim), gains=gains)

        self._encode, self._decode = encode_fn, decode_fn
        self._encode_tokens, self._decode_tokens = (encode_tokens_fn,
                                                    decode_tokens_fn)

    def encode(self, audio) -> jnp.ndarray:
        """[B, T, C] audio -> [B, n_frames, latent_dim] latents.

        On gain-normalised runs the latents describe unit-RMS frame
        *shapes*; use :meth:`encode_with_gains` to also get the per-frame
        gains the decode needs (``roundtrip``/``encode_packed`` handle
        this internally).
        """
        return self._encode(self.params, jnp.asarray(audio))[0]

    def encode_with_gains(self, audio) -> tuple[jnp.ndarray, jnp.ndarray]:
        """audio -> (latents [B, nf, latent_dim], gains [B, nf, 1])."""
        return self._encode(self.params, jnp.asarray(audio))

    def decode(self, latents, nfe: int = 1, key=None,
               gains=None) -> jnp.ndarray:
        """[B, n_frames, latent_dim] -> [B, T', C] audio (1-NFE default).

        Decoding is stochastic transport from noise; pass ``key`` for
        reproducible draws (different keys give different dithers of the
        same content). ``gains`` restores per-frame energy on
        gain-normalised runs; ``None`` decodes at unit frame RMS (the
        generative-sampling convention).
        """
        key = jax.random.PRNGKey(0) if key is None else key
        gains = None if gains is None else jnp.asarray(gains)
        return self._decode(self.params, jnp.asarray(latents), key,
                            nfe=int(nfe), gains=gains)

    def roundtrip(self, audio, nfe: int = 1, key=None) -> jnp.ndarray:
        """encode + decode; the reconstruction the quality metrics score."""
        latents, gains = self.encode_with_gains(audio)
        return self.decode(latents, nfe=nfe, key=key,
                           gains=gains if self.adapter.gain_norm else None)

    def streaming(self, key=None, nfe: int = 1):
        """Full-duplex chunked codec (streaming.py): bounded memory,
        fixed 2W-H latency, exact batch parity."""
        from meanflow_audio_codec_tpu.streaming import StreamingCodec
        return StreamingCodec(self, key=key, nfe=nfe)

    # ---- bitstream (stored format) --------------------------------------------
    def encode_packed(self, audio, bits: int = 8,
                      step_frac: float | None = None):
        """audio -> quantized LatentBitstream (the stored codec format).

        Default: per-frame symmetric scalar quantization at ``bits``
        (ops/latent_quant.py); ``bitrate_kbps(bits)`` is the resulting
        storage rate. ``step_frac`` switches to the rate-aware
        mean-removed ECSQ format (MACB v2) — the continuous rate knob
        (smaller = higher rate/quality; 0.5 ~ 140 kbps on the v2 codec).
        """
        import dataclasses

        from meanflow_audio_codec_tpu.ops.latent_quant import (
            dequantize_gains,
            quantize_gains,
            quantize_latents,
            quantize_latents_ecsq,
        )
        latents, gains = self.encode_with_gains(audio)
        if step_frac is not None:
            stream = quantize_latents_ecsq(latents, step_frac=step_frac)
        else:
            stream = quantize_latents(latents, bits=bits)
        if self.adapter.gain_norm:
            # store the gains the byte format will carry (8-bit log grid),
            # so in-memory and from-bytes decodes are bit-identical
            stream = dataclasses.replace(
                stream, gains=jnp.asarray(dequantize_gains(
                    quantize_gains(jax.device_get(gains)))))
        return stream

    def decode_packed(self, bitstream, nfe: int = 1, key=None) -> jnp.ndarray:
        """LatentBitstream -> audio; the 1-NFE flow doubles as the
        dequantization post-filter."""
        from meanflow_audio_codec_tpu.ops.latent_quant import (
            dequantize_latents,
        )
        return self.decode(dequantize_latents(bitstream), nfe=nfe, key=key,
                           gains=bitstream.gains)

    def bitrate_kbps(self, bits: int = 8) -> float:
        """Nominal stored bitrate (codes + per-frame scale), before
        entropy coding; ``encode_bytes`` gives the measured rate."""
        from meanflow_audio_codec_tpu.ops.latent_quant import bitstream_kbps
        return bitstream_kbps(self.latent_dim, self.frames_per_second,
                              bits=bits)

    def encode_bytes(self, audio, bits: int = 8,
                     step_frac: float | None = None) -> bytes:
        """audio -> actual stored bytes (quantize + native rANS entropy
        coding when available). The full codec write path; ``step_frac``
        selects the rate-aware ECSQ format (see ``encode_packed``)."""
        from meanflow_audio_codec_tpu.ops.latent_quant import pack_bitstream
        return pack_bitstream(
            self.encode_packed(audio, bits=bits, step_frac=step_frac))

    def decode_bytes(self, data: bytes, nfe: int = 1, key=None):
        """Stored bytes -> audio. The full codec read path."""
        from meanflow_audio_codec_tpu.ops.latent_quant import (
            unpack_bitstream,
        )
        return self.decode_packed(unpack_bitstream(data), nfe=nfe, key=key)

    # ---- metadata ------------------------------------------------------------
    @property
    def _hop(self) -> int:
        """True hop from the built tokenizer (not the raw config dict)."""
        return int(self.adapter.strategy.config.hop_size)

    @property
    def _channels(self) -> int:
        """Audio channels implied by the frame token width."""
        window = int(self.adapter.strategy.config.window_size)
        return max(1, self.noise_dim // window)

    @property
    def frames_per_second(self) -> float:
        """Latent frame rate at the framework sample rate (44.1 kHz)."""
        from meanflow_audio_codec_tpu.data.audio import TARGET_SAMPLE_RATE
        return TARGET_SAMPLE_RATE / self._hop

    @property
    def compression_ratio(self) -> float:
        """Raw samples-per-frame / latent dims-per-frame (f32 latents)."""
        return (self._hop * self._channels) / float(self.latent_dim)
