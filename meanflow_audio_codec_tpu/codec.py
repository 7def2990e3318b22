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
        coeff_scale = (config.tokenization_config or {}).get(
            "coeff_scale", 1.0)
        self.adapter = TokenAdapter(strategy, "frames", scale=coeff_scale)
        self.noise_dim = config.noise_dimension
        self.latent_dim = config.latent_dimension

    # ---- construction --------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, checkpoint_path: Path | str,
                        config: TrainFlowConfig) -> "AudioCodec":
        state, model = load_flow_state(checkpoint_path, config)
        return cls(state, model, config)

    @classmethod
    def from_workdir(cls, workdir: Path | str) -> "AudioCodec":
        """Load the newest valid checkpoint + saved config from a run dir."""
        workdir = Path(workdir)
        config = load_config_from_json(workdir / "config.json")
        checkpoint = find_latest_checkpoint(workdir / "checkpoints")
        if checkpoint is None:
            raise FileNotFoundError(
                f"no checkpoint under {workdir / 'checkpoints'}")
        return cls.from_checkpoint(checkpoint, config)

    # ---- parameters ----------------------------------------------------------
    @property
    def params(self):
        """EMA params when the run tracked them (the sampling-quality set)."""
        ema = getattr(self.state, "ema_params", None)
        return ema if ema is not None else self.state.params

    # ---- compiled surfaces ---------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def _encode(self, params, audio: jnp.ndarray) -> jnp.ndarray:
        tokens = self.adapter.strategy.tokenize(audio)
        if self.adapter.scale != 1.0:
            tokens = tokens / self.adapter.scale
        b, nf, width = tokens.shape
        flat = self.state.apply_fn({"params": params},
                                   tokens.reshape(b * nf, width),
                                   method="encode")
        return flat.reshape(b, nf, -1)

    def encode(self, audio) -> jnp.ndarray:
        """[B, T, C] audio -> [B, n_frames, latent_dim] latents."""
        return self._encode(self.params, jnp.asarray(audio))

    @partial(jax.jit, static_argnums=(0, 4))
    def _decode(self, params, latents: jnp.ndarray, key,
                nfe: int) -> jnp.ndarray:
        b, nf, _ = latents.shape
        flat = sample_dual_time(self.state.apply_fn, self.noise_dim,
                                params, key,
                                latents.reshape(b * nf, -1), n_steps=nfe)
        return self.adapter.detokenize_flat(flat, (nf, self.noise_dim))

    def decode(self, latents, nfe: int = 1, key=None) -> jnp.ndarray:
        """[B, n_frames, latent_dim] -> [B, T', C] audio (1-NFE default).

        Decoding is stochastic transport from noise; pass ``key`` for
        reproducible draws (different keys give different dithers of the
        same content).
        """
        key = jax.random.PRNGKey(0) if key is None else key
        return self._decode(self.params, jnp.asarray(latents), key, int(nfe))

    def roundtrip(self, audio, nfe: int = 1, key=None) -> jnp.ndarray:
        """encode + decode; the reconstruction the quality metrics score."""
        return self.decode(self.encode(audio), nfe=nfe, key=key)

    # ---- metadata ------------------------------------------------------------
    @property
    def frames_per_second(self) -> float:
        """Latent frame rate at the configured sample rate (44.1 kHz)."""
        cfg = self.config.tokenization_config or {}
        hop = cfg.get("hop_size") or cfg.get("window_size", 576) // 2
        return 44100.0 / hop

    @property
    def compression_ratio(self) -> float:
        """Raw samples-per-frame / latent dims-per-frame (f32 latents)."""
        cfg = self.config.tokenization_config or {}
        hop = cfg.get("hop_size") or cfg.get("window_size", 576) // 2
        channels = 2
        return (hop * channels) / float(self.latent_dim)
