#!/usr/bin/env python
"""Standalone audio autoencoder: MLPMixerAutoencoder over MDCT frame tokens
(reference: meanflow_audio_codec/proj/audio_autoencoder/train.py).

Run: python proj/audio_autoencoder/train.py [--data-dir DIR] [--steps 1000]
Falls back to the synthetic audio source without --data-dir.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--frame-size", type=int, default=16384)
    parser.add_argument("--window-size", type=int, default=256)
    parser.add_argument("--data-dir", type=Path, default=None)
    parser.add_argument("--workdir", type=Path,
                        default=Path("outputs/audio_autoencoder"))
    args = parser.parse_args()

    from meanflow_audio_codec_tpu.data.audio import (
        build_audio_pipeline,
        synthetic_audio_pipeline,
        write_wav,
    )
    from meanflow_audio_codec_tpu.models import (
        MLPMixerAutoencoder,
        TrainState,
    )
    from meanflow_audio_codec_tpu.ops import MDCTConfig, MDCTTokenization
    from meanflow_audio_codec_tpu.training import (
        AutoencoderObjective,
        make_train_step,
    )

    tok = MDCTTokenization(config=MDCTConfig(window_size=args.window_size,
                                             normalize=True))
    token_dim = args.window_size * 2  # stereo

    class FrameAdapter:
        """Tokenize audio and fold MDCT frames into the batch axis."""

        def tokenize(self, x):
            tokens = tok.tokenize(x)
            self.shape = tokens.shape
            return tokens.reshape(-1, tokens.shape[-1])

    adapter = FrameAdapter()
    model = MLPMixerAutoencoder(input_dim=token_dim, num_latent_tokens=8,
                                latent_dim=64, num_context_tokens=32,
                                num_output_tokens=32, token_mix_dim=256,
                                channel_mix_dim=256, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((4, token_dim))))(rng)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              tx=optax.adamw(1e-4))

    if args.data_dir and args.data_dir.exists():
        data = build_audio_pipeline(args.data_dir, frame_size=args.frame_size,
                                    batch_size=args.batch_size)
    else:
        print("using synthetic audio source")
        data = synthetic_audio_pipeline(frame_size=args.frame_size,
                                        batch_size=args.batch_size)

    step = make_train_step(AutoencoderObjective(direct_call=True),
                           tokenizer=adapter, flatten=False, donate=True)
    for i in range(args.steps):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, sub, jnp.asarray(next(data)))
        if i % 100 == 0:
            print(f"step {i}: mse={float(metrics['mse']):.5f}")

    # reconstruct one held-out clip end-to-end through the codec
    clip = jnp.asarray(next(data))
    tokens = tok.tokenize(clip)
    b, nf, width = tokens.shape
    recon_tokens = state.apply_fn({"params": state.params},
                                  tokens.reshape(-1, width))
    audio = tok.detokenize(recon_tokens.reshape(b, nf, width)
                           .astype(jnp.float32))
    args.workdir.mkdir(parents=True, exist_ok=True)
    write_wav(args.workdir / "reconstruction.wav",
              np.asarray(audio[0], dtype=np.float32))
    print(f"wrote {args.workdir / 'reconstruction.wav'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
