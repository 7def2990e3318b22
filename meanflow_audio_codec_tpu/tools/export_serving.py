"""Export a git-committable serving checkpoint from a finished run.

Loads the newest full checkpoint in ``<workdir>/checkpoints`` and writes
``serving_step_{N}.msgpack`` beside it — the sampling-quality param set
(EMA when tracked) with no optimizer state, ~1/4 the size of a full
TrainState. Committing this file makes the trained artifact survive a
host restore from git: ``AudioCodec.from_workdir`` falls back to it when
no full checkpoint exists.

Usage:  python -m meanflow_audio_codec_tpu.tools.export_serving \
            --workdir outputs/imf_frontier_v2
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--workdir", required=True)
    args = parser.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side IO, no TPU needed

    from meanflow_audio_codec_tpu.configs.config import load_config_from_json
    from meanflow_audio_codec_tpu.training.checkpoints import (
        find_latest_checkpoint,
        save_serving_checkpoint,
    )
    from meanflow_audio_codec_tpu.training.trainer import load_flow_state

    workdir = Path(args.workdir)
    checkpoint_dir = workdir / "checkpoints"
    checkpoint = find_latest_checkpoint(checkpoint_dir)
    if checkpoint is None:
        print(f"no full checkpoint under {checkpoint_dir}")
        return 1
    config = load_config_from_json(workdir / "config.json")
    state, _ = load_flow_state(checkpoint, config)
    path = save_serving_checkpoint(state, checkpoint_dir)
    print(f"wrote {path} ({path.stat().st_size / 1e6:.1f} MB) "
          f"from {checkpoint.name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
