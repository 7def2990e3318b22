"""Evaluate the ablation runs on the CPU backend.

The single TPU chip is usually owned by a long training run; the ablation
models are small MLPs, so the NFE sweep + pixel metrics run fine on host
CPU. Forces the CPU platform in-process (env vars cannot override the
axon plugin — see tests/conftest.py for the same pattern).

Usage: python tools_eval_ablations_cpu.py [extra evaluate_all args]
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

from meanflow_audio_codec_tpu.tools.evaluate_all import main  # noqa: E402

if __name__ == "__main__":
    args = ["--configs", "configs/ablations", "--nfe", "1", "10",
            "--num-samples", "32", "--csv", "outputs/ablations/metrics.csv",
            *sys.argv[1:]]
    raise SystemExit(main(args))
