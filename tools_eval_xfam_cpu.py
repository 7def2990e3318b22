"""Cross-family generalization eval on the CPU backend.

Evaluates quality-run checkpoints on the `rich` synthetic family they
never trained on (VERDICT r2 item 5) while the TPU is owned by training.
Usage: python tools_eval_xfam_cpu.py <configs_dir> [extra args]
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

from meanflow_audio_codec_tpu.tools.evaluate_all import main  # noqa: E402

if __name__ == "__main__":
    configs_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xfam_cfgs"
    args = ["--configs", configs_dir, "--nfe", "1", "--num-samples", "64",
            "--csv", "/tmp/xfam.csv", "--synthetic-family", "rich",
            "--results-name", "evaluation_results_rich.json",
            *sys.argv[2:]]
    raise SystemExit(main(args))
