"""Batch evaluation runner (reference: meanflow_audio_codec/tools/
evaluate_all.py:21-309): glob configs -> find each run's latest checkpoint
-> load real data -> ComprehensiveEvaluator -> aggregate one CSV row per
(config, NFE)."""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from meanflow_audio_codec_tpu.configs import load_config_from_json
from meanflow_audio_codec_tpu.evaluators.comprehensive_evaluator import (
    ComprehensiveEvaluator,
    DEFAULT_NFE_SWEEP,
)
from meanflow_audio_codec_tpu.training.checkpoints import (
    find_latest_checkpoint,
)
from meanflow_audio_codec_tpu.training.logging import append_metrics_csv


def find_checkpoint_for(config) -> Path | None:
    workdir = Path(config.workdir)
    return find_latest_checkpoint(workdir / "checkpoints")


def load_real_data(config, num_samples: int,
                   synthetic_family: str | None = None) -> np.ndarray:
    """Held-out raw data for conditioning + quality metrics.

    Synthetic eval draws come from the generator family named by
    ``synthetic_family`` (else the config's ``tokenization_config``
    choice) at ``seed+1`` — unseen draws from the training family, or an
    entirely unseen family when overridden (cross-family generalization).
    """
    if config.dataset == "audio":
        from meanflow_audio_codec_tpu.data.audio import (
            build_audio_pipeline,
            synthetic_pipeline_for_family,
        )
        tok_cfg = config.tokenization_config or {}
        frame_size = tok_cfg.get("frame_size", 65536)
        if config.data_dir and Path(config.data_dir).exists():
            pipeline = build_audio_pipeline(
                config.data_dir, seed=config.seed + 1,
                frame_size=frame_size, batch_size=num_samples)
        else:
            family = synthetic_family or tok_cfg.get("synthetic_family")
            pipeline = synthetic_pipeline_for_family(
                family, seed=config.seed + 1, frame_size=frame_size,
                batch_size=num_samples)
        return next(iter(pipeline))
    from meanflow_audio_codec_tpu.data.mnist import load_mnist
    _, test_iter = load_mnist(batch_size=num_samples, seed=config.seed)
    return next(test_iter)


def evaluate_config(config_path: Path, nfe_list: list[int],
                    num_samples: int, csv_path: Path | None,
                    synthetic_family: str | None = None,
                    results_name: str = "evaluation_results.json",
                    quantized: bool = False,
                    latent_bits: int | None = None,
                    latent_step: float | None = None,
                    timing_runs: int = 5) -> dict | None:
    config = load_config_from_json(config_path)
    if quantized:
        # serve the bf16 checkpoint through the dynamic-int8 decode path
        # (ops/quant.py) — identical param tree, so the load is unchanged
        options = dict(config.model.architecture_options or {})
        options["quantized"] = True
        config.model.architecture_options = options
    checkpoint = find_checkpoint_for(config)
    if checkpoint is None:
        print(f"skip {config_path.name}: no checkpoint under "
              f"{config.workdir}")
        return None
    data = load_real_data(config, num_samples,
                          synthetic_family=synthetic_family)
    evaluator = ComprehensiveEvaluator(checkpoint, config, nfe_list=nfe_list,
                                       num_samples=num_samples,
                                       latent_bits=latent_bits,
                                       latent_step=latent_step,
                                       timing_runs=timing_runs)
    results = evaluator.evaluate(data)
    results_path = Path(config.workdir) / results_name
    evaluator.save_results(results, results_path)
    if csv_path is not None:
        for nfe_key, entry in results["nfe_sweep"].items():
            row = {
                "config": config_path.stem,
                "method": config.method,
                "architecture": config.architecture,
                "dataset": config.dataset,
                "tokenization": config.tokenization_strategy,
                "nfe": nfe_key,
                "param_count": results["param_count"],
                "inference_mean_sec": entry["inference"]["mean_sec"],
            }
            for metric in ("mse", "psnr_db", "ssim", "fid_pixel",
                           "kid_pixel", "spectral_distance", "si_snr_db",
                           "stoi", "pesq"):
                if metric in entry:
                    row[metric] = entry[metric]
            append_metrics_csv(csv_path, row)
    print(f"evaluated {config_path.name}: "
          f"{json.dumps({k: round(v['mse'], 5) for k, v in results['nfe_sweep'].items()})}")
    return results


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="Evaluate all trained configs")
    parser.add_argument("--configs", type=Path, default=Path("configs"),
                        help="directory of config JSONs (globbed *.json)")
    parser.add_argument("--nfe", type=int, nargs="+",
                        default=list(DEFAULT_NFE_SWEEP))
    parser.add_argument("--num-samples", type=int, default=64)
    parser.add_argument("--csv", type=Path, default=Path("metrics.csv"))
    parser.add_argument("--synthetic-family", type=str, default=None,
                        help="override the synthetic eval generator family "
                             "(e.g. 'rich') for cross-family generalization")
    parser.add_argument("--results-name", type=str,
                        default="evaluation_results.json",
                        help="per-workdir results filename (use e.g. "
                             "evaluation_results_rich.json so a cross-family "
                             "pass never clobbers the in-family results)")
    parser.add_argument("--quantized", action="store_true",
                        help="serve checkpoints through the int8 W8A8 "
                             "decode path (convnet family only)")
    parser.add_argument("--latent-bits", type=int, default=None,
                        choices=(4, 8, 16),
                        help="decode from the scalar-quantized latent "
                             "bitstream (ops/latent_quant.py) instead of "
                             "float latents — the stored-format quality")
    parser.add_argument("--latent-step", type=float, default=None,
                        help="decode from the rate-aware ECSQ bitstream "
                             "(MACB v2) at this step fraction of the "
                             "per-frame residual std — the continuous "
                             "rate knob (takes precedence over "
                             "--latent-bits)")
    parser.add_argument("--timing-runs", type=int, default=5,
                        help="repetitions for the inference-latency "
                             "benchmark; 0 skips timing entirely "
                             "(metrics-only mode for slow backends)")
    args = parser.parse_args(argv)

    config_paths = sorted(args.configs.glob("*.json"))
    if not config_paths:
        print(f"no configs under {args.configs}")
        return 1
    evaluated = 0
    for path in config_paths:
        try:
            if evaluate_config(path, args.nfe, args.num_samples, args.csv,
                               synthetic_family=args.synthetic_family,
                               results_name=args.results_name,
                               quantized=args.quantized,
                               latent_bits=args.latent_bits,
                               latent_step=args.latent_step,
                               timing_runs=args.timing_runs) is not None:
                evaluated += 1
        except Exception as exc:
            print(f"FAILED {path.name}: {exc}")
    print(f"Evaluated {evaluated}/{len(config_paths)} configs -> {args.csv}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
