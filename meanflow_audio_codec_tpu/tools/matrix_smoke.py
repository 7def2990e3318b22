"""Matrix smoke: train every generated config for a few steps.

Proves the full method x architecture x tokenization x dataset matrix is
runnable end to end (config load -> model build -> fused step -> sampling
-> checkpoint) by running each config with tiny overrides in one process
(the jit cache amortises compiles across same-shape configs).

    python -m meanflow_audio_codec_tpu.tools.matrix_smoke \
        --configs configs --out /tmp/matrix_smoke
"""

from __future__ import annotations

import argparse
import json
import time
import traceback
from pathlib import Path

TINY_OVERRIDES = {
    "base": {"n_steps": 2, "batch_size": 4},
    "model": {"num_blocks": 1, "condition_dimension": 16,
              "latent_dimension": 8},
    "training": {"sample_every": 2, "sample_steps": 1,
                 "max_checkpoints_to_keep": 1},
}
# tiny frames keep features-mode configs (audio+reshape flattens frames x
# channels into one vector; mixer stages are quadratic in the flat width)
# at smoke-able sizes
AUDIO_TOK = {"frame_size": 512, "window_size": 256, "patch_length": 128}


def smoke_one(config_path: Path, out_root: Path) -> tuple[bool, str, float]:
    from meanflow_audio_codec_tpu.configs import (
        load_config_from_json,
        merge_configs,
    )
    from meanflow_audio_codec_tpu.training.trainer import train_flow

    config = load_config_from_json(config_path)
    overrides = json.loads(json.dumps(TINY_OVERRIDES))  # deep copy
    overrides["training"]["workdir"] = str(out_root / config_path.stem)
    if config.dataset == "audio":
        tok = dict(config.tokenization_config or {})
        tok.update(AUDIO_TOK)
        overrides["dataset"] = {"tokenization_config": tok}
    config = merge_configs(config, overrides)
    t0 = time.perf_counter()
    summary = train_flow(config)
    elapsed = time.perf_counter() - t0
    import math
    final = summary.get("loss", {}).get("final")
    if final is None or not math.isfinite(final):
        return False, f"non-finite final loss {final}", elapsed
    return True, f"loss {final:.4f}", elapsed


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="Smoke-train every config")
    parser.add_argument("--configs", type=Path, default=Path("configs"))
    parser.add_argument("--out", type=Path, default=Path("/tmp/matrix_smoke"))
    parser.add_argument("--filter", type=str, default=None,
                        help="substring filter on config names")
    parser.add_argument("--report", type=Path, default=None,
                        help="write a JSON report here")
    args = parser.parse_args(argv)

    paths = sorted(args.configs.glob("*.json"))
    if args.filter:
        paths = [p for p in paths if args.filter in p.name]
    results = []
    passed = 0
    for i, path in enumerate(paths):
        try:
            ok, note, elapsed = smoke_one(path, args.out)
        except Exception as exc:
            ok, note, elapsed = False, f"{type(exc).__name__}: {exc}", 0.0
            traceback.print_exc()
        passed += ok
        status = "PASS" if ok else "FAIL"
        print(f"[{i+1:2d}/{len(paths)}] {status} {path.stem} "
              f"({elapsed:5.1f}s) {note}", flush=True)
        results.append({"config": path.stem, "ok": ok, "note": note,
                        "seconds": round(elapsed, 1)})
    print(f"\n{passed}/{len(paths)} configs train end-to-end")
    if args.report:
        args.report.parent.mkdir(parents=True, exist_ok=True)
        args.report.write_text(json.dumps(results, indent=2))
    return 0 if passed == len(paths) else 1


if __name__ == "__main__":
    raise SystemExit(main())
