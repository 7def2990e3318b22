#!/bin/bash
# Run the 24-config ablation matrix at the matrix_mnist 2k-step budget,
# then evaluate -> aggregate -> tables (VERDICT r2 item 6).
set -u
cd /root/repo
BUDGET="${1:-2000}"
for cfg in configs/ablations/*.json; do
  name=$(basename "$cfg" .json)
  wd=$(python -c "import json,sys; print(json.load(open('$cfg'))['training']['workdir'])")
  if [ -f "$wd/summary.json" ]; then
    echo "skip $name (summary exists)"
    continue
  fi
  echo "=== $name ==="
  timeout 900 python -u train.py --config "$cfg" --n-steps "$BUDGET" \
    > "/tmp/ablation_${name}.log" 2>&1
  rc=$?
  tail -2 "/tmp/ablation_${name}.log"
  [ $rc -ne 0 ] && echo "FAILED $name rc=$rc"
done
echo "=== evaluate_all ==="
timeout 3600 python -u -m meanflow_audio_codec_tpu.tools.evaluate_all \
  --configs configs/ablations --nfe 1 10 --num-samples 32 \
  --csv outputs/ablations/metrics.csv 2>&1 | tail -30
echo "=== aggregate + tables ==="
timeout 600 python -u -m meanflow_audio_codec_tpu.tools.aggregate_results \
  --csv outputs/ablations/metrics.csv --out outputs/ablations/aggregate.json
timeout 600 python -u -m meanflow_audio_codec_tpu.tools.generate_tables \
  --csv outputs/ablations/metrics.csv --out-dir outputs/ablations/tables
echo DONE
