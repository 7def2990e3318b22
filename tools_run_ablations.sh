#!/bin/bash
# Run the ablation matrix (or a named subset) at the matrix_mnist 2k-step
# budget (VERDICT r2 item 6). Evaluation runs separately
# (tools.evaluate_all; can run on the CPU backend while the TPU trains).
set -u
cd /root/repo
BUDGET="${BUDGET:-2000}"
SUBSET="${@:-$(ls configs/ablations | sed 's/\.json$//')}"
for name in $SUBSET; do
  cfg="configs/ablations/${name}.json"
  [ -f "$cfg" ] || { echo "missing $cfg"; continue; }
  wd=$(python -c "import json; print(json.load(open('$cfg'))['training']['workdir'])")
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
echo DONE
