#!/bin/bash
# Scaled metric-quality evidence (VERDICT r3 #4): 12k-step pretext
# encoder, PSM curves vs MFCC in both conditions, then the full eval
# suite on the same encoder. Phases run in separate processes (the axon
# relay leaks host RSS per upload — PERF_NOTES.md).
#
#   bash scripts/regen_metric_scale.sh [OUT_DIR]
set -e
cd "$(dirname "$0")/.."
OUT=${1:-examples/metric_scale}

echo "=== phase 1: encoder (12k steps) + PSM vs MFCC ==="
python examples/metric_scale_demo.py --out "$OUT"

echo "=== phase 2: eval suite on the scaled encoder ==="
python examples/eval_suite_demo.py --encoder "$OUT/run/encoder.npz" \
  --out "$OUT/eval_suite"

echo "=== done ==="
