#!/bin/bash
# Regenerate the committed PST-demo artifact end-to-end with competently
# trained learned-inference baselines (VERDICT r3 #1) plus the downstream
# eval artifacts that consume the same trained encoder (#4).
#
# Each phase runs in its own process: the axon relay leaks host RSS per
# upload (PERF_NOTES.md "Relay host-memory leak"), so process recycling
# between long phases is the mitigation.
#
#   bash scripts/regen_pst_artifact.sh [OUT_DIR]
set -e
cd "$(dirname "$0")/.."
OUT=${1:-examples/pst_demo_full}

echo "=== phase 1: pst_full_demo (encoder + 2 style systems + benchmark) ==="
python examples/pst_full_demo.py --out "$OUT" \
  --encoder-steps 3000 --data-examples 1536 --num-presets 10 \
  --embed-dim 256 \
  --style-steps 4000 --style-batch 16 \
  --es-iters 25 --popsize 128 --gens-per-dispatch 5 \
  --sources-per-mode 2 \
  --psm-examples 48 --psm-distractors 10

echo "=== phase 2: style-es seed noise ==="
python examples/pst_seed_noise.py --out "$OUT" --seeds 3 --examples-per-mode 4

echo "=== phase 3: figures + method table ==="
python examples/pst_demo_figs.py --out "$OUT"

echo "=== phase 4: eval suite (cls/synthetic/sweep/recovery) ==="
python examples/eval_suite_demo.py --encoder "$OUT/run/encoder.npz"

echo "=== done ==="
