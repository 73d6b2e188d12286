"""Scaled metric-quality evidence: longer pretext training + PSM curves
with an MFCC baseline (VERDICT r3 #4 — the committed metric-quality
artifacts were demo-scale; the relay-leak mitigations that made longer
runs feasible are the device-resident pool + k-step scan blocks of
examples/train_demo.py, PERF_NOTES "Relay host-memory leak").

Trains the pretext encoder substantially longer than the PST demo
(default 12000 steps vs 3000), then evaluates the Parameter-Sensitivity
Metric accuracy-vs-distractors for BOTH the trained metric and the MFCC
baseline on the same quadruplets (reference: scripts/eval/eval_psm.py
evaluate_model:87-154), in intra- and inter-effect conditions.

    python examples/metric_scale_demo.py [--out examples/metric_scale]

Follow with examples/eval_suite_demo.py --encoder <out>/run/encoder.npz
for the classification/sweep/recovery suite on the same encoder
(scripts/regen_metric_scale.sh runs both, process-recycled).
"""

import argparse
import json
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.dirname(_HERE))
from pst_full_demo import get_or_train_encoder  # noqa: E402
from train_demo import synth_sources  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default="examples/metric_scale")
    parser.add_argument("--encoder-steps", type=int, default=12000)
    parser.add_argument("--data-examples", type=int, default=1536)
    parser.add_argument("--num-presets", type=int, default=10)
    parser.add_argument("--embed-dim", type=int, default=256)
    parser.add_argument("--base-channels", type=int, default=32)
    parser.add_argument("--psm-examples", type=int, default=96)
    parser.add_argument("--psm-distractors", type=int, default=10)
    args = parser.parse_args()

    from st_ito_tpu.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    os.makedirs(args.out, exist_ok=True)
    sources = synth_sources(n=28)

    model = get_or_train_encoder(
        args.out, sources, args.encoder_steps, args.data_examples,
        num_presets=args.num_presets, embed_dim=args.embed_dim,
        base_channels=args.base_channels)
    print("trained encoder ready", flush=True)

    from st_ito_tpu.eval.psm import (
        evaluate_metric_on_quadruplets,
        generate_psm_quadruplets,
    )
    from st_ito_tpu.models.registry import (
        get_mfcc_feature_embeds,
        get_param_embeds,
        load_mfcc_feature_extractor,
    )

    mfcc = load_mfcc_feature_extractor()
    summary = {"encoder_steps": args.encoder_steps,
               "psm_examples": args.psm_examples, "psm": {}}
    for condition in ("intra-effect", "inter-effect"):
        quads = generate_psm_quadruplets(
            sources[20:], num_examples=args.psm_examples,
            num_distractors=args.psm_distractors, length=131072, seed=7,
            condition=condition)
        res = {
            "param (trained)": evaluate_metric_on_quadruplets(
                quads, model, get_param_embeds),
            "mfcc (baseline)": evaluate_metric_on_quadruplets(
                quads, mfcc, get_mfcc_feature_embeds),
        }
        summary["psm"][condition] = res
        for name, r in res.items():
            accs = r["accuracy_by_distractors"]
            print(f"[{condition}] {name}: "
                  f"@1={accs[1]:.3f} @5={accs[5]:.3f} @10={accs[10]:.3f}",
                  flush=True)

    with open(os.path.join(args.out, "psm_summary.json"), "w") as f:
        json.dump(summary, f, indent=2, default=float)
    print(f"results in {args.out}")


if __name__ == "__main__":
    main()
