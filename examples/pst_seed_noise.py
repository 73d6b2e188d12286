"""Seed-noise quantification for the PST demo's style-es method.

VERDICT r2 asks the committed benchmark to show method separation
"exceeding seed noise". This script re-runs style-es with multiple CMA-ES
seeds on a subset of the demo's contrived examples (using the SAME trained
encoder/metric the demo committed) and appends per-mode seed statistics to
``summary.json``:

    summary["style_es_seed_noise"][mode] = {
        "examples": {name: {"sims": [...], "mean": m, "std": s}},
        "mean_std": pooled per-example std,
        "max_std": worst-case per-example std,
    }

The claim "style-es beats input by more than seed noise" then reads
directly off summary.json: (style-es mean − input mean) vs mean_std.

Run AFTER examples/pst_full_demo.py has produced run/encoder.npz:

    python examples/pst_seed_noise.py [--seeds 3] [--examples-per-mode 4]
"""

import argparse
import json
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.dirname(_HERE))
from train_demo import synth_sources  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default="examples/pst_demo_full")
    parser.add_argument("--seeds", type=int, default=3)
    parser.add_argument("--examples-per-mode", type=int, default=4)
    parser.add_argument("--sources-per-mode", type=int, default=4,
                        help="must match the demo run (example numbering)")
    parser.add_argument("--psm-examples", type=int, default=48,
                        help="0 disables the PSM-mfcc comparison pass")
    parser.add_argument("--psm-distractors", type=int, default=10)
    parser.add_argument("--es-iters", type=int, default=32)
    parser.add_argument("--popsize", type=int, default=128)
    parser.add_argument("--gens-per-dispatch", type=int, default=8)
    args = parser.parse_args()

    from st_ito_tpu.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax.numpy as jnp

    from st_ito_tpu.eval.metrics import style_similarity
    from st_ito_tpu.eval.pst_examples import (
        benchmark_chain,
        synthesize_contrived_examples,
    )
    from st_ito_tpu.ito import run_es
    from st_ito_tpu.models.registry import get_param_embeds, load_param_model

    enc_path = os.path.join(args.out, "run", "encoder.npz")
    model = load_param_model(enc_path)
    chain = benchmark_chain("general")
    sample_rate = 48000

    sources = synth_sources(n=28)
    k = args.sources_per_mode
    tonal = [s for i, s in enumerate(sources[:20]) if i % 4 in (0, 1)][:k]
    perc = [s for i, s in enumerate(sources[:20]) if i % 4 in (2, 3)][:k]

    noise: dict = {}
    for mode, srcs in (("music", tonal), ("mixed", perc)):
        examples = synthesize_contrived_examples(
            [s[..., :131072] for s in srcs])
        # evenly spaced subset covers every style and several sources
        step = max(1, len(examples) // args.examples_per_mode)
        subset = examples[::step][:args.examples_per_mode]
        per_ex = {}
        for ex in subset:
            x = jnp.asarray(ex["input"])[None]
            y = jnp.asarray(ex["target"])[None]
            tgt = get_param_embeds(y, model, sample_rate)
            sims = []
            for seed in range(args.seeds):
                res = run_es(
                    x, y, sample_rate, chain, model,
                    max_iters=args.es_iters, popsize=args.popsize,
                    sigma0=0.33, random_crop=True, find_w0=False,
                    seed=seed, verbose=False,
                    gens_per_dispatch=args.gens_per_dispatch,
                )
                out = res["output_audio"]
                if out.shape[1] == 1 and x.shape[1] == 2:
                    out = jnp.concatenate([out] * 2, axis=1)
                emb = get_param_embeds(out, model, sample_rate)
                sims.append(float(np.asarray(
                    style_similarity(emb, tgt)).mean()))
                print(f"[{mode}] {ex['name']} seed {seed}: "
                      f"param_sim {sims[-1]:.4f}", flush=True)
            per_ex[ex["name"]] = {
                "sims": sims,
                "mean": float(np.mean(sims)),
                "std": float(np.std(sims)),
            }
        stds = [v["std"] for v in per_ex.values()]
        noise[mode] = {
            "examples": per_ex,
            "mean_std": float(np.mean(stds)),
            "max_std": float(np.max(stds)),
        }
        print(f"mode {mode}: mean seed std {noise[mode]['mean_std']:.4f}, "
              f"max {noise[mode]['max_std']:.4f}", flush=True)

    # PSM comparison curve: the trained param metric vs the MFCC baseline on
    # the SAME quadruplets the demo used (deterministic generator, seed 7) —
    # mirrors the reference PSM plot's multi-metric comparison
    # (reference: scripts/eval/eval_psm.py:87-154).
    psm_mfcc = None
    if args.psm_examples > 0:
        from st_ito_tpu.eval.psm import (
            evaluate_metric_on_quadruplets,
            generate_psm_quadruplets,
        )
        from st_ito_tpu.models.registry import (
            get_mfcc_feature_embeds,
            load_mfcc_feature_extractor,
        )

        quads = generate_psm_quadruplets(
            sources[20:], effect_names=["parametric_eq", "compressor",
                                        "distortion", "reverb"],
            num_examples=args.psm_examples,
            num_distractors=args.psm_distractors, length=131072, seed=7)
        psm_mfcc = evaluate_metric_on_quadruplets(
            quads, load_mfcc_feature_extractor(), get_mfcc_feature_embeds)
        print(f"PSM (mfcc baseline): {psm_mfcc}")

    summary_path = os.path.join(args.out, "summary.json")
    summary = {}
    if os.path.isfile(summary_path):
        with open(summary_path) as f:
            summary = json.load(f)
    summary["style_es_seed_noise"] = noise
    if psm_mfcc is not None:
        summary["psm_vs_distractors_mfcc"] = psm_mfcc
    with open(summary_path, "w") as f:
        json.dump(summary, f, indent=2, default=float)
    print(f"seed-noise stats appended to {summary_path}")


if __name__ == "__main__":
    main()


