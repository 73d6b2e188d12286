"""Committed demo artifacts for the remaining eval harnesses.

The PST + PSM benchmarks already ship committed results
(examples/pst_demo_full/); this script produces the same kind of
self-contained offline artifact for the other four reference eval
surfaces, using the TRAINED demo encoder from the PST demo as the
"param" metric and MFCC statistics as the untrained baseline:

1. zero-shot + linear-probe style classification over the five
   reference styles (reference: scripts/eval/eval_cls.py:192-332),
2. synthetic known-target recovery scored by MRSTFT + style similarity
   (reference: scripts/eval/eval_synthetic.py:57-145, eval_obj.py:14-88),
3. metric monotonicity sweeps over single effect parameters
   (reference: scripts/eval/eval_sweep.py:15-119),
4. single-parameter recovery case studies
   (reference: scripts/eval/eval_case_study.py:31-120).

Writes summary.json + sweep/recovery figures under
examples/eval_suite_demo/.

    python examples/eval_suite_demo.py [--out examples/eval_suite_demo]
      [--cpu]   # force the CPU backend (default: whatever jax picks)
"""

import argparse
import json
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.dirname(_HERE))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default="examples/eval_suite_demo")
    parser.add_argument("--encoder", type=str,
                        default="examples/pst_demo_full/run/encoder.npz")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--es-popsize", type=int, default=12)
    parser.add_argument("--es-iters", type=int, default=8)
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from st_ito_tpu.chain import ChainSpec, basic_chain
    from st_ito_tpu.eval.case_study import parameter_recovery_curve
    from st_ito_tpu.eval.cls import (
        STYLES,
        make_style_dataset,
        run_probe_task,
        run_zero_shot_task,
    )
    from st_ito_tpu.eval.plots import plot_sweep_results
    from st_ito_tpu.eval.sweep import sweep_parameter
    from st_ito_tpu.eval.synthetic import run_synthetic_benchmark
    from st_ito_tpu.ito import run_es, run_input, run_random
    from st_ito_tpu.models.registry import (
        get_mfcc_feature_embeds,
        get_param_embeds,
        load_mfcc_feature_extractor,
        load_param_model,
    )
    from train_demo import synth_sources

    os.makedirs(args.out, exist_ok=True)
    sr = 48000
    sources = synth_sources(n=12, T=131072, seed=3)

    metrics = {
        "param (trained)": (load_param_model(args.encoder), get_param_embeds),
        "mfcc (baseline)": (load_mfcc_feature_extractor(),
                            get_mfcc_feature_embeds),
    }
    summary: dict = {"styles": list(STYLES)}

    # 1. style classification ------------------------------------------------
    clips, labels = make_style_dataset(sources, sr, per_style=10,
                                       length=65536, seed=0)
    cls_res: dict = {}
    for name, (model, embed) in metrics.items():
        cls_res[name] = {
            "zero_shot_1ref": run_zero_shot_task(
                clips, labels, model, embed, sr, num_refs=1, seed=0),
            "zero_shot_3ref": run_zero_shot_task(
                clips, labels, model, embed, sr, num_refs=3, seed=0),
            "linear_probe": run_probe_task(
                clips, labels, model, embed, sr, seed=0),
        }
        print(f"[cls] {name}: {cls_res[name]}", flush=True)
    cls_res["chance"] = 1.0 / len(STYLES)
    summary["classification"] = cls_res

    # 2. synthetic known-target benchmark ------------------------------------
    model, embed = metrics["param (trained)"]
    chain = basic_chain()
    x = jnp.asarray(sources[0][:, :49152])
    methods = {
        "input": {"func": lambda x, y, sr: run_input(x, y, sr)},
        "random": {"func": lambda x, y, sr: run_random(
            x, y, sr, chain, model, seed=0)},
        "style-es": {"func": lambda x, y, sr: run_es(
            x, y, sr, chain, model, embed_func=embed,
            max_iters=args.es_iters, popsize=args.es_popsize, sigma0=0.33,
            find_w0=False, seed=0, verbose=False)},
    }
    synth = run_synthetic_benchmark(
        chain, x, methods, model, embed, sr,
        out_path=os.path.join(args.out, "synthetic_results.json"))
    means: dict = {}
    for case in synth.values():
        for m, v in case.items():
            if isinstance(v, dict):
                means.setdefault(m, []).append(v["style_sim"])
    summary["synthetic_mean_style_sim"] = {
        m: float(np.mean(v)) for m, v in means.items()}
    print(f"[synthetic] {summary['synthetic_mean_style_sim']}", flush=True)

    # 3. monotonicity sweeps --------------------------------------------------
    xs = jnp.asarray(sources[1][:, :65536])
    sweep_specs = [("distortion", "drive_db"),
                   ("compressor", "threshold_db"),
                   ("parametric_eq", "high_shelf_gain_db")]
    sweeps: dict = {}
    for name, (model, embed) in metrics.items():
        for eff, pname in sweep_specs:
            r = sweep_parameter(xs, eff, pname, model, embed, sr,
                                num_steps=11)
            sweeps[f"{name}: {eff}.{pname}"] = r
            print(f"[sweep] {name} {eff}.{pname}: "
                  f"monotonicity {r['monotonicity']:.3f}", flush=True)
    summary["sweeps"] = {
        k: {"monotonicity": v["monotonicity"]} for k, v in sweeps.items()}
    plot_sweep_results(sweeps, os.path.join(args.out, "sweeps.png"))

    # 4. parameter-recovery case studies --------------------------------------
    cases = [("distortion", "drive_db", 0.75),
             ("reverb", "room_size", 0.7),
             ("parametric_eq", "high_shelf_gain_db", 0.8),
             ("compressor", "threshold_db", 0.25)]
    recovery: dict = {}
    model, embed = metrics["param (trained)"]
    for eff, pname, target in cases:
        r = parameter_recovery_curve(xs, eff, pname, target, model, embed,
                                     sr, num_steps=21)
        recovery[f"{eff}.{pname}"] = r
        print(f"[recovery] {eff}.{pname}: target {target} -> "
              f"{r['recovered_value']:.3f} "
              f"(err {r['recovery_error']:.3f})", flush=True)
    summary["recovery"] = {
        k: {kk: v[kk] for kk in
            ("target_value", "recovered_value", "recovery_error")}
        for k, v in recovery.items()}
    curves = {f"recovery: {k}": {"values": v["values"],
                                 "similarities": v["similarities"],
                                 "monotonicity": v["recovery_error"]}
              for k, v in recovery.items()}
    plot_sweep_results(curves, os.path.join(args.out, "recovery.png"))

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2, default=float)
    print(f"wrote {args.out}/summary.json")


if __name__ == "__main__":
    main()
