"""Full PST benchmark demo on one TPU chip with a TRAINED style metric.

Produces the committed multi-mode results the reference benchmark produces
(reference: scripts/eval/eval_pst.py:906-1062), self-contained offline:

1. train the AFx-Rep pretext encoder on device-rendered preset data
   (reusing examples/train_demo.py machinery) — the benchmark metric,
2. train TWO learned-inference style systems on the benchmark chain
   (deepafx-st = parameter-regression loss, deepafx-st+ = audio loss;
   reference: eval_pst.py:957-973 loads two pretrained checkpoints),
3. run the complete 6-method roster (input / random / rule-based /
   deepafx-st / deepafx-st+ / style-es) over contrived styled examples in
   two modes, scored by the trained param metric + MFCC metric,
4. PSM accuracy vs #distractors with the trained encoder.

    python examples/pst_full_demo.py [--out examples/pst_demo_full]
"""

import argparse
import json
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.dirname(_HERE))  # repo root (uninstalled runs)
from train_demo import synth_sources  # noqa: E402


def get_or_train_encoder(out_dir, sources, steps, num_examples=768):
    """Train the pretext encoder (once) and return the trained ParamModel."""
    import yaml

    from st_ito_tpu.data import generate_pretext_dataset, sample_preset_bank
    from st_ito_tpu.models.registry import load_param_model

    enc_path = os.path.join(out_dir, "run", "encoder.npz")
    if not os.path.isfile(enc_path):
        bank = sample_preset_bank(
            ["parametric_eq", "compressor", "distortion", "delay", "reverb",
             "chorus", "limiter", "multiband_compressor"],
            num_presets=6, seed=0)
        train_dir = os.path.join(out_dir, "data_train")
        if not os.path.isdir(train_dir):
            generate_pretext_dataset(sources[:20], bank, train_dir,
                                     num_examples=num_examples,
                                     length=131072,
                                     examples_per_shard=64, seed=0)
        cfg = {
            "task": "pretext", "name": "pst-demo", "seed": 0,
            "max_steps": steps, "log_every": 50, "ckpt_every": 100000,
            "val_every": 0,
            "model": {
                "encoder": {"embed_dim": 128, "base_channels": 32,
                            "sample_rate": 48000},
                "lr": 3e-4,
                "num_instances": bank.num_instances,
                "num_presets": bank.num_presets,
            },
            "data": {"shard_dir": train_dir, "length": 131072,
                     "batch_size": 16},
        }
        cfg_path = os.path.join(out_dir, "cfg.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)
        from st_ito_tpu.cli.train import main as train_main

        train_main(["--config", cfg_path,
                    "--run-dir", os.path.join(out_dir, "run")])
    return load_param_model(enc_path)


def train_style_system(chain, loss_type, sources, steps, batch_size=16,
                       T=131072, seed=0, cache_path=None, lr=3e-4,
                       embed_dim=64, base_channels=16, val_every=100,
                       val_sources=None, log_path=None):
    """On-the-fly style system training on the benchmark chain, with a
    fixed-task validation curve (same held-out inputs + same on-the-fly
    parameter draws at every eval, so the curve is comparable across
    steps). The trained params are cached so a resumed demo run skips
    straight to the benchmark. The reference loads CONVERGED pretrained
    systems (eval_pst.py:957-973); competence here requires thousands of
    steps with the MultiStepLR schedule (total_steps)."""
    import pickle

    import jax
    import jax.numpy as jnp

    from st_ito_tpu.models.cnn14 import Cnn14Config
    from st_ito_tpu.train.style import StyleTransferConfig, StyleTransferSystem

    cfg = StyleTransferConfig(
        encoder=Cnn14Config(embed_dim=embed_dim, base_channels=base_channels),
        loss_type=loss_type, on_the_fly=True, split_section=True,
        analysis_length=65536, lr=lr, total_steps=steps,
    )
    system = StyleTransferSystem(cfg, chain=chain)
    state = system.init(jax.random.PRNGKey(seed))
    if cache_path and os.path.isfile(cache_path):
        with open(cache_path, "rb") as f:
            loaded = jax.tree_util.tree_map(jnp.asarray, pickle.load(f))
        state = state.replace(params=loaded)
        print(f"  [{loss_type}] loaded cached params from {cache_path}")
        return system, state
    step_fn = system.make_train_step()
    eval_fn = system.make_eval_step()
    rng = jax.random.PRNGKey(seed + 1)
    np_rng = np.random.default_rng(seed)
    # the axon relay never frees host mirrors of uploaded buffers
    # (PERF_NOTES.md "Relay host-memory leak"), so upload the pool ONCE
    # and gather batches on device instead of uploading 4 MB per step.
    pool = jnp.asarray(np.stack([s[..., :T] for s in sources]))
    gather = jax.jit(lambda p, i: jnp.take(p, i, axis=0))
    val_batch = None
    if val_sources:
        val_batch = {"input_audio": jnp.asarray(
            np.stack([s[..., :T] for s in val_sources]))}
    val_rng = jax.random.PRNGKey(10_000 + seed)  # FIXED: same val task
    curve = []
    for i in range(steps):
        idx = np_rng.integers(0, len(pool), batch_size)
        batch = {"input_audio": gather(pool, jnp.asarray(idx))}
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, batch, sub)
        if i % 50 == 0:
            print(f"  [{loss_type}] step {i}: "
                  f"loss {float(metrics['loss']):.4f}", flush=True)
        if val_batch is not None and (i % val_every == 0 or i == steps - 1):
            _, (vm, aux) = eval_fn(state.params, val_batch, val_rng)
            rec = {"step": i,
                   "train_loss": float(metrics["loss"]),
                   **{f"val_{k}": float(v) for k, v in vm.items()},
                   "pred_std": float(jnp.std(aux["params_pred"]))}
            curve.append(rec)
            print(f"  [{loss_type}] step {i}: val {rec}", flush=True)
    if log_path:
        with open(log_path, "w") as f:
            for rec in curve:
                f.write(json.dumps(rec) + "\n")
    if cache_path:
        with open(cache_path, "wb") as f:
            pickle.dump(jax.device_get(state.params), f)
    return system, state


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default="examples/pst_demo_full")
    parser.add_argument("--encoder-steps", type=int, default=600)
    parser.add_argument("--style-steps", type=int, default=3000)
    parser.add_argument("--style-batch", type=int, default=16)
    parser.add_argument("--style-lr", type=float, default=3e-4)
    parser.add_argument("--es-iters", type=int, default=25)
    parser.add_argument("--popsize", type=int, default=128)
    parser.add_argument("--sources-per-mode", type=int, default=2)
    parser.add_argument("--data-examples", type=int, default=768)
    parser.add_argument("--psm-distractors", type=int, default=5)
    parser.add_argument("--psm-examples", type=int, default=32)
    parser.add_argument("--gens-per-dispatch", type=int, default=1)
    args = parser.parse_args()

    from st_ito_tpu.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    os.makedirs(args.out, exist_ok=True)
    sources = synth_sources(n=28)

    # 1. trained benchmark metric
    model = get_or_train_encoder(args.out, sources, args.encoder_steps,
                                 args.data_examples)
    print("trained encoder ready")

    from st_ito_tpu.eval.pst import default_methods, run_pst_benchmark
    from st_ito_tpu.eval.pst_examples import (
        benchmark_chain,
        synthesize_contrived_examples,
    )
    from st_ito_tpu.models.registry import (
        get_mfcc_feature_embeds,
        get_param_embeds,
        load_mfcc_feature_extractor,
    )

    chain = benchmark_chain("general")

    # 2. learned-inference baselines on the same chain (train on the SAME
    # source family the benchmark draws from, hold the last two out for
    # the validation curve)
    style_train = sources[:20] + sources[22:]
    style_val = sources[20:22]
    print("training deepafx-st (parameter-regression)...", flush=True)
    sys_reg = train_style_system(
        chain, "parameter-regression", style_train, args.style_steps,
        batch_size=args.style_batch, lr=args.style_lr, seed=1,
        val_sources=style_val,
        log_path=os.path.join(args.out, "style_reg_curve.jsonl"),
        cache_path=os.path.join(args.out, "style_reg.pkl"))
    print("training deepafx-st+ (audio loss)...", flush=True)
    sys_audio = train_style_system(
        chain, "audio", style_train, args.style_steps,
        batch_size=args.style_batch, lr=args.style_lr, seed=2,
        val_sources=style_val,
        log_path=os.path.join(args.out, "style_audio_curve.jsonl"),
        cache_path=os.path.join(args.out, "style_audio.pkl"))

    methods = default_methods(
        chain, model, get_param_embeds, popsize=args.popsize,
        max_iters=args.es_iters,
        style_systems={"deepafx-st": sys_reg, "deepafx-st+": sys_audio},
        gens_per_dispatch=args.gens_per_dispatch,
    )
    metrics = {
        "param": (model, get_param_embeds),
        "mfcc": (load_mfcc_feature_extractor(), get_mfcc_feature_embeds),
    }

    # 3. two contrived modes (tonal "music" vs percussive/noise "mixed")
    k = args.sources_per_mode
    tonal = [s for i, s in enumerate(sources[:20]) if i % 4 in (0, 1)][:k]
    perc = [s for i, s in enumerate(sources[:20]) if i % 4 in (2, 3)][:k]
    all_results = {}
    for mode, srcs in (("music", tonal), ("mixed", perc)):
        examples = synthesize_contrived_examples(
            [s[..., :131072] for s in srcs])
        print(f"mode {mode}: {len(examples)} examples x "
              f"{len(methods)} methods", flush=True)
        res = run_pst_benchmark(
            examples, methods, metrics,
            output_dir=os.path.join(args.out, mode))
        all_results[mode] = res

    # 4. PSM accuracy vs #distractors with the trained encoder
    from st_ito_tpu.eval.psm import (
        evaluate_metric_on_quadruplets,
        generate_psm_quadruplets,
    )

    quads = generate_psm_quadruplets(
        sources[20:], effect_names=["parametric_eq", "compressor",
                                    "distortion", "reverb"],
        num_examples=args.psm_examples,
        num_distractors=args.psm_distractors, length=131072, seed=7)
    psm = evaluate_metric_on_quadruplets(quads, model, get_param_embeds)
    print(f"PSM accuracy vs #distractors: {psm}")

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump({"pst": all_results, "psm_vs_distractors": psm}, f,
                  indent=2, default=float)
    print(f"results in {args.out}")


if __name__ == "__main__":
    main()
