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


def _load_shard_pool(shard_dir, max_examples=None):
    """Every example of a pretext shard dir as one in-memory dict (the
    whole demo dataset fits; augmentation happens ON DEVICE per step via
    make_param_train_block(augment=True))."""
    import glob

    arrs = {"inputs": [], "outputs": [], "instance_index": [],
            "preset_index": [], "tar_index": []}
    for p in sorted(glob.glob(os.path.join(shard_dir, "shard_*.npz"))):
        if p.endswith("_logits.npz"):
            continue
        d = np.load(p)
        for k in arrs:
            arrs[k].append(np.asarray(d[k]))
    out = {k: np.concatenate(v).astype(
        np.float32 if k in ("inputs", "outputs") else np.int32)
        for k, v in arrs.items()}
    if max_examples:
        out = {k: v[:max_examples] for k, v in out.items()}
    return out


def get_or_train_encoder(out_dir, sources, steps, num_examples=768,
                         batch_size=16, lr=3e-4, val_every=200,
                         num_presets=6, embed_dim=128, base_channels=32):
    """Train the pretext encoder (once) and return the trained ParamModel.
    Trains in k-step lax.scan blocks over a device-resident pool (per-step
    relay dispatch + uploads dominated the old cli/train loop and leak
    host RSS — PERF_NOTES)."""
    import json as _json

    import jax
    import jax.numpy as jnp

    from st_ito_tpu.data import generate_pretext_dataset, sample_preset_bank
    from st_ito_tpu.models.cnn14 import Cnn14Config
    from st_ito_tpu.models.registry import export_encoder_npz, load_param_model
    from st_ito_tpu.train import (
        ParamEstimatorConfig, init_param_estimator, make_param_train_block,
    )
    from st_ito_tpu.train.param import param_estimator_loss

    enc_path = os.path.join(out_dir, "run", "encoder.npz")
    if not os.path.isfile(enc_path):
        bank = sample_preset_bank(
            ["parametric_eq", "compressor", "distortion", "delay", "reverb",
             "chorus", "limiter", "multiband_compressor"],
            num_presets=num_presets, seed=0)
        train_dir = os.path.join(out_dir, "data_train")
        if not os.path.isdir(train_dir):
            generate_pretext_dataset(sources[:20], bank, train_dir,
                                     num_examples=num_examples,
                                     length=131072,
                                     examples_per_shard=64, seed=0)
        cfg = ParamEstimatorConfig(
            encoder=Cnn14Config(embed_dim=embed_dim,
                                base_channels=base_channels,
                                sample_rate=48000),
            lr=lr, num_instances=bank.num_instances,
            num_presets=bank.num_presets)
        state = init_param_estimator(jax.random.PRNGKey(0), cfg)
        pool_np = _load_shard_pool(train_dir)
        n_val = max(batch_size, len(pool_np["inputs"]) // 16)
        val_batch = {k: jnp.asarray(v[:n_val]) for k, v in pool_np.items()}
        pool = {k: jnp.asarray(v[n_val:]) for k, v in pool_np.items()}
        n_pool = len(pool_np["inputs"]) - n_val
        print(f"pretext pool: {n_pool} train / {n_val} val examples")

        k = min(25, max(1, val_every))
        block = make_param_train_block(cfg, k, augment=True)
        eval_loss = jax.jit(
            lambda p, b, r: param_estimator_loss(p, cfg, b, False, r))
        np_rng = np.random.default_rng(0)
        rng = jax.random.PRNGKey(1)
        curve = []
        i = 0
        while i < steps:
            idx = jnp.asarray(np_rng.integers(0, n_pool, (k, batch_size)),
                              jnp.int32)
            rng, sub = jax.random.split(rng)
            state, losses = block(state, pool, idx, sub)
            i += k
            if i % val_every == 0 or i >= steps:
                vloss, (vm, _, _) = eval_loss(state.params, val_batch,
                                              jax.random.PRNGKey(2))
                rec = {"step": i, "train_loss": float(losses[-1]),
                       **{f"val_{m}": float(v) for m, v in vm.items()}}
                curve.append(rec)
                print(f"  [pretext] {rec}", flush=True)
        os.makedirs(os.path.dirname(enc_path), exist_ok=True)
        export_encoder_npz(jax.device_get(state.params["encoder"]), enc_path,
                           cfg.encoder)
        with open(os.path.join(out_dir, "run", "pretext_curve.jsonl"),
                  "w") as f:
            for rec in curve:
                f.write(_json.dumps(rec) + "\n")
    return load_param_model(enc_path)


def train_style_system(chain, loss_type, sources, steps, batch_size=16,
                       T=131072, seed=0, cache_path=None, lr=3e-4,
                       embed_dim=64, base_channels=16, val_every=100,
                       val_sources=None, log_path=None, encoder_init=None):
    """On-the-fly style system training on the benchmark chain, with a
    fixed-task validation curve (same held-out inputs + same on-the-fly
    parameter draws at every eval, so the curve is comparable across
    steps). The trained params are cached so a resumed demo run skips
    straight to the benchmark. The reference loads CONVERGED pretrained
    systems built on pretrained feature extractors (eval_pst.py:957-973);
    ``encoder_init`` mirrors that by warm-starting the system's encoder
    from the pretext-trained Cnn14 (a from-scratch encoder measured
    ~0.005 val-MSE progress in 400 steps — the head then learns from
    features that already separate effect parameters)."""
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
    if encoder_init is not None:
        params = dict(state.params)
        params["encoder"] = jax.tree_util.tree_map(jnp.asarray, encoder_init)
        state = state.replace(params=params)
    if cache_path and os.path.isfile(cache_path):
        with open(cache_path, "rb") as f:
            loaded = jax.tree_util.tree_map(jnp.asarray, pickle.load(f))
        state = state.replace(params=loaded)
        print(f"  [{loss_type}] loaded cached params from {cache_path}")
        return system, state
    # k steps per dispatch: per-step host dispatch through the tunneled
    # relay dominated a measured 400-step run (~2.1 s/step of which the
    # device did ~0.15 s); the scan block amortizes it k-fold. The pool
    # uploads ONCE (the relay never frees upload mirrors — PERF_NOTES).
    k = max(1, min(val_every, 25))
    block_fn = system.make_train_block(k)
    eval_fn = system.make_eval_step()
    rng = jax.random.PRNGKey(seed + 1)
    np_rng = np.random.default_rng(seed)
    pool = jnp.asarray(np.stack([s[..., :T] for s in sources]))
    val_batch = None
    if val_sources:
        val_batch = {"input_audio": jnp.asarray(
            np.stack([s[..., :T] for s in val_sources]))}
    val_rng = jax.random.PRNGKey(10_000 + seed)  # FIXED: same val task
    curve = []
    i = 0
    while i < steps:  # steps rounds up to a multiple of k (one program)
        idx = jnp.asarray(
            np_rng.integers(0, len(pool), (k, batch_size)), jnp.int32)
        rng, sub = jax.random.split(rng)
        state, losses = block_fn(state, pool, idx, sub)
        i += k
        last_loss = float(losses[-1])
        if val_batch is not None and (i % val_every == 0 or i >= steps):
            _, (vm, aux) = eval_fn(state.params, val_batch, val_rng)
            rec = {"step": i,
                   "train_loss": last_loss,
                   **{f"val_{m}": float(v) for m, v in vm.items()},
                   "pred_std": float(jnp.std(aux["params_pred"]))}
            curve.append(rec)
            print(f"  [{loss_type}] step {i}: {rec}", flush=True)
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
    parser.add_argument("--num-presets", type=int, default=6)
    parser.add_argument("--style-steps", type=int, default=3000)
    parser.add_argument("--style-batch", type=int, default=16)
    parser.add_argument("--style-lr", type=float, default=3e-4)
    parser.add_argument("--es-iters", type=int, default=25)
    parser.add_argument("--popsize", type=int, default=128)
    parser.add_argument("--sources-per-mode", type=int, default=2)
    parser.add_argument("--data-examples", type=int, default=768)
    parser.add_argument("--embed-dim", type=int, default=128)
    parser.add_argument("--base-channels", type=int, default=32)
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
                                 args.data_examples,
                                 num_presets=args.num_presets,
                                 embed_dim=args.embed_dim,
                                 base_channels=args.base_channels)
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
    enc_cfg = model.config
    common = dict(batch_size=args.style_batch, lr=args.style_lr,
                  val_sources=style_val, encoder_init=model.params,
                  embed_dim=enc_cfg.embed_dim,
                  base_channels=enc_cfg.base_channels)
    print("training deepafx-st (parameter-regression)...", flush=True)
    sys_reg = train_style_system(
        chain, "parameter-regression", style_train, args.style_steps,
        seed=1, log_path=os.path.join(args.out, "style_reg_curve.jsonl"),
        cache_path=os.path.join(args.out, "style_reg.pkl"), **common)
    print("training deepafx-st+ (audio loss)...", flush=True)
    sys_audio = train_style_system(
        chain, "audio", style_train, args.style_steps,
        seed=2, log_path=os.path.join(args.out, "style_audio_curve.jsonl"),
        cache_path=os.path.join(args.out, "style_audio.pkl"), **common)

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
