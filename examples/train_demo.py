"""End-to-end demo: synthesize data, train the AFx-Rep pretext encoder,
export it, and show the trained metric beats a random-weight encoder on the
PSM quadruplet benchmark. Run on one TPU chip.

    python examples/train_demo.py [--steps 500] [--out examples/train_demo_out]
"""

import argparse
import json
import os

import numpy as np


def synth_sources(n=24, T=262144, sr=48000, seed=0):
    """Varied synthetic program material: plucks, pads, noise bursts, drums."""
    rng = np.random.default_rng(seed)
    t = np.arange(T) / sr
    out = []
    for i in range(n):
        kind = i % 4
        f0 = float(rng.uniform(60, 500))
        if kind == 0:  # plucked harmonics
            x = sum(np.sin(2 * np.pi * f0 * k * t + rng.random() * 6) / k
                    for k in range(1, 9))
            x *= np.exp(-((t % rng.uniform(0.2, 0.6)) / 0.1))
        elif kind == 1:  # pad (detuned saws via additive)
            x = sum(np.sin(2 * np.pi * (f0 * k + rng.uniform(-2, 2)) * t) / k
                    for k in range(1, 13))
        elif kind == 2:  # noise bursts
            env = (np.sin(2 * np.pi * rng.uniform(1, 4) * t) > 0).astype(float)
            x = rng.standard_normal(T) * env
        else:  # kick/snare-ish percussion
            period = rng.uniform(0.3, 0.7)
            phase = (t % period) / period
            x = np.sin(2 * np.pi * 55 * t * np.exp(-phase * 8)) * np.exp(-phase * 12)
            x += rng.standard_normal(T) * np.exp(-phase * 25) * 0.5
        x = x + rng.standard_normal(T) * 0.002
        x = x / np.abs(x).max() * rng.uniform(0.5, 0.9)
        out.append(np.stack([x, np.roll(x, int(rng.integers(0, 200)))])
                   .astype(np.float32))
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=500)
    parser.add_argument("--out", type=str, default="examples/train_demo_out")
    parser.add_argument("--length", type=int, default=131072)
    parser.add_argument("--batch-size", type=int, default=16)
    args = parser.parse_args()

    from st_ito_tpu.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax

    from st_ito_tpu.data import generate_pretext_dataset, sample_preset_bank

    os.makedirs(args.out, exist_ok=True)
    sources = synth_sources()

    # 1. preset bank + dataset (rendered on device)
    bank_path = os.path.join(args.out, "bank.npz")
    effects = ["parametric_eq", "compressor", "distortion", "delay",
               "reverb", "chorus", "limiter", "multiband_compressor"]
    bank = sample_preset_bank(effects, num_presets=6, seed=0)
    bank.save(bank_path)
    print(f"preset bank: {bank.num_instances} instances x "
          f"{bank.num_presets} presets")

    train_dir = os.path.join(args.out, "data_train")
    val_dir = os.path.join(args.out, "data_val")
    if not os.path.isdir(train_dir):
        generate_pretext_dataset(sources[:20], bank, train_dir,
                                 num_examples=768, length=args.length,
                                 examples_per_shard=64, seed=0)
        generate_pretext_dataset(sources[20:], bank, val_dir,
                                 num_examples=128, length=args.length,
                                 examples_per_shard=64, seed=1)
    print("dataset ready")

    # 2. train via the real CLI
    import yaml

    cfg = {
        "task": "pretext", "name": "demo", "seed": 0,
        "max_steps": args.steps, "log_every": 25, "ckpt_every": 10000,
        "val_every": max(args.steps // 2, 1), "val_batches": 4,
        "model": {
            "encoder": {"embed_dim": 128, "base_channels": 32,
                        "sample_rate": 48000},
            "lr": 3e-4,
            "num_instances": bank.num_instances,
            "num_presets": bank.num_presets,
        },
        "data": {"shard_dir": train_dir, "val_shard_dir": val_dir,
                 "length": args.length, "batch_size": args.batch_size},
    }
    cfg_path = os.path.join(args.out, "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from st_ito_tpu.cli.train import main as train_main

    run_dir = os.path.join(args.out, "run")
    train_main(["--config", cfg_path, "--run-dir", run_dir])

    # 3. PSM eval: trained encoder vs random encoder
    from st_ito_tpu.eval.psm import (
        evaluate_metric_on_quadruplets,
        generate_psm_quadruplets,
    )
    from st_ito_tpu.models.registry import get_param_embeds, load_param_model

    examples = generate_psm_quadruplets(
        sources[20:], effect_names=["parametric_eq", "compressor",
                                    "distortion", "reverb"],
        num_examples=48, num_distractors=3, length=args.length, seed=7)

    trained = load_param_model(os.path.join(run_dir, "encoder.npz"))
    random_m = load_param_model(allow_random=True, seed=3)
    results = {}
    for name, model in [("trained", trained), ("random", random_m)]:
        res = evaluate_metric_on_quadruplets(examples, model,
                                             get_param_embeds, 48000)
        results[name] = res["accuracy_by_distractors"]
        print(f"{name}: " + "  ".join(
            f"d={d}: {a:.3f}" for d, a in sorted(res["accuracy_by_distractors"].items())))

    with open(os.path.join(args.out, "psm_results.json"), "w") as f:
        json.dump(results, f, indent=2, default=float)


if __name__ == "__main__":
    main()
