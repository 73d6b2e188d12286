"""Precompute AST (AudioSet) classifier logits for pretext shards.

TPU-native analog of the reference's label_audio.py
(reference: scripts/data/label_audio.py:13-132): the reference walks FLAC
tar members and writes per-example .pt logit files consumed by the
adversarial "classifier" mode; here each ``shard_XXX.npz`` gets a sibling
``shard_XXX_logits.npz`` holding an (N, num_classes) array, which
NpzShardDataset picks up automatically as ``content_logits``.

Gated on the AST weights being present in the local HF cache (zero-egress
environments cannot download them; the adversarial "dataset" mode needs no
labels and works everywhere).

    python scripts/label_audio.py SHARD_DIR [--model MIT/ast-finetuned-audioset-10-10-0.4593]
"""

import argparse
import glob
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("shard_dir")
    parser.add_argument("--model", type=str,
                        default="MIT/ast-finetuned-audioset-10-10-0.4593")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--sample-rate", type=int, default=48000)
    args = parser.parse_args()

    try:
        import torch
        from transformers import (
            AutoFeatureExtractor,
            AutoModelForAudioClassification,
        )

        extractor = AutoFeatureExtractor.from_pretrained(args.model)
        model = AutoModelForAudioClassification.from_pretrained(args.model)
    except (OSError, ImportError) as e:
        raise SystemExit(
            f"AST weights for {args.model} not available locally (offline "
            f"environment). Pre-populate the HF cache, or use the "
            f"adversarial 'dataset' mode which needs no labels. ({e})")
    model.eval()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from st_ito_tpu.ops.resample import resample

    shards = sorted(glob.glob(os.path.join(args.shard_dir, "shard_*.npz")))
    shards = [s for s in shards if not s.endswith("_logits.npz")]
    for path in shards:
        out_path = path[:-4] + "_logits.npz"
        if os.path.isfile(out_path):
            continue
        with np.load(path) as d:
            audio = d["outputs"].astype(np.float32)  # (N, C, T)
        mono16 = np.asarray(resample(jnp.asarray(audio.mean(axis=1))[:, None],
                                     args.sample_rate, 16000))[:, 0]
        logits = []
        with torch.no_grad():
            for s in range(0, len(mono16), args.batch_size):
                chunk = mono16[s:s + args.batch_size]
                feats = extractor([c for c in chunk], sampling_rate=16000,
                                  return_tensors="pt")
                logits.append(model(feats.input_values).logits.numpy())
        np.savez(out_path, logits=np.concatenate(logits).astype(np.float32))
        print(f"{os.path.basename(out_path)}: {len(mono16)} examples")


if __name__ == "__main__":
    main()
