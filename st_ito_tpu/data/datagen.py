"""Dataset synthesis on device.

Pretext dataset (reference: scripts/data/vst_datagen_mp.py): each example is
(input clip, same clip rendered through a random (instance, preset) pair,
instance index, preset index, source-dataset index). The reference dispatched
jobs to persistent CPU worker processes each hosting every VST; here one
jitted render per instance processes a whole batch on the accelerator.

Style dataset (reference: scripts/data/vst_datagen_style.py): input/output/
params triplets through a full chain with random parameters.

Output format: .npz shards (one arrays-of-examples file per shard) +
an index.json. Audio stored float16 to halve disk/IO.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from st_ito_tpu.chain import ChainSpec
from st_ito_tpu.chain.executor import build_render_fn
from st_ito_tpu.data.presets import PresetBank


def _nonsilent_crop(rng, audio: np.ndarray, length: int,
                    silence_db: float = -48.0, max_tries: int = 10):
    """Random crop rejecting silent regions
    (reference: st_ito/dataset/dataset_sim.py:61-108)."""
    C, T = audio.shape
    if T <= length:
        out = np.zeros((C, length), audio.dtype)
        out[:, :T] = audio
        return out
    for _ in range(max_tries):
        s = int(rng.integers(0, T - length))
        crop = audio[:, s:s + length]
        if 20 * np.log10(max(np.sqrt(np.mean(crop**2)), 1e-10)) > silence_db:
            return crop
    return crop


def generate_pretext_dataset(
    audio_sources: list[np.ndarray],
    bank: PresetBank,
    out_dir: str,
    num_examples: int,
    length: int = 262144,
    examples_per_shard: int = 64,
    sample_rate: int = 48000,
    seed: int = 0,
    source_dataset_ids: list[int] | None = None,
) -> list[str]:
    """audio_sources: list of (C, T) float arrays (decoded audio files).
    Returns list of shard paths."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    from st_ito_tpu.chain.executor import build_batched_render_fn

    renders = {}
    for i in range(bank.num_instances):
        chain = bank.chain_for(i)
        renders[i] = jax.jit(build_batched_render_fn(
            chain, sample_rate, 2, fast=True, peak_normalize_output=False))

    # Render per instance (one jitted launch per render batch), then shuffle
    # everything across instances before writing shards — shards must be
    # class-mixed or training batches become class-pure (the reference gets
    # this by picking a random tar per example, dataset_param.py:109-125).
    all_in, all_out, all_inst, all_pre, all_tar = [], [], [], [], []
    inst_ids = rng.integers(0, bank.num_instances, num_examples)
    for inst in range(bank.num_instances):
        n = int((inst_ids == inst).sum())
        if n == 0:
            continue
        preset_idx = rng.integers(0, bank.num_presets, n)
        P = int(bank.param_counts[inst])
        W = bank.presets[inst, preset_idx, :P]
        src_ids = rng.integers(0, len(audio_sources), n)
        inputs = np.stack([
            _nonsilent_crop(rng, audio_sources[int(s)], length) for s in src_ids
        ])
        if inputs.shape[1] == 1:
            inputs = np.repeat(inputs, 2, axis=1)
        # render in fixed-size sub-batches (pad the tail) so each instance
        # compiles exactly one program shape
        outs = []
        for s in range(0, n, examples_per_shard):
            Wb = W[s:s + examples_per_shard]
            Xb = inputs[s:s + examples_per_shard]
            nb = len(Wb)
            if nb < examples_per_shard:
                padn = examples_per_shard - nb
                Wb = np.concatenate([Wb, np.tile(Wb[-1:], (padn, 1))])
                Xb = np.concatenate([Xb, np.tile(Xb[-1:], (padn, 1, 1))])
            y = np.asarray(renders[inst](jnp.asarray(Wb, jnp.float32),
                                         jnp.asarray(Xb, jnp.float32)))
            outs.append(y[:nb])
        outputs = np.concatenate(outs)
        peaks = np.abs(outputs).max(axis=(-2, -1), keepdims=True)
        outputs = outputs / np.maximum(peaks, 1e-8)
        all_in.append(inputs.astype(np.float16))
        all_out.append(outputs.astype(np.float16))
        all_inst.append(np.full(n, inst, np.int32))
        all_pre.append(preset_idx.astype(np.int32))
        all_tar.append(
            np.asarray([source_dataset_ids[int(s)] for s in src_ids], np.int32)
            if source_dataset_ids is not None else np.zeros(n, np.int32))

    inputs = np.concatenate(all_in)
    outputs = np.concatenate(all_out)
    inst_arr = np.concatenate(all_inst)
    pre_arr = np.concatenate(all_pre)
    tar_arr = np.concatenate(all_tar)
    perm = rng.permutation(len(inputs))

    shard_paths = []
    for shard_idx, s in enumerate(range(0, len(perm), examples_per_shard)):
        sel = perm[s:s + examples_per_shard]
        path = os.path.join(out_dir, f"shard_{shard_idx:05d}.npz")
        np.savez(
            path,
            inputs=inputs[sel], outputs=outputs[sel],
            instance_index=inst_arr[sel], preset_index=pre_arr[sel],
            tar_index=tar_arr[sel],
        )
        shard_paths.append(path)

    with open(os.path.join(out_dir, "index.json"), "w") as f:
        json.dump({
            "kind": "pretext",
            "num_examples": num_examples,
            "length": length,
            "sample_rate": sample_rate,
            "num_instances": bank.num_instances,
            "num_presets": bank.num_presets,
            "instance_names": bank.instance_names,
            "shards": [os.path.basename(p) for p in shard_paths],
        }, f, indent=2)
    return shard_paths


def generate_style_dataset(
    audio_sources: list[np.ndarray],
    chain: ChainSpec,
    out_dir: str,
    num_examples: int,
    length: int = 131072,
    examples_per_shard: int = 64,
    sample_rate: int = 48000,
    seed: int = 0,
) -> list[str]:
    """Input/output/params triplets through the full chain with random params."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    render = jax.jit(jax.vmap(
        build_render_fn(chain, sample_rate, 2, peak_normalize_output=False),
        in_axes=(0, 0),
    ))

    shard_paths = []
    shard_idx = 0
    remaining = num_examples
    while remaining > 0:
        n = min(examples_per_shard, remaining)
        W = rng.random((n, chain.num_params)).astype(np.float32)
        src_ids = rng.integers(0, len(audio_sources), n)
        inputs = np.stack([
            _nonsilent_crop(rng, audio_sources[int(s)], length) for s in src_ids
        ])
        if inputs.shape[1] == 1:
            inputs = np.repeat(inputs, 2, axis=1)
        outputs = np.asarray(render(jnp.asarray(W), jnp.asarray(inputs, jnp.float32)))

        path = os.path.join(out_dir, f"shard_{shard_idx:05d}.npz")
        np.savez(path, inputs=inputs.astype(np.float16),
                 outputs=outputs.astype(np.float16), params=W)
        shard_paths.append(path)
        shard_idx += 1
        remaining -= n

    with open(os.path.join(out_dir, "index.json"), "w") as f:
        json.dump({
            "kind": "style",
            "num_examples": num_examples,
            "length": length,
            "sample_rate": sample_rate,
            "num_params": chain.num_params,
            "shards": [os.path.basename(p) for p in shard_paths],
        }, f, indent=2)
    return shard_paths
