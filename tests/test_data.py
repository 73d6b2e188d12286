"""Preset bank, datagen, and streaming datasets."""

import numpy as np
import jax.numpy as jnp

from st_ito_tpu.data import (
    NpzShardDataset,
    PresetBank,
    StyleShardDataset,
    generate_pretext_dataset,
    generate_style_dataset,
    prefetch_batches,
    sample_preset_bank,
)
from st_ito_tpu.chain import ChainSpec, basic_compressor, basic_distortion

RNG = np.random.default_rng(10)


def _sources(n=3, T=65536):
    out = []
    for i in range(n):
        t = np.arange(T) / 48000
        x = np.sin(2 * np.pi * (110 * (i + 1)) * t) * np.exp(-((t % 0.3) / 0.1))
        out.append(np.stack([x, x * 0.9]).astype(np.float32) * 0.7)
    return out


def test_sample_preset_bank(tmp_path):
    bank = sample_preset_bank(["distortion", "gain"], num_presets=3,
                              probe_len=16384, seed=0)
    assert bank.num_instances == 2 and bank.num_presets == 3
    assert (bank.presets >= 0).all() and (bank.presets <= 1).all()
    path = str(tmp_path / "bank.npz")
    bank.save(path)
    bank2 = PresetBank.load(path)
    assert bank2.instance_names == bank.instance_names
    np.testing.assert_allclose(bank2.presets, bank.presets)


def test_pretext_datagen_and_dataset(tmp_path):
    bank = sample_preset_bank(["distortion", "compressor"], num_presets=2,
                              probe_len=16384, seed=0)
    out_dir = str(tmp_path / "pretext")
    paths = generate_pretext_dataset(
        _sources(), bank, out_dir, num_examples=24, length=32768,
        examples_per_shard=8, seed=0,
    )
    assert len(paths) == 3

    ds = NpzShardDataset(out_dir, length=16384, batch_size=4, seed=0)
    batches = list(ds)
    assert len(batches) == 6
    b = batches[0]
    assert b["inputs"].shape == (4, 2, 16384)
    assert b["outputs"].shape == (4, 2, 16384)
    assert b["instance_index"].max() < 2
    assert np.isfinite(b["outputs"]).all()


def test_style_datagen_and_dataset(tmp_path):
    chain = ChainSpec(stages=(basic_compressor(), basic_distortion()),
                      with_bypass=False)
    out_dir = str(tmp_path / "style")
    generate_style_dataset(_sources(), chain, out_dir, num_examples=16,
                           length=32768, examples_per_shard=8, seed=0)
    ds = StyleShardDataset(out_dir, length=16384, batch_size=4)
    b = next(iter(ds))
    assert b["input_audio"].shape == (4, 2, 16384)
    assert b["target_audio"].shape == (4, 2, 16384)
    assert b["target_params"].shape == (4, chain.num_params)


def test_prefetch():
    items = list(prefetch_batches(iter(range(10)), buffer_size=3))
    assert items == list(range(10))


def test_pretext_dataset_workers_and_logits(tmp_path):
    """Thread-pool shard decoding yields the same example set, and sibling
    logits files flow through as content_logits (scripts/label_audio.py)."""
    bank = sample_preset_bank(["distortion", "compressor"], num_presets=2,
                              probe_len=16384, seed=0)
    out_dir = str(tmp_path / "pretext")
    paths = generate_pretext_dataset(
        _sources(), bank, out_dir, num_examples=24, length=32768,
        examples_per_shard=8, seed=0,
    )
    # sibling logits: shard_XXX_logits.npz with (N, C)
    for p in paths:
        with np.load(p) as d:
            n = len(d["inputs"])
        np.savez(p[:-4] + "_logits.npz",
                 logits=RNG.standard_normal((n, 5)).astype(np.float32))

    ds0 = NpzShardDataset(out_dir, length=16384, batch_size=4, seed=0)
    seq = list(ds0)
    assert all("content_logits" in b for b in seq)
    assert seq[0]["content_logits"].shape == (4, 5)

    ds2 = NpzShardDataset(out_dir, length=16384, batch_size=4, seed=0,
                          num_workers=2)
    par = list(ds2)
    assert len(par) == len(seq)  # 24 examples -> 6 full batches either way
    # same multiset of examples (match by instance/preset indices)
    key = lambda b: sorted(zip(b["instance_index"].tolist(),
                               b["preset_index"].tolist()))
    all_seq = sorted(sum((key(b) for b in seq), []))
    all_par = sorted(sum((key(b) for b in par), []))
    assert all_seq == all_par
