"""End-to-end training CLI smoke: datagen -> train -> checkpoint -> resume."""

import json
import os

import numpy as np
import pytest
import yaml

from st_ito_tpu.chain import ChainSpec, basic_compressor, basic_gain
from st_ito_tpu.data import generate_pretext_dataset, generate_style_dataset, sample_preset_bank


def _sources(n=2, T=70000):
    out = []
    for i in range(n):
        t = np.arange(T) / 48000
        x = np.sin(2 * np.pi * (110 * (i + 1)) * t) * np.exp(-((t % 0.3) / 0.1))
        out.append(np.stack([x, x * 0.8]).astype(np.float32) * 0.7)
    return out


T_CROP = 33792


def test_pretext_cli_end_to_end(tmp_path):
    from st_ito_tpu.cli.train import main

    bank = sample_preset_bank(["distortion", "gain"], num_presets=2,
                              probe_len=16384)
    shard_dir = str(tmp_path / "data")
    generate_pretext_dataset(_sources(), bank, shard_dir, num_examples=16,
                             length=2 * T_CROP, examples_per_shard=8)

    cfg = {
        "task": "pretext",
        "name": "smoke",
        "seed": 0,
        "max_steps": 3,
        "log_every": 1,
        "ckpt_every": 100,
        "val_every": 2,
        "val_batches": 1,
        "model": {
            "encoder": {"embed_dim": 8, "base_channels": 4},
            "lr": 1e-3,
            "num_instances": 2,
            "num_presets": 2,
        },
        "data": {"shard_dir": shard_dir, "val_shard_dir": shard_dir,
                 "length": T_CROP, "batch_size": 4},
    }
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    run_dir = str(tmp_path / "run")
    main(["--config", cfg_path, "--run-dir", run_dir])

    metrics = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    train_recs = [m for m in metrics if "train_loss" in m]
    assert len(train_recs) == 3
    assert np.isfinite(train_recs[-1]["train_loss"])
    assert any("val_instance_acc" in m for m in metrics)
    assert os.path.exists(os.path.join(run_dir, "confusion", "step2.npy"))
    assert os.path.exists(os.path.join(run_dir, "checkpoints", "last"))
    assert os.path.exists(os.path.join(run_dir, "config.yaml"))

    # resume continues from step 3
    main(["--config", cfg_path, "--run-dir", run_dir, "--resume",
          "--max-steps", "5"])
    metrics = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    assert metrics[-1]["step"] == 5


def test_style_cli_end_to_end(tmp_path):
    from st_ito_tpu.cli.train import main

    chain = ChainSpec(stages=(basic_compressor(), basic_gain()),
                      with_bypass=False)
    shard_dir = str(tmp_path / "data")
    generate_style_dataset(_sources(), chain, shard_dir, num_examples=8,
                           length=T_CROP, examples_per_shard=8)

    cfg = {
        "task": "style",
        "name": "smoke-style",
        "seed": 0,
        "max_steps": 2,
        "log_every": 1,
        "ckpt_every": 100,
        "val_every": 2,
        "model": {
            "encoder": {"embed_dim": 8, "base_channels": 4},
            "chain": ["compressor", "gain"],
            "lr": 1e-3,
            "analysis_length": T_CROP,
            "loss_type": "parameter-regression",
        },
        "data": {"shard_dir": shard_dir, "length": T_CROP, "batch_size": 4},
    }
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    run_dir = str(tmp_path / "run")
    main(["--config", cfg_path, "--run-dir", run_dir])

    metrics = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    assert any("val_audio_loss" in m for m in metrics)
    audio_files = os.listdir(os.path.join(run_dir, "audio"))
    assert len(audio_files) >= 1
