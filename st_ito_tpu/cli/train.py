"""Training CLI — YAML-config-driven, the LightningCLI equivalent
(reference: scripts/main.py + cfg/*.yaml).

    python -m st_ito_tpu.cli.train --config cfg/pretext-panns.yaml \
        [--max-steps N] [--shard-dir DIR] [--run-dir DIR] [--num-devices N]

Subsystems the reference got from Lightning, provided natively:
- checkpoint/resume via orbax (save-last + best-val, like ModelCheckpoint)
- the config is copied into the run dir (MoveConfigCallback,
  reference: st_ito/callbacks.py:76-94)
- metrics stream to stdout and runs/<name>/metrics.jsonl (WandbLogger
  replacement; set STITO_WANDB=1 to also log to wandb when installed)
- validation audio snapshots for the style task (LogAudioCallback,
  reference: st_ito/callbacks.py:17-73) and a confusion matrix for the
  pretext task (ConfusionMatrixCallback, reference: callbacks.py:97-164)
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import yaml


def load_config(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def _encoder_config(d: dict, encoder_type: str = "cnn14"):
    if encoder_type == "dstcn":
        from st_ito_tpu.models.encoders import DsTCNConfig

        return DsTCNConfig(**d)
    if encoder_type == "gcn":
        from st_ito_tpu.models.gcn import DeepGCNConfig

        return DeepGCNConfig(**d)
    if encoder_type == "htsat":
        from st_ito_tpu.models.htsat import HTSATConfig

        d = dict(d)
        for k in ("depths", "heads"):
            if k in d:
                d[k] = tuple(d[k])
        return HTSATConfig(**d)
    if encoder_type == "clap":
        from st_ito_tpu.models.clap import CLAPAudioConfig

        d = dict(d)
        if "tower" in d:
            d["tower"] = _encoder_config(d["tower"], "htsat")
        return CLAPAudioConfig(**d)
    if encoder_type == "clap-laion":
        from st_ito_tpu.models.clap_laion import ClapLaionConfig

        d = dict(d)
        for k in ("depths", "heads"):
            if k in d:
                d[k] = tuple(d[k])
        return ClapLaionConfig(**d)
    from st_ito_tpu.models.cnn14 import Cnn14Config

    return Cnn14Config(**d)


def _build_chain(spec):
    from st_ito_tpu.chain import (
        EFFECT_REGISTRY,
        ChainSpec,
        basic_chain,
        chain_from_json,
        chain_preset,
    )

    if spec in (None, "basic"):
        return basic_chain(with_bypass=False)
    if isinstance(spec, str) and spec.endswith(".json"):
        # the reference's vst_json chain spec (methods/style.py:545)
        return chain_from_json(spec, with_bypass=False)
    if isinstance(spec, str):
        return chain_preset(spec, with_bypass=False)
    if isinstance(spec, list):
        return ChainSpec(
            stages=tuple(EFFECT_REGISTRY[name]() for name in spec),
            with_bypass=False,
        )
    raise ValueError(f"bad chain spec: {spec}")


class MetricsLogger:
    def __init__(self, run_dir: str):
        self.path = os.path.join(run_dir, "metrics.jsonl")
        self._wandb = None
        if os.environ.get("STITO_WANDB") == "1":
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project="st-ito-tpu", dir=run_dir)
            except ImportError:
                pass

    def log(self, step: int, metrics: dict, prefix: str = "train"):
        rec = {"step": step, **{f"{prefix}_{k}": float(v) for k, v in metrics.items()}}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log(rec, step=step)
        msg = "  ".join(f"{k}={v:.4f}" for k, v in rec.items() if k != "step")
        print(f"step {step:6d}  {msg}")


def save_checkpoint(ckpt_dir: str, state, step: int, tag: str = "last"):
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, tag))
    ckptr = ocp.StandardCheckpointer()
    state = jax.device_get(state)
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    with open(os.path.join(ckpt_dir, f"{tag}.step"), "w") as f:
        f.write(str(step))


def restore_checkpoint(ckpt_dir: str, state, tag: str = "last"):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, tag))
    if not os.path.exists(path):
        return state, 0
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, target=state)
    step_file = os.path.join(ckpt_dir, f"{tag}.step")
    step = int(open(step_file).read()) if os.path.isfile(step_file) else 0
    return restored, step


def _confusion_matrix(preds: np.ndarray, labels: np.ndarray, n: int) -> np.ndarray:
    cm = np.zeros((n, n), np.int64)
    for p, l in zip(preds, labels):
        cm[l, p] += 1
    return cm


def train_pretext(cfg: dict, args) -> None:
    import jax
    import jax.numpy as jnp

    from st_ito_tpu.data import NpzShardDataset, prefetch_batches
    from st_ito_tpu.train import (
        ParamEstimatorConfig,
        init_param_estimator,
        make_param_train_step,
    )
    from st_ito_tpu.train.param import param_estimator_loss

    model_cfg = dict(cfg.get("model", {}))
    encoder_type = model_cfg.get("encoder_type", "cnn14")
    enc = _encoder_config(model_cfg.pop("encoder", {}), encoder_type)
    pcfg = ParamEstimatorConfig(encoder=enc, **model_cfg)

    run_dir = args.run_dir or os.path.join("runs", cfg.get("name", "pretext"))
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)
    logger = MetricsLogger(run_dir)

    mesh = None
    n_dev = args.num_devices or cfg.get("num_devices", 0)
    if n_dev and n_dev > 1:
        from st_ito_tpu.parallel import make_mesh

        mesh = make_mesh(n_dev, "data")

    state = init_param_estimator(jax.random.PRNGKey(cfg.get("seed", 0)), pcfg)
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    if args.resume:
        state, start_step = restore_checkpoint(ckpt_dir, state)
        print(f"resumed from step {start_step}")

    step_fn = make_param_train_step(pcfg, mesh=mesh)

    data_cfg = cfg.get("data", {})
    shard_dir = args.shard_dir or data_cfg["shard_dir"]
    ds = NpzShardDataset(
        shard_dir,
        length=data_cfg.get("length", 262144),
        batch_size=data_cfg.get("batch_size", 32),
        seed=cfg.get("seed", 0),
    )

    val_ds = None
    val_dir = args.val_shard_dir or data_cfg.get("val_shard_dir")
    if val_dir:
        val_ds = NpzShardDataset(
            val_dir, length=data_cfg.get("length", 262144),
            batch_size=data_cfg.get("batch_size", 32),
            seed=cfg.get("seed", 0) + 1,
            random_gain=False, random_flip=False,
        )

    max_steps = args.max_steps or cfg.get("max_steps", 1000)
    log_every = cfg.get("log_every", 25)
    ckpt_every = cfg.get("ckpt_every", 500)
    val_every = cfg.get("val_every", 0)
    rng = jax.random.PRNGKey(cfg.get("seed", 0))

    eval_loss = jax.jit(lambda p, b, r: param_estimator_loss(p, pcfg, b, False, r))

    def run_validation(step, rng):
        """Val loss/acc + confusion matrix snapshot
        (ConfusionMatrixCallback equivalent, reference: callbacks.py:97-164)."""
        losses, preds, labels = [], [], []
        for vi, vbatch in enumerate(iter(val_ds)):
            if vi >= cfg.get("val_batches", 8):
                break
            vbatch = {k: jnp.asarray(v) for k, v in vbatch.items()}
            rng, sub = jax.random.split(rng)
            loss, (vmetrics, feats, _) = eval_loss(state.params, vbatch, sub)
            losses.append(float(loss))
            from st_ito_tpu.train.param import _mlp

            logits = _mlp(state.params["instance_estimator"], feats)
            preds.append(np.asarray(jnp.argmax(logits, -1)))
            labels.append(np.asarray(vbatch["instance_index"]))
        if not losses:
            return
        preds = np.concatenate(preds)
        labels = np.concatenate(labels)
        acc = float((preds == labels).mean())
        logger.log(step, {"loss": float(np.mean(losses)), "instance_acc": acc},
                   prefix="val")
        cm = _confusion_matrix(preds, labels, pcfg.num_instances)
        cm_dir = os.path.join(run_dir, "confusion")
        os.makedirs(cm_dir, exist_ok=True)
        np.save(os.path.join(cm_dir, f"step{step}.npy"), cm)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(5, 4))
            ax.imshow(cm, cmap="viridis")
            ax.set_xlabel("predicted")
            ax.set_ylabel("true")
            fig.savefig(os.path.join(cm_dir, f"step{step}.png"), dpi=120)
            plt.close(fig)
        except Exception:
            pass

    step = int(state.step)
    t0 = time.time()
    while step < max_steps:
        for batch in prefetch_batches(iter(ds)):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, batch, sub)
            step = int(state.step)
            if step % log_every == 0:
                metrics = jax.device_get(metrics)
                metrics["examples_per_sec"] = (
                    log_every * len(batch["inputs"]) / max(time.time() - t0, 1e-9)
                )
                t0 = time.time()
                logger.log(step, metrics)
            if val_ds is not None and val_every and step % val_every == 0:
                rng, sub = jax.random.split(rng)
                run_validation(step, sub)
            if step % ckpt_every == 0:
                save_checkpoint(ckpt_dir, state, step)
            if step >= max_steps:
                break
    save_checkpoint(ckpt_dir, state, step)
    # export the encoder for load_param_model interop
    from st_ito_tpu.models.registry import export_encoder_npz

    export_path = os.path.join(run_dir, "encoder.npz")
    export_encoder_npz(jax.device_get(state.params["encoder"]), export_path,
                       config=pcfg.encoder)
    print(f"done at step {step}; checkpoints in {ckpt_dir}; "
          f"encoder exported to {export_path}")


def train_style(cfg: dict, args) -> None:
    import jax
    import jax.numpy as jnp

    from st_ito_tpu.data import StyleShardDataset, prefetch_batches
    from st_ito_tpu.train.style import StyleTransferConfig, StyleTransferSystem
    from st_ito_tpu.utils import save_audio

    model_cfg = dict(cfg.get("model", {}))
    enc = _encoder_config(model_cfg.pop("encoder", {}))
    chain = _build_chain(model_cfg.pop("chain", "basic"))
    scfg = StyleTransferConfig(encoder=enc, **model_cfg)
    system = StyleTransferSystem(scfg, chain=chain)

    run_dir = args.run_dir or os.path.join("runs", cfg.get("name", "style"))
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)
    logger = MetricsLogger(run_dir)

    mesh = None
    n_dev = args.num_devices or cfg.get("num_devices", 0)
    if n_dev and n_dev > 1:
        from st_ito_tpu.parallel import make_mesh

        mesh = make_mesh(n_dev, "data")

    state = system.init(jax.random.PRNGKey(cfg.get("seed", 0)))
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    if args.resume:
        state, start_step = restore_checkpoint(ckpt_dir, state)
        print(f"resumed from step {start_step}")

    step_fn = system.make_train_step(mesh=mesh)
    eval_fn = system.make_eval_step()

    data_cfg = cfg.get("data", {})
    shard_dir = args.shard_dir or data_cfg["shard_dir"]
    ds = StyleShardDataset(
        shard_dir,
        length=data_cfg.get("length", 131072),
        batch_size=data_cfg.get("batch_size", 16),
        seed=cfg.get("seed", 0),
        input_only=scfg.on_the_fly,
    )

    max_steps = args.max_steps or cfg.get("max_steps", 1000)
    log_every = cfg.get("log_every", 25)
    ckpt_every = cfg.get("ckpt_every", 500)
    val_every = cfg.get("val_every", 0)
    rng = jax.random.PRNGKey(cfg.get("seed", 0))

    step = int(state.step)
    while step < max_steps:
        for batch in prefetch_batches(iter(ds)):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, batch, sub)
            step = int(state.step)
            if step % log_every == 0:
                logger.log(step, jax.device_get(metrics))
            if val_every and step % val_every == 0:
                rng, sub = jax.random.split(rng)
                _, (vmetrics, aux) = eval_fn(state.params, batch, sub)
                logger.log(step, jax.device_get(vmetrics), prefix="val")
                # audio snapshot (LogAudioCallback equivalent)
                audio_dir = os.path.join(run_dir, "audio")
                os.makedirs(audio_dir, exist_ok=True)
                out = np.asarray(aux["output_audio"][0])
                out = out / max(np.abs(out).max(), 1e-8)
                save_audio(os.path.join(audio_dir, f"val_step{step}.wav"),
                           out, scfg.sample_rate)
            if step % ckpt_every == 0:
                save_checkpoint(ckpt_dir, state, step)
            if step >= max_steps:
                break
    save_checkpoint(ckpt_dir, state, step)
    print(f"done at step {step}; checkpoints in {ckpt_dir}")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--max-steps", type=int, default=0)
    parser.add_argument("--shard-dir", type=str, default=None)
    parser.add_argument("--val-shard-dir", type=str, default=None)
    parser.add_argument("--run-dir", type=str, default=None)
    parser.add_argument("--num-devices", type=int, default=0)
    parser.add_argument("--resume", action="store_true")
    args = parser.parse_args(argv)

    from st_ito_tpu.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    cfg = load_config(args.config)
    task = cfg.get("task", "pretext")
    if task == "pretext":
        train_pretext(cfg, args)
    elif task == "style":
        train_style(cfg, args)
    else:
        raise ValueError(f"unknown task: {task}")


if __name__ == "__main__":
    main()
