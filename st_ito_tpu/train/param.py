"""Pretext training: classify which effect instance/preset produced a clip.

Functional JAX port of the reference's ParameterEstimator LightningModule
(reference: st_ito/methods/param.py:43-359):

- encoder(outputs) -> (mid, side); optional L2 norm
- embed_mode blind: feats = [out_mid ‖ out_side]
          diff:  feats = [in_mid - out_mid ‖ in_side - out_side]
          concat: feats = [in_mid ‖ out_mid ‖ in_side ‖ out_side]
- instance head: MLP(feats) -> num_instances, CE
- preset head: MLP([instance_logits ‖ feats]) -> num_presets, CE
- optional adversarial content-invariance: the generator minimizes the
  NEGATED discriminator CE on dataset-id (or pre-computed classifier
  logits), the discriminator trains on detached feats with its own Adam —
  two optimizers, mirroring the reference's manual optimization.

Data parallelism: ``make_param_train_step(cfg, mesh)`` shards the batch over
the "data" mesh axis; XLA's SPMD partitioner inserts the gradient
all-reduce (the NCCL AllReduce of Lightning DDP).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any

import chex
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from st_ito_tpu.models.cnn14 import Cnn14Config, cnn14_apply, init_cnn14_params


@dataclasses.dataclass(frozen=True)
class ParamEstimatorConfig:
    encoder: Any = Cnn14Config()  # Cnn14Config | DsTCNConfig (hashable)
    encoder_type: str = "cnn14"  # cnn14 | dstcn
    lr: float = 1e-4
    num_instances: int = 63
    num_presets: int = 10
    num_adv_classes: int = 0
    adv_logits_type: str = "dataset"  # or "classifier"
    adv_weight: float = 1.0
    weight_decay: float = 1e-4
    embed_mode: str = "concat"  # blind | diff | concat
    norm: str | None = "L2"

    @property
    def head_input_dim(self) -> int:
        d = self.encoder.embed_dim
        return 4 * d if self.embed_mode == "concat" else 2 * d


def _encoder_init(key, cfg: "ParamEstimatorConfig"):
    if cfg.encoder_type == "cnn14":
        return init_cnn14_params(key, cfg.encoder)
    if cfg.encoder_type == "dstcn":
        from st_ito_tpu.models.encoders import init_dstcn_params

        return init_dstcn_params(key, cfg.encoder)
    if cfg.encoder_type == "gcn":
        from st_ito_tpu.models.gcn import init_deepgcn_params

        return init_deepgcn_params(key, cfg.encoder)
    if cfg.encoder_type == "htsat":
        from st_ito_tpu.models.htsat import init_htsat_params

        return init_htsat_params(key, cfg.encoder)
    if cfg.encoder_type == "clap":
        from st_ito_tpu.models.clap import init_clap_audio_params

        return init_clap_audio_params(key, cfg.encoder)
    if cfg.encoder_type == "clap-laion":
        # the "-pt" variant: initialize from the converted LAION checkpoint
        # when present, else random (== training from scratch)
        from st_ito_tpu.models.clap_laion import load_clap_laion_model

        return load_clap_laion_model(
            ckpt_path=cfg.encoder.ckpt_path, allow_random=True,
            seed=int(jax.random.randint(key, (), 0, 2**31 - 1))).params
    raise ValueError(f"unknown encoder_type: {cfg.encoder_type}")


def _encoder_apply(params, x, cfg: "ParamEstimatorConfig", training, rng,
                   return_stats: bool = False):
    if cfg.encoder_type == "cnn14":
        if return_stats and training:
            return cnn14_apply(params, x, cfg.encoder, training=True,
                               rng=rng, return_stats=True)
        out = cnn14_apply(params, x, cfg.encoder, training=training, rng=rng)
        return (*out, {}) if return_stats else out
    if cfg.encoder_type == "dstcn":
        # dsTCN has no BatchNorm (PReLU + residual convs) — nothing to track
        from st_ito_tpu.models.encoders import dstcn_apply

        out = dstcn_apply(params, x, cfg.encoder, training=training, rng=rng)
    elif cfg.encoder_type == "gcn":
        from st_ito_tpu.models.gcn import deepgcn_apply

        if return_stats and training:
            return deepgcn_apply(params, x, cfg.encoder, training=True,
                                 rng=rng, return_stats=True)
        out = deepgcn_apply(params, x, cfg.encoder, training=training, rng=rng)
    elif cfg.encoder_type == "clap":
        # CLAP tower = HTS-AT, LayerNorm-only — no running statistics
        from st_ito_tpu.models.clap import clap_audio_apply

        out = clap_audio_apply(params, x, cfg.encoder, training=training,
                               rng=rng)
    elif cfg.encoder_type == "clap-laion":
        # checkpoint-faithful LAION tower (input BN stays on its frozen
        # running stats — no stats to merge)
        from st_ito_tpu.models.clap_laion import clap_laion_pretext_apply

        out = clap_laion_pretext_apply(params, x, cfg.encoder,
                                       training=training, rng=rng)
    else:
        # HTS-AT is LayerNorm-only — no running statistics exist
        from st_ito_tpu.models.htsat import htsat_apply

        out = htsat_apply(params, x, cfg.encoder, training=training, rng=rng)
    return (*out, {}) if return_stats else out


@chex.dataclass
class ParamTrainState:
    params: Any  # {"encoder", "instance_estimator", "preset_estimator", ["discriminator"]}
    opt_state: Any
    d_opt_state: Any
    step: jnp.ndarray


def _init_mlp(key, in_dim, out_dim):
    k1, k2 = jax.random.split(key)
    h = 2 * in_dim

    def xavier(k, o, i):
        a = math.sqrt(6.0 / (i + o))
        return jax.random.uniform(k, (o, i), jnp.float32, -a, a)

    return {
        "fc1": {"weight": xavier(k1, h, in_dim), "bias": jnp.zeros(h)},
        "fc2": {"weight": xavier(k2, out_dim, h), "bias": jnp.zeros(out_dim)},
    }


def _mlp(p, x):
    x = x @ p["fc1"]["weight"].T + p["fc1"]["bias"]
    x = jax.nn.relu(x)
    return x @ p["fc2"]["weight"].T + p["fc2"]["bias"]


def _gen_optimizer(cfg: ParamEstimatorConfig) -> optax.GradientTransformation:
    return optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)


def _d_optimizer(cfg: ParamEstimatorConfig) -> optax.GradientTransformation:
    return optax.adam(cfg.lr)


def init_param_estimator(key, cfg: ParamEstimatorConfig) -> ParamTrainState:
    k_enc, k_inst, k_pre, k_disc = jax.random.split(key, 4)
    in_dim = cfg.head_input_dim
    params = {
        "encoder": _encoder_init(k_enc, cfg),
        "instance_estimator": _init_mlp(k_inst, in_dim, cfg.num_instances),
    }
    if cfg.num_presets > 0:
        params["preset_estimator"] = _init_mlp(
            k_pre, in_dim + cfg.num_instances, cfg.num_presets
        )
    if cfg.num_adv_classes > 0:
        params["discriminator"] = _init_mlp(k_disc, in_dim, cfg.num_adv_classes)

    gen_params = {k: v for k, v in params.items() if k != "discriminator"}
    opt_state = _gen_optimizer(cfg).init(gen_params)
    d_opt_state = (
        _d_optimizer(cfg).init(params["discriminator"])
        if cfg.num_adv_classes > 0 else ()
    )
    return ParamTrainState(
        params=params, opt_state=opt_state, d_opt_state=d_opt_state,
        step=jnp.zeros((), jnp.int32),
    )


def _compute_feats(params, cfg: ParamEstimatorConfig, inputs, outputs,
                   training, rng):
    """Returns (feats, bn_stats_updates). BN running stats are taken from
    the outputs-forward (the torch reference updates them on every forward;
    one representative update per step is sufficient and keeps the program
    functional)."""
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    out_mid, out_side, bn_stats = _encoder_apply(
        params["encoder"], outputs, cfg, training, r1, return_stats=True)
    if cfg.norm == "L2":
        out_mid = out_mid / jnp.maximum(
            jnp.linalg.norm(out_mid, axis=-1, keepdims=True), 1e-12)
        out_side = out_side / jnp.maximum(
            jnp.linalg.norm(out_side, axis=-1, keepdims=True), 1e-12)

    if cfg.embed_mode == "blind":
        return jnp.concatenate([out_mid, out_side], axis=-1), bn_stats

    in_mid, in_side = _encoder_apply(params["encoder"], inputs, cfg,
                                     training, r2)
    if cfg.norm == "L2":
        in_mid = in_mid / jnp.maximum(
            jnp.linalg.norm(in_mid, axis=-1, keepdims=True), 1e-12)
        in_side = in_side / jnp.maximum(
            jnp.linalg.norm(in_side, axis=-1, keepdims=True), 1e-12)

    if cfg.embed_mode == "diff":
        return (jnp.concatenate([in_mid - out_mid, in_side - out_side],
                                axis=-1), bn_stats)
    # concat (deployed AFx-Rep config)
    return (jnp.concatenate([in_mid, out_mid, in_side, out_side], axis=-1),
            bn_stats)


def param_estimator_loss(params, cfg: ParamEstimatorConfig, batch,
                         training: bool, rng):
    """Returns (loss, (metrics, feats, bn_stats))."""
    feats, bn_stats = _compute_feats(params, cfg, batch["inputs"],
                                     batch["outputs"], training, rng)
    instance_logits = _mlp(params["instance_estimator"], feats)
    instance_loss = optax.softmax_cross_entropy_with_integer_labels(
        instance_logits, batch["instance_index"]).mean()
    loss = instance_loss
    metrics = {"instance_loss": instance_loss}
    metrics["instance_acc"] = jnp.mean(
        (jnp.argmax(instance_logits, -1) == batch["instance_index"]).astype(jnp.float32)
    )

    if cfg.num_presets > 0:
        concat = jnp.concatenate([instance_logits, feats], axis=-1)
        preset_logits = _mlp(params["preset_estimator"], concat)
        preset_loss = optax.softmax_cross_entropy_with_integer_labels(
            preset_logits, batch["preset_index"]).mean()
        loss = loss + preset_loss
        metrics["preset_loss"] = preset_loss
        metrics["preset_acc"] = jnp.mean(
            (jnp.argmax(preset_logits, -1) == batch["preset_index"]).astype(jnp.float32)
        )

    if cfg.num_adv_classes > 0:
        adv_logits = _mlp(params["discriminator"], feats)
        if cfg.adv_logits_type == "classifier":
            target = jax.nn.softmax(batch["content_logits"], axis=-1)
            adv_loss = -optax.softmax_cross_entropy(adv_logits, target).mean()
        else:
            adv_loss = -optax.softmax_cross_entropy_with_integer_labels(
                adv_logits, batch["tar_index"]).mean()
        loss = loss + adv_loss
        metrics["adv_loss"] = adv_loss

    metrics["loss"] = loss
    return loss, (metrics, feats, bn_stats)


def _train_step(state: ParamTrainState, batch, rng, cfg: ParamEstimatorConfig):
    gen_opt = _gen_optimizer(cfg)

    def gen_loss(gen_params):
        params = dict(gen_params)
        if "discriminator" in state.params:
            params["discriminator"] = jax.lax.stop_gradient(
                state.params["discriminator"])
        return param_estimator_loss(params, cfg, batch, True, rng)

    gen_params = {k: v for k, v in state.params.items() if k != "discriminator"}
    (loss, (metrics, feats, bn_stats)), grads = jax.value_and_grad(
        gen_loss, has_aux=True)(gen_params)
    updates, opt_state = gen_opt.update(grads, state.opt_state, gen_params)
    gen_params = optax.apply_updates(gen_params, updates)
    new_params = dict(gen_params)

    # merge BatchNorm running-stat updates (non-gradient state, like torch's
    # in-place running_mean/var updates during training)
    if bn_stats:
        from st_ito_tpu.models.bn_stats import merge_bn_stats

        new_params["encoder"] = merge_bn_stats(new_params["encoder"], bn_stats)

    d_opt_state = state.d_opt_state
    if cfg.num_adv_classes > 0:
        d_opt = _d_optimizer(cfg)
        feats_d = jax.lax.stop_gradient(feats)

        def d_loss_fn(d_params):
            adv_logits = _mlp(d_params, feats_d)
            if cfg.adv_logits_type == "classifier":
                target = jax.nn.softmax(batch["content_logits"], axis=-1)
                d_loss = optax.softmax_cross_entropy(adv_logits, target).mean()
            else:
                d_loss = optax.softmax_cross_entropy_with_integer_labels(
                    adv_logits, batch["tar_index"]).mean()
            return d_loss * cfg.adv_weight

        d_params = state.params["discriminator"]
        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_params)
        d_updates, d_opt_state = d_opt.update(d_grads, d_opt_state, d_params)
        new_params["discriminator"] = optax.apply_updates(d_params, d_updates)
        metrics["d_loss"] = d_loss

    new_state = ParamTrainState(
        params=new_params, opt_state=opt_state, d_opt_state=d_opt_state,
        step=state.step + 1,
    )
    return new_state, metrics


def make_param_train_step(cfg: ParamEstimatorConfig, mesh: Mesh | None = None):
    """Jitted train_step(state, batch, rng) -> (state, metrics).

    With ``mesh`` (axis "data"), batch arrays are sharded over devices and
    the parameter gradients are reduced by XLA SPMD — pure data parallelism.
    """
    step = partial(_train_step, cfg=cfg)
    if mesh is None:
        return jax.jit(step)

    batch_sharding = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    batch_spec = {
        "inputs": batch_sharding,
        "outputs": batch_sharding,
        "instance_index": batch_sharding,
        "preset_index": batch_sharding,
        "tar_index": batch_sharding,
    }
    if cfg.num_adv_classes > 0 and cfg.adv_logits_type == "classifier":
        batch_spec["content_logits"] = batch_sharding

    def place(state, batch, rng):
        batch = {
            k: jax.device_put(v, batch_spec.get(k, batch_sharding))
            for k, v in batch.items()
        }
        state = jax.device_put(state, rep)
        return jax.jit(step)(state, batch, rng)

    return place


def make_param_train_block(cfg: ParamEstimatorConfig, k: int,
                           augment: bool = False):
    """k pretext training steps as ONE jitted lax.scan dispatch over a
    device-resident example pool. Same motivation as
    StyleTransferSystem.make_train_block: per-step dispatch through the
    tunneled TPU relay dominates wall-clock, and per-step batch uploads
    leak host RSS without bound (PERF_NOTES "Relay host-memory leak").

    block(state, pool, idx, rng) -> (state, losses (k,)); pool is the
    full example dict ({"inputs" (N, C, T), "outputs", "instance_index",
    "preset_index", "tar_index", ...}) resident on device, idx (k, bs)
    int32 gather indices.

    ``augment=True`` reproduces NpzShardDataset's per-epoch augmentation
    ON DEVICE (the pool stays un-augmented): independent 0..-32 dB gains
    for inputs/outputs, joint LR flip per example
    (reference: dataset_param.py:218-232)."""
    step = partial(_train_step, cfg=cfg)

    def block_impl(state, pool, idx, rng):
        def one(state, xs):
            ind, r = xs
            batch = {name: jnp.take(arr, ind, axis=0)
                     for name, arr in pool.items()}
            if augment:
                ra, rb, rc, r = jax.random.split(r, 4)
                bs = batch["inputs"].shape[0]
                gi = 10.0 ** (-jax.random.uniform(ra, (bs,)) * 32.0 / 20.0)
                go = 10.0 ** (-jax.random.uniform(rb, (bs,)) * 32.0 / 20.0)
                flip = jax.random.uniform(rc, (bs,)) < 0.5

                def fl(x):
                    return jnp.where(flip[:, None, None], x[:, ::-1, :], x)

                batch["inputs"] = fl(batch["inputs"] * gi[:, None, None])
                batch["outputs"] = fl(batch["outputs"] * go[:, None, None])
            state, metrics = step(state, batch, r)
            return state, metrics["loss"]

        rngs = jax.random.split(rng, k)
        return jax.lax.scan(one, state, (idx, rngs))

    return jax.jit(block_impl)
