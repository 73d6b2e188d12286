"""Pretext training: loss decreases, adversarial two-optimizer path, and
data-parallel sharded execution on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from st_ito_tpu.models.cnn14 import Cnn14Config
from st_ito_tpu.train import (
    ParamEstimatorConfig,
    init_param_estimator,
    make_param_train_step,
)
from st_ito_tpu.parallel import make_mesh

RNG = np.random.default_rng(8)


def _toy_batch(bs=8, T=33792, n_inst=4, n_pre=2, n_tar=2):
    # deterministic class-dependent signal so the task is learnable
    inputs = RNG.standard_normal((bs, 2, T)).astype(np.float32) * 0.1
    inst = RNG.integers(0, n_inst, bs)
    outputs = inputs.copy()
    for b in range(bs):
        gain = 0.25 + 0.25 * inst[b]
        outputs[b] = np.tanh(inputs[b] * (1.0 + 3.0 * inst[b])) * gain
    return {
        "inputs": jnp.asarray(inputs),
        "outputs": jnp.asarray(outputs),
        "instance_index": jnp.asarray(inst, jnp.int32),
        "preset_index": jnp.asarray(RNG.integers(0, n_pre, bs), jnp.int32),
        "tar_index": jnp.asarray(RNG.integers(0, n_tar, bs), jnp.int32),
    }


def _small_cfg(**kw):
    return ParamEstimatorConfig(
        encoder=Cnn14Config(embed_dim=16, base_channels=4),
        num_instances=4, num_presets=2, lr=3e-4, **kw,
    )


def test_train_step_decreases_loss():
    cfg = _small_cfg()
    state = init_param_estimator(jax.random.PRNGKey(0), cfg)
    step = make_param_train_step(cfg)
    batch = _toy_batch()
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


def test_train_step_adversarial():
    cfg = _small_cfg(num_adv_classes=2)
    state = init_param_estimator(jax.random.PRNGKey(0), cfg)
    step = make_param_train_step(cfg)
    batch = _toy_batch()
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert "adv_loss" in metrics and "d_loss" in metrics
    assert np.isfinite(float(metrics["d_loss"]))


def test_train_step_sharded_matches_single():
    """DP on the 8-device mesh computes the same update as single device."""
    cfg = _small_cfg()
    batch = _toy_batch(bs=8)

    state1 = init_param_estimator(jax.random.PRNGKey(0), cfg)
    step1 = make_param_train_step(cfg)
    state1, m1 = step1(state1, batch, jax.random.PRNGKey(5))

    mesh = make_mesh(8, "data")
    state2 = init_param_estimator(jax.random.PRNGKey(0), cfg)
    step2 = make_param_train_step(cfg, mesh=mesh)
    state2, m2 = step2(state2, batch, jax.random.PRNGKey(5))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    w1 = np.asarray(state1.params["instance_estimator"]["fc2"]["weight"])
    w2 = np.asarray(state2.params["instance_estimator"]["fc2"]["weight"])
    np.testing.assert_allclose(w1, w2, atol=1e-5)


def test_blind_and_diff_modes():
    for mode in ["blind", "diff"]:
        cfg = _small_cfg(embed_mode=mode)
        state = init_param_estimator(jax.random.PRNGKey(0), cfg)
        step = make_param_train_step(cfg)
        state, metrics = step(state, _toy_batch(bs=4), jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))


def test_bn_running_stats_updated():
    """Training must update encoder BatchNorm running statistics (the torch
    reference does this in-place; the functional port merges updates into
    the param tree each step)."""
    cfg = _small_cfg()
    state = init_param_estimator(jax.random.PRNGKey(0), cfg)
    rm0 = np.asarray(state.params["encoder"]["conv_block1"]["bn1"]["running_mean"])
    step = make_param_train_step(cfg)
    state, _ = step(state, _toy_batch(bs=4), jax.random.PRNGKey(0))
    rm1 = np.asarray(state.params["encoder"]["conv_block1"]["bn1"]["running_mean"])
    assert not np.allclose(rm0, rm1)
    rv1 = np.asarray(state.params["encoder"]["conv_block1"]["bn1"]["running_var"])
    assert np.isfinite(rv1).all() and (rv1 > 0).all()


def test_param_train_block_matches_stepwise():
    """make_param_train_block(k) (one lax.scan dispatch over a device
    pool) must track k make_param_train_step calls fed the same batches
    and per-step rngs (scan-fused float reassociation tolerance)."""
    from st_ito_tpu.train.param import make_param_train_block

    cfg = _small_cfg()
    state0 = init_param_estimator(jax.random.PRNGKey(0), cfg)
    pool = _toy_batch(bs=6)
    k, bs = 3, 4
    idx = jnp.asarray(RNG.integers(0, 6, (k, bs)), jnp.int32)
    rng = jax.random.PRNGKey(5)

    block = make_param_train_block(cfg, k)
    state_blk, losses = block(state0, pool, idx, rng)
    assert losses.shape == (k,) and bool(jnp.isfinite(losses).all())

    step = make_param_train_step(cfg)
    state_ref = state0
    rngs = jax.random.split(rng, k)
    ref_losses = []
    for i in range(k):
        batch = {n: jnp.take(a, idx[i], axis=0) for n, a in pool.items()}
        state_ref, metrics = step(state_ref, batch, rngs[i])
        ref_losses.append(float(metrics["loss"]))
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref_losses),
                               rtol=1e-5, atol=1e-6)
    for x, y in zip(jax.tree_util.tree_leaves(state_blk.params),
                    jax.tree_util.tree_leaves(state_ref.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-2, atol=5e-5)
