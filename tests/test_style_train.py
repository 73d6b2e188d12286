"""Style-transfer training system + MRSTFT loss."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from st_ito_tpu.chain import ChainSpec, basic_compressor, basic_distortion, basic_gain
from st_ito_tpu.models.cnn14 import Cnn14Config
from st_ito_tpu.ops.losses import multi_resolution_stft_loss
from st_ito_tpu.train.style import (
    StyleTransferConfig,
    StyleTransferSystem,
    classifier_apply,
    classifier_logits_to_params,
    init_classifier,
    params_to_bin_index,
)

RNG = np.random.default_rng(9)
T = 33792  # smallest length through the conv stack


def test_mrstft_loss_zero_for_identical():
    x = jnp.asarray(RNG.standard_normal((2, 16384)).astype(np.float32))
    assert float(multi_resolution_stft_loss(x, x)) < 1e-5


def test_mrstft_loss_monotonic_in_distortion():
    x = jnp.asarray(RNG.standard_normal((1, 16384)).astype(np.float32) * 0.3)
    l1 = float(multi_resolution_stft_loss(jnp.tanh(x * 2), x))
    l2 = float(multi_resolution_stft_loss(jnp.tanh(x * 20), x))
    assert 0 < l1 < l2


def test_classifier_roundtrip():
    num_bins = 64
    params = jnp.asarray(RNG.uniform(0, 1, (4, 5)).astype(np.float32))
    idx = params_to_bin_index(params, num_bins)
    assert idx.shape == (4, 5)
    vals = jnp.linspace(0, 1, num_bins)
    np.testing.assert_allclose(np.asarray(vals[idx]), np.asarray(params),
                               atol=1.0 / (num_bins - 1) + 1e-6)
    p = init_classifier(jax.random.PRNGKey(0), 32, 5, num_bins)
    logits = classifier_apply(p, jnp.asarray(RNG.standard_normal((4, 32)).astype(np.float32)))
    assert logits.shape == (4, 5, num_bins)
    w = classifier_logits_to_params(logits, num_bins)
    assert w.shape == (4, 5)


def _chain():
    return ChainSpec(stages=(basic_compressor(), basic_distortion(), basic_gain()),
                     with_bypass=False)


def _cfg(**kw):
    defaults = dict(
        encoder=Cnn14Config(embed_dim=16, base_channels=4),
        analysis_length=T, lr=1e-3, sample_rate=48000,
    )
    defaults.update(kw)
    return StyleTransferConfig(**defaults)


def _batch(system, bs=2, with_targets=True):
    x = RNG.standard_normal((bs, 2, T)).astype(np.float32) * 0.3
    batch = {"input_audio": jnp.asarray(x)}
    w = jnp.asarray(RNG.uniform(0.2, 0.8, (bs, system.num_params)).astype(np.float32))
    if with_targets:
        batch["target_params"] = w
        batch["target_audio"] = system.render(jnp.asarray(x), w)
    return batch


@pytest.mark.parametrize("loss_type", ["parameter-regression",
                                       "parameter-classification"])
def test_style_param_losses_decrease(loss_type):
    cfg = _cfg(loss_type=loss_type)
    system = StyleTransferSystem(cfg, chain=_chain())
    state = system.init(jax.random.PRNGKey(0))
    step = system.make_train_step()
    batch = _batch(system)
    losses = []
    for i in range(6):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_style_audio_loss_on_the_fly():
    cfg = _cfg(loss_type="audio", on_the_fly=True, split_section=True)
    system = StyleTransferSystem(cfg, chain=_chain())
    state = system.init(jax.random.PRNGKey(0))
    step = system.make_train_step()
    # split_section halves the signal: needs 2x the minimum conv-stack length
    x = RNG.standard_normal((2, 2, 2 * T)).astype(np.float32) * 0.3
    batch = {"input_audio": jnp.asarray(x)}
    batch["target_audio"] = batch["input_audio"]  # placeholder; on_the_fly replaces
    batch["target_params"] = jnp.zeros((2, system.num_params))
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["audio_loss"]))


def test_style_simple_processor_mode():
    cfg = _cfg(loss_type="parameter-regression", autodiff_processor="simple")
    system = StyleTransferSystem(cfg)
    assert system.num_params == 21
    state = system.init(jax.random.PRNGKey(0))
    step = system.make_train_step()
    state, metrics = step(state, _batch(system), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_style_eval_step_renders_audio_loss():
    cfg = _cfg(loss_type="parameter-regression")
    system = StyleTransferSystem(cfg, chain=_chain())
    state = system.init(jax.random.PRNGKey(0))
    eval_step = system.make_eval_step()
    loss, (metrics, aux) = eval_step(state.params, _batch(system),
                                     jax.random.PRNGKey(0))
    assert "audio_loss" in metrics
    assert aux["output_audio"].shape[0] == 2


def test_style_bn_running_stats_updated():
    cfg = _cfg(loss_type="parameter-regression")
    system = StyleTransferSystem(cfg, chain=_chain())
    state = system.init(jax.random.PRNGKey(0))
    rm0 = np.asarray(state.params["encoder"]["conv_block1"]["bn1"]["running_mean"])
    step = system.make_train_step()
    state, _ = step(state, _batch(system), jax.random.PRNGKey(0))
    rm1 = np.asarray(state.params["encoder"]["conv_block1"]["bn1"]["running_mean"])
    assert not np.allclose(rm0, rm1)


def test_style_train_block_matches_stepwise():
    """make_train_block(k) (one lax.scan dispatch over a device pool) must
    produce the same state as k make_train_step calls fed the same batches
    and per-step rngs."""
    # the scanned train block is the largest XLA CPU program in the suite;
    # compiling it after ~200 accumulated executables segfaulted the LLVM
    # JIT (full-suite-only, passes in any isolation) — drop the dead
    # executables first
    jax.clear_caches()
    cfg = _cfg(loss_type="parameter-regression", on_the_fly=True,
               split_section=True)
    system = StyleTransferSystem(cfg, chain=_chain())
    state0 = system.init(jax.random.PRNGKey(0))

    k, bs = 3, 2
    pool = jnp.asarray(
        RNG.standard_normal((5, 2, 2 * T)).astype(np.float32) * 0.3)
    idx = jnp.asarray(RNG.integers(0, 5, (k, bs)), jnp.int32)
    rng = jax.random.PRNGKey(7)

    block = system.make_train_block(k)
    state_blk, losses = block(state0, pool, idx, rng)
    assert losses.shape == (k,) and bool(jnp.isfinite(losses).all())

    step = system.make_train_step()
    state_ref = state0
    rngs = jax.random.split(rng, k)
    ref_losses = []
    for i in range(k):
        batch = {"input_audio": jnp.take(pool, idx[i], axis=0)}
        state_ref, metrics = step(state_ref, batch, rngs[i])
        ref_losses.append(float(metrics["loss"]))
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref_losses),
                               rtol=1e-5, atol=1e-6)
    a = jax.tree_util.tree_leaves(state_blk.params)
    b = jax.tree_util.tree_leaves(state_ref.params)
    for x, y in zip(a, b):
        # scan-fused vs stepwise XLA programs reassociate float ops;
        # per-leaf drift after 3 adamw updates is ~1e-5 absolute
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-2, atol=5e-5)
    assert int(state_blk.step) == k
