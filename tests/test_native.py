"""Native C++ engine vs the JAX kernels (cross-implementation golden tests)."""

import numpy as np
import pytest
import jax.numpy as jnp

from st_ito_tpu.chain import (
    ChainSpec,
    basic_chain,
    basic_compressor,
    basic_delay,
    basic_distortion,
    basic_parametric_eq,
    basic_reverb,
    build_render_fn,
)
from st_ito_tpu.native import native_available, native_render
from st_ito_tpu.ops.dynamics import compressor as jax_compressor

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ unavailable")

RNG = np.random.default_rng(13)
SR = 48000


def _x(C=1, T=32768):
    return (RNG.standard_normal((C, T)) * 0.3).astype(np.float32)


def test_native_eq_matches_jax_scan():
    chain = ChainSpec(stages=(basic_parametric_eq(),), with_bypass=False)
    x = _x()
    w = RNG.uniform(0.3, 0.7, chain.num_params).astype(np.float32)
    y_native = native_render(chain, w, x, SR, normalize_output=False)
    render = build_render_fn(chain, SR, 1, peak_normalize_output=False)
    y_jax = np.asarray(render(jnp.asarray(w), jnp.asarray(x)))
    # freq-sampling vs exact time domain: tight everywhere but the wrap guard
    np.testing.assert_allclose(y_native, y_jax, atol=2e-2)
    corr = np.corrcoef(y_native.ravel(), y_jax.ravel())[0, 1]
    assert corr > 0.999


def test_native_compressor_matches_exact_ballistics():
    chain = ChainSpec(stages=(basic_compressor(),), with_bypass=False)
    x = _x()
    w = np.asarray([0.4, 0.5, 0.3, 0.2], np.float32)
    y_native = native_render(chain, w, x, SR, normalize_output=False)
    th = w[0] * 80 - 80
    ratio = w[1] * 19 + 1
    atk = w[2] * 99.9 + 0.1
    rel = w[3] * 990 + 10
    y_jax = np.asarray(jax_compressor(
        jnp.asarray(x), SR, threshold_db=th, ratio=ratio, attack_ms=atk,
        release_ms=rel, knee_db=0.5, link_channels=False))
    np.testing.assert_allclose(y_native, y_jax, atol=1e-3)


def test_native_distortion_exact():
    chain = ChainSpec(stages=(basic_distortion(),), with_bypass=False)
    x = _x()
    w = np.asarray([0.7, 0.6], np.float32)
    y = native_render(chain, w, x, SR, normalize_output=False)
    drive = 10 ** ((0.7 * 96 - 48) / 20)
    og = 10 ** ((0.6 * 48 - 24) / 20)
    np.testing.assert_allclose(y, np.tanh(x * drive) * og, atol=1e-5)


def test_native_delay_echoes():
    chain = ChainSpec(stages=(basic_delay(),), with_bypass=False)
    T = 48000
    x = np.zeros((2, T), np.float32)
    x[:, 0] = 1.0
    D_norm = (0.1 - 0.01) / 0.99  # delay_seconds = 0.1
    w = np.asarray([D_norm, (0.5 - 0.05) / 0.95, 1.0], np.float32)
    y = native_render(chain, w, x, SR, normalize_output=False)
    np.testing.assert_allclose(y[0, 4800], 1.0, atol=0.05)
    np.testing.assert_allclose(y[0, 9600], 0.5, atol=0.05)


def test_native_reverb_tail_matches_jax_energy():
    chain = ChainSpec(stages=(basic_reverb(),), with_bypass=False)
    T = 48000
    x = np.zeros((2, T), np.float32)
    x[:, 100] = 1.0
    w = np.asarray([0.8, 0.3, 0.5, 1.0], np.float32)
    y_native = native_render(chain, w, x, SR, normalize_output=False)
    render = build_render_fn(chain, SR, 2, peak_normalize_output=False)
    y_jax = np.asarray(render(jnp.asarray(w), jnp.asarray(x)))
    # same topology evaluated in time vs frequency domain: compare energy
    # envelopes over coarse windows
    for a, b in [(y_native, y_jax)]:
        ea = np.asarray([np.sum(a[:, s:s + 4800] ** 2) for s in range(0, T, 4800)])
        eb = np.asarray([np.sum(b[:, s:s + 4800] ** 2) for s in range(0, T, 4800)])
        ratio = (ea + 1e-9) / (eb + 1e-9)
        assert np.all(ratio[:8] > 0.5) and np.all(ratio[:8] < 2.0)


def test_native_full_chain_and_bypass():
    chain = basic_chain(with_bypass=True)
    x = _x(2, 32768)
    w = np.asarray(chain.init_params()).copy()
    for _, start, _ in chain.stage_slices():
        w[start] = 1.0  # all bypassed
    y = native_render(chain, w, x, SR, normalize_output=False)
    np.testing.assert_allclose(y, x, atol=1e-6)

    w2 = RNG.uniform(0, 1, chain.num_params).astype(np.float32)
    y2 = native_render(chain, w2, x, SR)
    assert np.isfinite(y2).all()
    assert np.abs(y2).max() <= 1.0 + 1e-5
