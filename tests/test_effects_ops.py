"""Behavioral tests for EQ, delay, chorus, phaser, reverb, stereo ops."""

import numpy as np
import pytest
import scipy.signal
import jax
import jax.numpy as jnp

from st_ito_tpu.ops import (
    chorus,
    distortion,
    fade_in,
    feedback_delay,
    freeverb,
    gain,
    mono_to_stereo,
    noise_shaped_reverb,
    pan,
    parametric_eq,
    parametric_eq_scan,
    peak_normalize,
    phaser,
    resample,
    stereo_widener,
    to_mid_side,
)

SR = 48000.0
RNG = np.random.default_rng(2)


def test_parametric_eq_fsm_matches_scan():
    x = jnp.asarray(RNG.standard_normal(16384).astype(np.float32))
    kwargs = dict(
        low_shelf_gain_db=6.0, low_shelf_cutoff_freq=100.0, low_shelf_q_factor=0.7,
        band_gains_db=jnp.array([-4.0, 3.0, 5.0, -2.0]),
        band_cutoff_freqs=jnp.array([300.0, 1000.0, 3000.0, 8000.0]),
        band_q_factors=jnp.array([0.7, 1.0, 2.0, 0.5]),
        high_shelf_gain_db=-6.0, high_shelf_cutoff_freq=10000.0,
        high_shelf_q_factor=0.7,
    )
    y_fsm = np.asarray(parametric_eq(x, SR, **kwargs, pad=16384))
    y_scan = np.asarray(parametric_eq_scan(x, SR, **kwargs))
    np.testing.assert_allclose(y_fsm, y_scan, atol=5e-3)


def test_parametric_eq_batched_params():
    """vmap over a population of EQ settings — the ES hot path."""
    x = jnp.asarray(RNG.standard_normal(8192).astype(np.float32))
    pop = 8
    gains = jnp.asarray(RNG.uniform(-12, 12, (pop, 4)).astype(np.float32))

    def f(g):
        return parametric_eq(
            x, SR,
            band_gains_db=g,
            band_cutoff_freqs=jnp.array([200.0, 800.0, 2500.0, 9000.0]),
            band_q_factors=jnp.full((4,), 0.707),
        )

    y = jax.vmap(f)(gains)
    assert y.shape == (pop, 8192)
    assert bool(jnp.isfinite(y).all())


def test_gain_and_distortion():
    x = jnp.asarray(np.linspace(-1, 1, 101).astype(np.float32))
    np.testing.assert_allclose(np.asarray(gain(x, 6.0)), np.asarray(x) * 10 ** 0.3, rtol=1e-5)
    y = np.asarray(distortion(x, 24.0))
    assert np.abs(y).max() <= 1.0
    np.testing.assert_allclose(y, np.tanh(np.asarray(x) * 10 ** (24 / 20)), rtol=1e-5)


def test_feedback_delay_echo_positions():
    T = 48000
    x = np.zeros((1, T), np.float32)
    x[0, 0] = 1.0
    D = 0.1  # 4800 samples
    y = np.asarray(feedback_delay(jnp.asarray(x), SR, D, feedback=0.5, mix=1.0))
    # echoes at 4800, 9600, ... with amplitudes 1, ~0.5, ~0.25
    np.testing.assert_allclose(y[0, 4800], 1.0, atol=0.02)
    np.testing.assert_allclose(y[0, 9600], 0.5, atol=0.02)
    np.testing.assert_allclose(y[0, 14400], 0.25, atol=0.02)
    assert np.abs(y[0, 2000]) < 0.01  # silence between echoes


def test_feedback_delay_mix():
    x = jnp.asarray(RNG.standard_normal((2, 4096)).astype(np.float32))
    y = feedback_delay(x, SR, 0.01, feedback=0.3, mix=0.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_chorus_finite_and_modulates():
    t = np.arange(48000) / SR
    x = jnp.asarray(np.sin(2 * np.pi * 440 * t).astype(np.float32)[None])
    y = chorus(x, SR, rate_hz=1.0, centre_delay_ms=7.0, depth=0.5,
               feedback=0.2, mix=0.5)
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())
    assert not np.allclose(np.asarray(y), np.asarray(x), atol=1e-3)


def test_phaser_static_matches_allpass_cascade():
    """depth=0 -> time-invariant allpasses; compare against scipy lfilter."""
    x = RNG.standard_normal(4096).astype(np.float32)
    centre = 1000.0
    y = np.asarray(
        phaser(jnp.asarray(x[None]), SR, rate_hz=0.0, depth=0.0,
               centre_frequency_hz=centre, feedback=0.0, mix=1.0, num_stages=2)
    )[0]
    tan_half = np.tan(np.pi * centre / SR)
    a = (tan_half - 1) / (tan_half + 1)
    wet = x
    for _ in range(2):
        wet = scipy.signal.lfilter([a, 1.0], [1.0, a], wet)
    y_ref = 0.5 * (x + wet)
    np.testing.assert_allclose(y, y_ref, atol=2e-3)


def test_freeverb_tail_and_mix():
    T = 48000
    x = np.zeros((2, T), np.float32)
    x[:, 100] = 1.0
    y = np.asarray(freeverb(jnp.asarray(x), SR, room_size=0.8, damping=0.3,
                            wet_level=0.5, dry_level=0.0, width=1.0))
    # impulse should produce an extended decaying tail
    e_early = np.sum(y[:, 1000:12000] ** 2)
    e_late = np.sum(y[:, 24000:36000] ** 2)
    assert e_early > e_late > 1e-8
    # dry_level=0: direct impulse not present at t=100
    assert np.abs(y[0, 100]) < 0.1
    # width=1 decorrelates channels
    c = np.corrcoef(y[0, 1000:20000], y[1, 1000:20000])[0, 1]
    assert c < 0.95


def test_freeverb_dry_passthrough():
    x = jnp.asarray(RNG.standard_normal((2, 8192)).astype(np.float32))
    y = freeverb(x, SR, wet_level=0.0, dry_level=0.5, width=1.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


def test_noise_shaped_reverb_decay_monotonic():
    T = 48000
    x = np.zeros((1, 2, T), np.float32)
    x[:, :, 10] = 1.0
    gains = jnp.full((12,), 0.5)

    def tail_energy(decay):
        y = np.asarray(noise_shaped_reverb(
            jnp.asarray(x), SR, gains, jnp.full((12,), decay), mix=1.0))
        return np.sum(y[0, :, 24000:] ** 2)

    assert tail_energy(0.9) > tail_energy(0.3) * 2


def test_noise_shaped_reverb_identity_at_zero_mix():
    x = jnp.asarray(RNG.standard_normal((2, 4096)).astype(np.float32))
    y = noise_shaped_reverb(x, SR, jnp.full((12,), 0.5), jnp.full((12,), 0.5), mix=0.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_stereo_ops():
    x = jnp.asarray(RNG.standard_normal((2, 1024)).astype(np.float32))
    ms = to_mid_side(x)
    np.testing.assert_allclose(
        np.asarray(ms[0]), (np.asarray(x[0]) + np.asarray(x[1])) / 2, atol=1e-6
    )
    wide = stereo_widener(x, 1.0)
    side_energy = np.sum(np.asarray(to_mid_side(wide))[1] ** 2)
    mid_energy = np.sum(np.asarray(to_mid_side(wide))[0] ** 2)
    assert mid_energy < 1e-8  # fully wide = no mid
    mono = mono_to_stereo(x[:1])
    assert mono.shape == (2, 1024)
    p = pan(x, 0.0)  # hard left
    assert np.sum(np.asarray(p[1]) ** 2) < 1e-8


def test_fade_and_normalize():
    x = jnp.ones((2, 32768))
    y = fade_in(x, 16384)
    assert float(y[0, 0]) == 0.0
    np.testing.assert_allclose(float(y[0, -1]), 1.0)
    z = peak_normalize(x * 0.1)
    np.testing.assert_allclose(np.abs(np.asarray(z)).max(), 1.0, rtol=1e-5)


@pytest.mark.parametrize("orig,new", [(44100, 48000), (48000, 44100), (48000, 16000)])
def test_resample_matches_scipy(orig, new):
    T = orig  # 1 second
    t = np.arange(T) / orig
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(x), orig, new))
    T_new = int(round(T * new / orig))
    assert y.shape == (T_new,)
    y_ref = scipy.signal.resample(x, T_new)
    np.testing.assert_allclose(y[100:-100], y_ref[100:-100], atol=5e-3)
