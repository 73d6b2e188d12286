"""Regression: stable freqz evaluation for low-frequency high-Q biquads.

On TPU, direct f32 polynomial evaluation of the denominator at z = 1
cancelled to exactly zero for a 47 Hz / Q 3.4 peaking section, turning the
DC bin into NaN and poisoning the whole FFT-filtered render. The stable
(1 - e^{-jw}) reformulation keeps the cascade finite and scipy-accurate.
"""

import numpy as np
import scipy.signal
import jax.numpy as jnp

from st_ito_tpu.ops.iir import apply_iir_fsm, biquad_coeffs, freqz

SR = 48000.0
# the exact parameters that produced NaN on hardware
KILLER = (15.161, 47.330, 3.444, "peaking")


def test_killer_params_finite_and_accurate():
    g, f, q, ft = KILLER
    b, a = biquad_coeffs(g, f, q, SR, ft)
    n_freqs = 262145
    H = np.asarray(jnp.abs(freqz(b, a, n_freqs)))
    assert np.isfinite(H).all()
    # scipy in float64 on the same grid
    w = np.linspace(0, np.pi, 4097)
    bb, aa = np.asarray(b, np.float64), np.asarray(a, np.float64)
    _, H_ref = scipy.signal.freqz(bb, aa, worN=w)
    H_sub = np.asarray(jnp.abs(freqz(b, a, 4097)))
    np.testing.assert_allclose(H_sub, np.abs(H_ref), rtol=2e-2, atol=1e-3)
    # peaking filter: unity gain at DC must survive the f32 cancellation
    np.testing.assert_allclose(H[0], 1.0, atol=0.02)


def test_low_freq_cascade_render_finite():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 65536)).astype(np.float32))
    sections_b, sections_a = [], []
    for g, f, q, ft in [KILLER, (-20.0, 25.0, 4.0, "low_shelf"),
                        (24.0, 30.0, 3.9, "peaking")]:
        b, a = biquad_coeffs(g, f, q, SR, ft)
        sections_b.append(b)
        sections_a.append(a)
    y = apply_iir_fsm(x, jnp.stack(sections_b), jnp.stack(sections_a))
    assert bool(jnp.isfinite(y).all())


def test_random_extreme_sections_finite():
    rng = np.random.default_rng(1)
    for _ in range(50):
        g = rng.uniform(-24, 24)
        f = rng.uniform(20, 23000)
        q = rng.uniform(0.1, 4.0)
        ft = rng.choice(["peaking", "low_shelf", "high_shelf"])
        b, a = biquad_coeffs(g, f, q, SR, str(ft))
        H = jnp.abs(freqz(b, a, 8193))
        assert bool(jnp.isfinite(H).all()), (g, f, q, ft)
