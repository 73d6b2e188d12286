"""Golden-value tests: biquad design + application vs scipy.signal."""

import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from st_ito_tpu.ops.iir import (
    apply_iir_fsm,
    biquad_coeffs,
    biquad_scan,
    freqz,
    lfilter_scan,
    linear_recurrence,
    one_pole_smooth,
)

SR = 48000.0
RNG = np.random.default_rng(0)


def _ref_biquad(gain_db, fc, q, sr, ftype):
    """RBJ cookbook in numpy (independent reimplementation, cross-check)."""
    A = 10 ** (gain_db / 40.0)
    w0 = 2 * np.pi * fc / sr
    alpha = np.sin(w0) / (2 * q)
    c = np.cos(w0)
    sA = np.sqrt(A)
    if ftype == "peaking":
        b = [1 + alpha * A, -2 * c, 1 - alpha * A]
        a = [1 + alpha / A, -2 * c, 1 - alpha / A]
    elif ftype == "low_shelf":
        b = [
            A * ((A + 1) - (A - 1) * c + 2 * sA * alpha),
            2 * A * ((A - 1) - (A + 1) * c),
            A * ((A + 1) - (A - 1) * c - 2 * sA * alpha),
        ]
        a = [
            (A + 1) + (A - 1) * c + 2 * sA * alpha,
            -2 * ((A - 1) + (A + 1) * c),
            (A + 1) + (A - 1) * c - 2 * sA * alpha,
        ]
    elif ftype == "high_shelf":
        b = [
            A * ((A + 1) + (A - 1) * c + 2 * sA * alpha),
            -2 * A * ((A - 1) + (A + 1) * c),
            A * ((A + 1) + (A - 1) * c - 2 * sA * alpha),
        ]
        a = [
            (A + 1) - (A - 1) * c + 2 * sA * alpha,
            2 * ((A - 1) - (A + 1) * c),
            (A + 1) - (A - 1) * c - 2 * sA * alpha,
        ]
    else:
        raise ValueError(ftype)
    b = np.array(b) / a[0]
    a = np.array(a) / a[0]
    return b, a


@pytest.mark.parametrize("ftype", ["peaking", "low_shelf", "high_shelf"])
def test_biquad_coeffs_match_cookbook(ftype):
    gain, fc, q = 6.5, 1234.0, 0.9
    b, a = biquad_coeffs(gain, fc, q, SR, ftype)
    b_ref, a_ref = _ref_biquad(gain, fc, q, SR, ftype)
    np.testing.assert_allclose(np.asarray(b), b_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a), a_ref, rtol=1e-5)


def test_biquad_coeffs_vectorized():
    gains = jnp.array([-12.0, 0.0, 6.0])
    fcs = jnp.array([100.0, 1000.0, 8000.0])
    qs = jnp.array([0.5, 0.707, 2.0])
    b, a = biquad_coeffs(gains, fcs, qs, SR, "peaking")
    assert b.shape == (3, 3) and a.shape == (3, 3)
    for i in range(3):
        b_ref, a_ref = _ref_biquad(float(gains[i]), float(fcs[i]), float(qs[i]), SR, "peaking")
        np.testing.assert_allclose(np.asarray(b[i]), b_ref, rtol=1e-4)


def test_biquad_scan_matches_scipy():
    x = RNG.standard_normal(4096).astype(np.float32)
    b, a = _ref_biquad(5.0, 800.0, 1.2, SR, "peaking")
    y_ref = scipy.signal.lfilter(b, a, x)
    y = biquad_scan(jnp.asarray(x), jnp.asarray(b, jnp.float32), jnp.asarray(a, jnp.float32))
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-4)


def test_biquad_scan_batched():
    x = RNG.standard_normal((2, 3, 1024)).astype(np.float32)
    b, a = _ref_biquad(-4.0, 2000.0, 0.707, SR, "high_shelf")
    y = biquad_scan(jnp.asarray(x), jnp.asarray(b, jnp.float32), jnp.asarray(a, jnp.float32))
    assert y.shape == x.shape
    y_ref = scipy.signal.lfilter(b, a, x, axis=-1)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-4)


def test_lfilter_scan_higher_order():
    x = RNG.standard_normal(2048).astype(np.float32)
    b, a = scipy.signal.butter(4, 0.2)
    y_ref = scipy.signal.lfilter(b, a, x)
    y = lfilter_scan(jnp.asarray(x), jnp.asarray(b, jnp.float32), jnp.asarray(a, jnp.float32))
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=5e-4)


def test_freqz_matches_scipy():
    b, a = _ref_biquad(7.0, 3000.0, 2.0, SR, "peaking")
    n_freqs = 513
    H = freqz(jnp.asarray(b, jnp.float32), jnp.asarray(a, jnp.float32), n_freqs)
    # our grid is the rFFT layout: inclusive of pi, n_freqs points
    w = np.linspace(0, np.pi, n_freqs)
    _, H_ref = scipy.signal.freqz(b, a, worN=w)
    np.testing.assert_allclose(np.asarray(H), H_ref, atol=1e-4)


def test_fsm_matches_timedomain():
    """Frequency-sampling application ≈ exact lfilter away from wrap region."""
    x = RNG.standard_normal(16384).astype(np.float32)
    b, a = _ref_biquad(9.0, 500.0, 1.0, SR, "low_shelf")
    y_ref = scipy.signal.lfilter(b, a, x)
    y = apply_iir_fsm(
        jnp.asarray(x),
        jnp.asarray(b, jnp.float32)[None, :],
        jnp.asarray(a, jnp.float32)[None, :],
        pad=16384,
    )
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-3)


def test_fsm_cascade():
    x = RNG.standard_normal(8192).astype(np.float32)
    b1, a1 = _ref_biquad(5.0, 200.0, 0.7, SR, "low_shelf")
    b2, a2 = _ref_biquad(-6.0, 4000.0, 1.5, SR, "peaking")
    y_ref = scipy.signal.lfilter(b2, a2, scipy.signal.lfilter(b1, a1, x))
    b = jnp.stack([jnp.asarray(b1, jnp.float32), jnp.asarray(b2, jnp.float32)])
    a = jnp.stack([jnp.asarray(a1, jnp.float32), jnp.asarray(a2, jnp.float32)])
    y = apply_iir_fsm(jnp.asarray(x), b, a, pad=16384)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-3)


def test_linear_recurrence_matches_loop():
    T = 1000
    coeff = RNG.uniform(0.5, 0.99, T).astype(np.float32)
    drive = RNG.standard_normal(T).astype(np.float32)
    y = np.zeros(T, np.float32)
    acc = 0.0
    for n in range(T):
        acc = coeff[n] * acc + drive[n]
        y[n] = acc
    out = linear_recurrence(jnp.asarray(coeff), jnp.asarray(drive))
    np.testing.assert_allclose(np.asarray(out), y, rtol=2e-3, atol=1e-4)


def test_one_pole_smooth_dc():
    """A constant input should converge to the same constant."""
    x = jnp.ones((2, 4096))
    y = one_pole_smooth(x, 0.99)
    np.testing.assert_allclose(np.asarray(y[:, -1]), 1.0, atol=1e-3)
