"""Fused 3-stage Pallas FFT (ops/pallas/mxfft3.py): numpy parity in
interpret mode, and end-to-end agreement of the packed-LTI hot path when
routed through it (fft_impl="mx3")."""

import numpy as np
import pytest
import jax.numpy as jnp

from st_ito_tpu.ops.pallas.mxfft3 import fft_mx3

RNG = np.random.default_rng(23)
N = 131072  # 128 * 128 * 8: smallest supported size


def _cplx(shape):
    return (RNG.standard_normal(shape)
            + 1j * RNG.standard_normal(shape)).astype(np.complex64)


def test_forward_full_matches_numpy():
    x = _cplx((2, N))
    yr, yi = fft_mx3(jnp.asarray(x.real), jnp.asarray(x.imag), sign=-1,
                     n=N, interpret=True)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    want = np.fft.fft(x, axis=-1)
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 2e-6, err


def test_forward_guard_band_implicit_pad():
    T = N // 2
    x = _cplx((2, T))
    yr, yi = fft_mx3(jnp.asarray(x.real), jnp.asarray(x.imag), sign=-1,
                     n=N, interpret=True)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    want = np.fft.fft(np.pad(x, ((0, 0), (0, N - T))), axis=-1)
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 2e-6, err


def test_inverse_with_out_len_truncation():
    T = N // 2
    Y = _cplx((2, N))
    yr, yi = fft_mx3(jnp.asarray(Y.real), jnp.asarray(Y.imag), sign=1,
                     n=N, out_len=T, interpret=True)
    assert yr.shape == (2, T)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    want = np.fft.ifft(Y, axis=-1)[:, :T] * N
    err = np.abs(got - want).max() / np.abs(np.fft.ifft(Y) * N).max()
    assert err < 2e-6, err


def test_unsupported_n_raises():
    with pytest.raises(ValueError, match="mxfft3 supports"):
        fft_mx3(jnp.zeros((1, 4096)), jnp.zeros((1, 4096)), n=4096,
                interpret=True)


def test_packed_lti_rp_mx3_matches_mx():
    """The full hot path (forward FFT -> fused response kernel -> inverse
    FFT) must agree between the jnp four-step and the Pallas 3-stage FFT;
    also proves the silent fallback keeps ineligible shapes working."""
    from st_ito_tpu.ops.pallas.packed_response import packed_lti_apply_rp

    T = N // 2
    B = 3
    x = jnp.asarray(RNG.standard_normal((B, 2, T)).astype(np.float32) * 0.4)
    stages = [
        ("gain", {"gain_db": jnp.asarray(RNG.uniform(-6, 6, B),
                                         jnp.float32)}, None),
        ("delay", {"delay_seconds": jnp.asarray(RNG.uniform(0.05, 0.2, B),
                                                jnp.float32),
                   "feedback": jnp.asarray(RNG.uniform(0.1, 0.5, B),
                                           jnp.float32),
                   "mix": jnp.asarray(RNG.uniform(0.2, 0.8, B),
                                      jnp.float32)}, None),
    ]
    y_mx = packed_lti_apply_rp(x, stages, N, 48000, interpret=True,
                               fft_impl="mx")
    y_mx3 = packed_lti_apply_rp(x, stages, N, 48000, interpret=True,
                                fft_impl="mx3")
    np.testing.assert_allclose(np.asarray(y_mx3), np.asarray(y_mx),
                               atol=3e-5, rtol=1e-4)
    # ineligible n (not 128*128*r3) silently falls back to the four-step
    n_small = 65536
    y_fb = packed_lti_apply_rp(x[..., :n_small // 2], stages, n_small,
                               48000, interpret=True, fft_impl="mx3")
    assert y_fb.shape == (B, 2, n_small // 2)
