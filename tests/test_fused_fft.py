"""Fused two-stage Pallas FFT (ops/pallas/fused_fft.py): numpy parity in
interpret mode, and end-to-end agreement of the packed-LTI hot path when
routed through it (fft_impl="fused")."""

import numpy as np
import pytest
import jax.numpy as jnp

from st_ito_tpu.ops.pallas.fused_fft import fft_fused, supported

RNG = np.random.default_rng(23)
N = 131072

# 3-pass bf16 contractions match XLA HIGH-precision f32 dots: relative
# error ~1e-5 of the spectrum peak after two stages (measured 8.2e-6 at
# N=2^17; same precision class as the four-step's HIGH dots)
TOL = 2e-5


def _cplx(shape):
    return (RNG.standard_normal(shape)
            + 1j * RNG.standard_normal(shape)).astype(np.complex64)


def test_forward_full_matches_numpy():
    x = _cplx((2, N))
    yr, yi = fft_fused(jnp.asarray(x.real), jnp.asarray(x.imag), sign=-1,
                       n=N, interpret=True)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    want = np.fft.fft(x, axis=-1)
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < TOL, err


def test_forward_guard_band_implicit_pad():
    T = N // 2
    x = _cplx((2, T))
    yr, yi = fft_fused(jnp.asarray(x.real), jnp.asarray(x.imag), sign=-1,
                       n=N, interpret=True)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    want = np.fft.fft(np.pad(x, ((0, 0), (0, N - T))), axis=-1)
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < TOL, err


def test_inverse_with_out_len_truncation():
    T = N // 2
    Y = _cplx((2, N))
    yr, yi = fft_fused(jnp.asarray(Y.real), jnp.asarray(Y.imag), sign=1,
                       n=N, out_len=T, interpret=True)
    assert yr.shape == (2, T)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    want = np.fft.ifft(Y, axis=-1)[:, :T] * N
    err = np.abs(got - want).max() / np.abs(np.fft.ifft(Y) * N).max()
    assert err < TOL, err


def test_odd_out_len_rounds_up_rows():
    Y = _cplx((1, N))
    yr, yi = fft_fused(jnp.asarray(Y.real), jnp.asarray(Y.imag), sign=1,
                       n=N, out_len=1000, interpret=True)
    assert yr.shape == (1, 1000)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    want = np.fft.ifft(Y, axis=-1)[:, :1000] * N
    err = np.abs(got - want).max() / np.abs(np.fft.ifft(Y) * N).max()
    assert err < TOL, err


def test_unsupported_n_raises():
    with pytest.raises(ValueError, match="fused_fft"):
        fft_fused(jnp.zeros((1, 4096)), jnp.zeros((1, 4096)), n=4100,
                  interpret=True)
    assert not supported(4100, 4096)
    assert not supported(131072, 131000)  # in_len not a multiple of n2
    assert supported(131072, 65536)


def test_packed_lti_rp_fused_matches_mx():
    """The full hot path (forward FFT -> fused response kernel -> inverse
    FFT) must agree between the jnp four-step and the fused Pallas FFT;
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
    y_fused = packed_lti_apply_rp(x, stages, N, 48000, interpret=True,
                                  fft_impl="fused")
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_mx),
                               atol=3e-5, rtol=1e-4)
    # an ineligible in_len (not a multiple of n2) silently falls back to
    # the four-step
    T_odd = N // 2 - 64
    y_fb = packed_lti_apply_rp(x[..., :T_odd], stages, N,
                               48000, interpret=True, fft_impl="fused")
    assert y_fb.shape == (B, 2, T_odd)
