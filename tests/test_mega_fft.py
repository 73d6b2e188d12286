"""Glue-free packed-LTI FFT pair (ops/pallas/mega_fft.py): numpy oracles
for the forward (Zlo, Zrev) and inverse (Ylo, Yhig) -> audio kernels in
interpret mode, and end-to-end agreement of the full LTI group against
the packed four-step path (fft_mode="mega" vs "mx")."""

import numpy as np
import pytest
import jax.numpy as jnp

from st_ito_tpu.ops.pallas.mega_fft import (
    fwd_pack_fft,
    half_grid,
    inv_unpack_fft,
    packed_lti_apply_mega,
    supported,
)

RNG = np.random.default_rng(31)
N = 131072
T = N // 2

TOL = 2e-5  # 3-pass bf16 dots ~ XLA HIGH f32 (see test_fused_fft.py)


def _stereo(B, T_):
    return RNG.standard_normal((B, 2, T_)).astype(np.float32) * 0.4


def test_forward_emits_zlo_and_zrev():
    B = 2
    x = _stereo(B, T)
    ZlR, ZlI, ZvR, ZvI = fwd_pack_fft(jnp.asarray(x), N, interpret=True)
    Rp, n1 = half_grid(N)
    assert ZlR.shape == (B, Rp, n1)

    z = x[:, 0] + 1j * x[:, 1]
    Z = np.fft.fft(np.pad(z, ((0, 0), (0, N - T))), axis=-1)
    F = N // 2 + 1
    want_lo = Z[:, :F]
    idx = (N - np.arange(F)) % N
    want_rev = Z[:, idx]

    flat = [np.asarray(a).reshape(B, Rp * n1) for a in (ZlR, ZlI, ZvR, ZvI)]
    got_lo = flat[0][:, :F] + 1j * flat[1][:, :F]
    got_rev = flat[2][:, :F] + 1j * flat[3][:, :F]
    scale = np.abs(Z).max()
    assert np.abs(got_lo - want_lo).max() / scale < TOL
    assert np.abs(got_rev - want_rev).max() / scale < TOL


def test_inverse_consumes_ylo_yhig():
    B = 2
    # a random hermitian-free full spectrum Y, presented as (Ylo, Yhig)
    Y = (RNG.standard_normal((B, N)) + 1j * RNG.standard_normal((B, N))
         ).astype(np.complex64)
    F = N // 2 + 1
    Rp, n1 = half_grid(N)
    Fp = Rp * n1
    lo = np.zeros((B, Fp), np.complex64)
    hig = np.zeros((B, Fp), np.complex64)
    lo[:, :F] = Y[:, :F]
    hig[:, :F] = Y[:, (N - np.arange(F)) % N]
    # junk beyond F must be ignored by the kernel masks
    lo[:, F:] = 99.0
    hig[:, F:] = -99.0
    hig[:, 0] = 123.0  # DC dup position: ignored (lo's DC is used)
    hig[:, F - 1] = -123.0  # Nyquist dup position: ignored

    lo = lo.reshape(B, Rp, n1)
    hig = hig.reshape(B, Rp, n1)
    y = inv_unpack_fft(jnp.asarray(lo.real), jnp.asarray(lo.imag),
                       jnp.asarray(hig.real), jnp.asarray(hig.imag),
                       N, T, interpret=True)
    assert y.shape == (B, 2, T)
    want = np.fft.ifft(Y, axis=-1)[:, :T]
    got = np.asarray(y[:, 0]) + 1j * np.asarray(y[:, 1])
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < TOL


def test_supported_gate():
    assert supported(131072, 65536)
    assert not supported(131072, 65537)   # T not a multiple of n2
    assert not supported(131000, 65500)   # n not a power of two
    with pytest.raises(ValueError, match="mega_fft"):
        fwd_pack_fft(jnp.zeros((1, 2, 100)), 128, interpret=True)


def _demo_stages(B):
    return [
        ("gain", {"gain_db": jnp.asarray(RNG.uniform(-6, 6, B),
                                         jnp.float32)}, None),
        ("delay", {"delay_seconds": jnp.asarray(RNG.uniform(0.05, 0.2, B),
                                                jnp.float32),
                   "feedback": jnp.asarray(RNG.uniform(0.1, 0.5, B),
                                           jnp.float32),
                   "mix": jnp.asarray(RNG.uniform(0.2, 0.8, B),
                                      jnp.float32)}, None),
        ("reverb", {"room_size": jnp.asarray(RNG.uniform(0.2, 0.8, B),
                                             jnp.float32),
                    "damping": jnp.asarray(RNG.uniform(0.1, 0.9, B),
                                           jnp.float32),
                    "wet_dry": jnp.asarray(RNG.uniform(0.2, 0.8, B),
                                           jnp.float32),
                    "width": jnp.asarray(RNG.uniform(0.0, 1.0, B),
                                         jnp.float32)}, None),
    ]


def test_packed_lti_mega_matches_mx():
    """Scalar + monomix stages (delay + freeverb) through the full mega
    pipeline must match the four-step packed path, including the
    in-kernel DC/Nyquist correction and the monomix mirror terms."""
    from st_ito_tpu.ops.pallas.packed_response import packed_lti_apply_rp

    B = 8  # the padded response entry requires the candidate block size
    x = jnp.asarray(_stereo(B, T))
    stages = _demo_stages(B)
    y_mx = packed_lti_apply_rp(x, stages, N, 48000, interpret=True,
                               fft_impl="mx")
    y_mega = packed_lti_apply_mega(x, stages, N, 48000, interpret=True)
    assert y_mega.shape == y_mx.shape == (B, 2, T)
    np.testing.assert_allclose(np.asarray(y_mega), np.asarray(y_mx),
                               atol=5e-5, rtol=1e-4)


def test_packed_lti_mega_with_bypass_masks():
    from st_ito_tpu.ops.pallas.packed_response import packed_lti_apply_rp

    B = 8
    x = jnp.asarray(_stereo(B, T))
    active = jnp.asarray(RNG.integers(0, 2, B).astype(np.float32))
    stages = [(e, p, active) for e, p, _ in _demo_stages(B)]
    y_mx = packed_lti_apply_rp(x, stages, N, 48000, interpret=True,
                               fft_impl="mx")
    y_mega = packed_lti_apply_mega(x, stages, N, 48000, interpret=True)
    np.testing.assert_allclose(np.asarray(y_mega), np.asarray(y_mx),
                               atol=5e-5, rtol=1e-4)


def test_packed_lti_mega2_matches_mega():
    """The fused (forward FFT + response) kernel path (fft_mode="mega2")
    must equal the 3-kernel mega pipeline, with and without bypass
    masks (the Z spectra never reaching HBM must not change any value)."""
    from st_ito_tpu.ops.pallas.mega_fft import packed_lti_apply_mega2

    B = 8
    x = jnp.asarray(_stereo(B, T))
    stages = _demo_stages(B)
    y_mega = packed_lti_apply_mega(x, stages, N, 48000, interpret=True)
    y_mega2 = packed_lti_apply_mega2(x, stages, N, 48000, interpret=True)
    assert y_mega2.shape == (B, 2, T)
    # the fused kernel reassociates the response compose/apply float ops
    # (full-Rp blocks vs the 3-D kernel's 8-row blocks): measured max
    # |delta| ~8e-6 on order-0.5 signals — same tolerance class as the
    # mega-vs-mx assertion above
    np.testing.assert_allclose(np.asarray(y_mega2), np.asarray(y_mega),
                               atol=2e-5, rtol=1e-4)

    active = jnp.asarray(RNG.integers(0, 2, B).astype(np.float32))
    stages_a = [(e, p, active) for e, p, _ in _demo_stages(B)]
    y_mega = packed_lti_apply_mega(x, stages_a, N, 48000, interpret=True)
    y_mega2 = packed_lti_apply_mega2(x, stages_a, N, 48000, interpret=True)
    np.testing.assert_allclose(np.asarray(y_mega2), np.asarray(y_mega),
                               atol=2e-5, rtol=1e-4)


def test_rows_output_matches_flat_reshape():
    """rows=True returns the inverse kernel's native (B, 2, Tr, n2) form;
    it must be exactly the flat output reshaped (the flatten retile the
    rows contract deletes carries no arithmetic)."""
    from st_ito_tpu.ops.pallas.mega_fft import _radix, packed_lti_apply_mega2

    B = 8
    n2 = _radix(N)[1]
    x = jnp.asarray(_stereo(B, T))
    stages = _demo_stages(B)
    y_flat = packed_lti_apply_mega2(x, stages, N, 48000, interpret=True)
    y_rows = packed_lti_apply_mega2(x, stages, N, 48000, interpret=True,
                                    rows=True)
    assert y_rows.shape == (B, 2, T // n2, n2)
    np.testing.assert_array_equal(np.asarray(y_rows.reshape(B, 2, T)),
                                  np.asarray(y_flat))
