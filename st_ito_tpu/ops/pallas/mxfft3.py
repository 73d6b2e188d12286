"""Three-stage MXU FFT in one Pallas kernel (per-candidate, all in VMEM).

The jnp four-step FFT (ops/mxfft.py) is mathematically roofline-bound for
its [1024, 512] factorization, but pays n*(r1+r2) ~ n*1536 complex MACs
plus full HBM round trips for every inter-stage transpose/twiddle pass —
profiled at ~100 ms per forward+inverse pair per generation at pop 512,
T 2^18 (PERF_NOTES.md). A deeper [128, 128, n/16384] factorization cuts
the MAC count ~4-5x, but in XLA the extra stage loses its advantage to
relayout passes (measured r2: [128, 32, 128] was no faster — the
swapaxes/twiddle traffic between stages dominates).

This kernel runs all three stages inside VMEM, one candidate per grid
step, so the inter-stage transposes are on-chip relayouts and the only
HBM traffic is the input and output block themselves:

    j = j1*m + j2,  j2 = j21*r3 + j22,  m = n / r1
    X[k3*r1*r2 + k2*r1 + k1] =
        DFT_r3 over j22 ( tw2(k2, j22) *
          DFT_r2 over j21 ( tw1(k1, j2) *
            DFT_r1 over j1 ( x[j1*m + j2] )))

with the stage-1 twiddle FACTORED as
    W_n^(k1*j2) = W_{r2*r3}^(k1*j21) * W_n^(k1*j22)
(two small broadcast multiplies instead of a (r1, m) table — keeps the
whole working set ~14 MB of VMEM).

The guard band stays implicit: a forward input shorter than n only
contracts the nonzero rows of the stage-1 DFT matrix; an inverse with
out_len <= n*r3'/r3 drops unused stage-3 output columns.

Used behind ``fft_mode="pallas"`` of the population renderer after TPU
measurement; parity is tested against ops/mxfft.py and numpy in
interpret mode (tests/test_mxfft3.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_R1 = 128
_R2 = 128


def _factor(n: int) -> tuple[int, int, int]:
    r3 = n // (_R1 * _R2)
    if _R1 * _R2 * r3 != n or not (8 <= r3 <= 128) or (r3 & (r3 - 1)):
        raise ValueError(
            f"mxfft3 supports n = 128*128*r3 with r3 in [8, 128] "
            f"(powers of two); got n={n}")
    return _R1, _R2, r3


def _dft(m: int, sign: int):
    j = np.arange(m, dtype=np.float64)[:, None]
    k = np.arange(m, dtype=np.float64)[None, :]
    ang = sign * 2.0 * np.pi * j * k / m
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def _twiddle(rows: int, cols: int, denom: int, sign: int):
    """W_denom^(r*c) laid out (rows, cols) in exact integer phase."""
    r = np.arange(rows, dtype=np.int64)[:, None]
    c = np.arange(cols, dtype=np.int64)[None, :]
    ang = sign * 2.0 * np.pi * ((r * c) % denom).astype(np.float64) / denom
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _cdot0(ar, ai, wc, ws, prec):
    """Complex contraction over axis 0 of both operands:
    out[k, :] = sum_j (ar + i ai)[j, :] * (wc + i ws)[j, k]."""
    dn = (((0,), (0,)), ((), ()))
    f = partial(jax.lax.dot_general, dimension_numbers=dn,
                preferred_element_type=jnp.float32, precision=prec)
    rr = f(wc, ar)
    ri = f(wc, ai)
    ir = f(ws, ar)
    ii = f(ws, ai)
    return rr - ii, ri + ir


def _make_kernel(n, in_rows, out_r3, sign, prec):
    r1, r2, r3 = _factor(n)
    m = n // r1  # = r2 * r3

    def kernel(xr_ref, xi_ref, w1c, w1s, a1c, a1s, b1c, b1s,
               w2c, w2s, t2c, t2s, w3c, w3s, yr_ref, yi_ref):
        # stage 1: contract j1 (rows). x viewed (in_rows, m), j = j1*m + j2
        xr = xr_ref[...].reshape(in_rows, m)
        xi = xi_ref[...].reshape(in_rows, m)
        mr, mi = _cdot0(xr, xi, w1c[...], w1s[...], prec)  # (r1=k1, m=j2)

        # transpose to (j21, k1, j22), then the FACTORED stage-1 twiddle:
        # W_n^(k1*j2) = A[k1, j21] * B[k1, j22]
        mr = jnp.transpose(mr.reshape(r1, r2, r3), (1, 0, 2))
        mi = jnp.transpose(mi.reshape(r1, r2, r3), (1, 0, 2))
        ac = jnp.transpose(a1c[...])[:, :, None]  # (j21, k1, 1)
        as_ = jnp.transpose(a1s[...])[:, :, None]
        mr, mi = _cmul(mr, mi, ac, as_)
        mr, mi = _cmul(mr, mi, b1c[...][None, :, :], b1s[...][None, :, :])

        # stage 2: contract j21 (rows of the (r2, r1*r3) view)
        mr, mi = _cdot0(mr.reshape(r2, r1 * r3), mi.reshape(r2, r1 * r3),
                        w2c[...], w2s[...], prec)  # (k2, (k1, j22))

        # stage-2 twiddle W_m^(k2*j22), broadcast over k1
        mr = mr.reshape(r2, r1, r3)
        mi = mi.reshape(r2, r1, r3)
        mr, mi = _cmul(mr, mi, t2c[...][:, None, :], t2s[...][:, None, :])

        # stage 3: contract j22 (lanes)
        dn = (((2,), (0,)), ((), ()))
        f = partial(jax.lax.dot_general, dimension_numbers=dn,
                    preferred_element_type=jnp.float32, precision=prec)
        rr = f(mr, w3c[...])
        ii = f(mi, w3s[...])
        ri = f(mr, w3s[...])
        ir = f(mi, w3c[...])
        yr = rr - ii  # (k2, k1, k3)
        yi = ri + ir

        # natural order k = k3*r1*r2 + k2*r1 + k1
        yr_ref[...] = jnp.transpose(yr, (2, 0, 1)).reshape(1, out_r3 * r2 * r1)
        yi_ref[...] = jnp.transpose(yi, (2, 0, 1)).reshape(1, out_r3 * r2 * r1)

    return kernel


@partial(jax.jit,
         static_argnames=("sign", "n", "out_len", "precision", "interpret"))
def fft_mx3(zr: jnp.ndarray, zi: jnp.ndarray, sign: int = -1,
            n: int | None = None, out_len: int | None = None,
            precision: str = "high", interpret: bool = False):
    """Batched complex DFT via the fused 3-stage Pallas kernel.

    Same contract as ops.mxfft.fft_mx: zr/zi (B, in_len) float32 with
    in_len <= n an implicit zero pad; sign=-1 forward / +1 inverse
    (unscaled); out_len keeps only the first outputs (rounded up to
    n / r3 internally). in_len must be a multiple of n // 128.
    """
    B, in_len = zr.shape
    n = n or in_len
    r1, r2, r3 = _factor(n)
    m = n // r1
    if in_len % m:
        raise ValueError(f"in_len ({in_len}) must be a multiple of {m}")
    in_rows = in_len // m

    out_r3 = r3
    if out_len is not None and out_len < n:
        out_r3 = max(1, -(-out_len // (r1 * r2)))
    out_n = out_r3 * r1 * r2

    w1 = _dft(r1, sign)
    # W_n^(k1*j2) with j2 = j21*r3 + j22 factors as
    # W_(n/r3)^(k1*j21) * W_n^(k1*j22), n/r3 = r1*r2
    a1 = _twiddle(r1, r2, r1 * r2, sign)
    b1 = _twiddle(r1, r3, n, sign)
    w2 = _dft(r2, sign)
    t2 = _twiddle(r2, r3, m, sign)        # W_m^(k2*j22)
    w3 = _dft(r3, sign)
    w1 = (w1[0][:in_rows], w1[1][:in_rows])
    w3 = (w3[0][:, :out_r3], w3[1][:, :out_r3])

    consts = [jnp.asarray(a) for pair in (w1, a1, b1, w2, t2, w3)
              for a in pair]
    const_specs = [
        pl.BlockSpec(c.shape, lambda b, _nd=c.ndim: (0,) * _nd,
                     memory_space=pltpu.VMEM)
        for c in consts
    ]

    kernel = _make_kernel(n, in_rows, out_r3, sign,
                          _mxu_precision(precision))
    yr, yi = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, in_len), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)] * 2 + const_specs,
        out_specs=[pl.BlockSpec((1, out_n), lambda b: (b, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((B, out_n), jnp.float32)] * 2,
        interpret=interpret,
    )(zr, zi, *consts)
    if out_len is not None and out_n > out_len:
        yr, yi = yr[:, :out_len], yi[:, :out_len]
    return yr, yi


def _mxu_precision(precision: str):
    from st_ito_tpu.ops.mxfft import _PRECISIONS

    return _PRECISIONS[precision]
