"""Fused two-stage MXU FFT in one Pallas kernel (per-candidate, VMEM).

The jnp four-step FFT (ops/mxfft.py) is the ES hot path's transform; its
dot_generals measure ~86 ms per forward+inverse pair per generation
(pop 512, n 2^19) with another ~16 ms of inter-stage reshape/twiddle
passes — and part of the dot time itself is HBM stall, because every
stage round-trips the (512, 2^19) complex intermediates through HBM
(PERF_NOTES.md). This kernel runs BOTH stages of the same n = n1*n2
four-step factorization inside VMEM, one candidate per grid step, so the
only HBM traffic is the input and output block of each candidate.

Mosaic (the Pallas TPU compiler) constrains the design:

- no lane-crossing reshapes/transposes (the earlier 3-stage kernel
  died on ``infer-vector-layout: unsupported shape cast``), so every
  array keeps a fixed 2-D layout and the stage-2 contraction uses
  ``dot_general`` dimension numbers instead of a transpose;
- only DEFAULT / HIGHEST dot precisions lower, so f32-grade accuracy
  (XLA's HIGH = 3-pass bfloat16) is rebuilt manually: operands are
  split a = hi + lo into bfloat16 halves and contracted as
  hi@hi + hi@lo + lo@hi (the lo@lo term is below f32 rounding).

Algorithm (decimation-in-time four-step): with j = j1*n2 + j2 and
k = k2*n1 + k1,

    X[k2*n1 + k1] = sum_j2 W_n^(k1*j2) W_n2^(k2*j2)
                        sum_j1 x[j1*n2 + j2] W_n1^(k1*j1)

laid out so no data movement is ever needed:

    stage 1   dot ((0,),(0,)): (j1, j2) -> (k1, j2)   [contract sublanes]
    twiddle   full (n1, n2) table, elementwise        [exact int phase]
    stage 2   dot ((1,),(1,)): (k1, j2) x (k2, j2) -> (k2, k1)

and (k2, k1) row-major IS natural frequency order — no final transpose.
Complex products use the 3-multiply (Karatsuba) trick via a precomputed
cos+sin table, matching ops/mxfft.py.

The guard band stays implicit: a forward input shorter than n only
contracts the nonzero rows of the stage-1 DFT matrix (in_len must be a
multiple of n2); an inverse with out_len < n only computes the needed
k2 rows of stage 2.

Reached via ``fft_mode="fused"`` of the population renderer / bench;
parity is tested against ops/mxfft.py and numpy in interpret mode
(tests/test_fused_fft.py) and the silent shape gate lives in
ops/pallas/packed_response.py.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _radix(n: int) -> tuple[int, int]:
    k = n.bit_length() - 1
    if (1 << k) != n:
        raise ValueError(f"fused_fft requires a power-of-two size, got {n}")
    n1 = 1 << ((k + 1) // 2)
    return n1, n // n1


def supported(n: int, in_len: int) -> bool:
    """Static eligibility: callers fall back to the four-step otherwise."""
    if n <= 0 or (n & (n - 1)):
        return False
    n1, n2 = _radix(n)
    # n2 is the lane dim of the input view and n1 the lane dim of the
    # output view — both must be full 128-lane multiples; in_len must
    # tile into whole stage-1 rows.
    return n2 >= 128 and n1 >= 128 and in_len % n2 == 0 and in_len <= n


def _dft_table(rows: int, cols: int, denom: int, sign: int):
    """cos/sin/(cos+sin) of sign*2*pi*(r*c mod denom)/denom, float32."""
    r = np.arange(rows, dtype=np.int64)[:, None]
    c = np.arange(cols, dtype=np.int64)[None, :]
    ang = sign * 2.0 * np.pi * ((r * c) % denom).astype(np.float64) / denom
    cosv = np.cos(ang)
    sinv = np.sin(ang)
    return (cosv.astype(np.float32), sinv.astype(np.float32),
            (cosv + sinv).astype(np.float32))


def _bf16_split_np(a: np.ndarray):
    hi = a.astype(np.float32)
    hi_b = jnp.asarray(hi).astype(jnp.bfloat16)
    lo_b = (jnp.asarray(hi) - hi_b.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi_b, lo_b


def _bf16_split(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(ah, al, bh, bl, dn):
    """3-pass bf16 contraction ~ f32: hi@hi + hi@lo + lo@hi."""
    f = partial(jax.lax.dot_general, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
    return f(ah, bh) + f(ah, bl) + f(al, bh)


def _dot1(ah, _al, bh, _bl, dn):
    """1-pass bf16 contraction (DEFAULT precision)."""
    return jax.lax.dot_general(ah, bh, dimension_numbers=dn,
                               preferred_element_type=jnp.float32)


_DOTS = {"default": _dot1, "high": _dot3, "mixed": _dot3, "highest": _dot3}


def _make_kernel(in_rows, n2, out_rows, n1, dot):
    dn1 = (((0,), (0,)), ((), ()))  # contract sublanes of both
    dn2 = (((1,), (1,)), ((), ()))  # contract lanes of both

    def kernel(xr_ref, xi_ref,
               w1c_h, w1c_l, w1s_h, w1s_l, w1m_h, w1m_l,
               twc, tws,
               w2c_h, w2c_l, w2s_h, w2s_l, w2m_h, w2m_l,
               yr_ref, yi_ref):
        xr = xr_ref[...].reshape(in_rows, n2)
        xi = xi_ref[...].reshape(in_rows, n2)

        # stage 1 (contract j1): 3-multiply complex product with the
        # (cos, sin, cos+sin) tables: for t = c + i*s,
        #   re = c@xr - s@xi,  im = (c+s)@(xr+xi) - c@xr - s@xi
        xrh, xrl = _bf16_split(xr)
        xih, xil = _bf16_split(xi)
        xsh, xsl = _bf16_split(xr + xi)
        a = dot(w1c_h[...], w1c_l[...], xrh, xrl, dn1)   # c@xr
        b = dot(w1s_h[...], w1s_l[...], xih, xil, dn1)   # s@xi
        c = dot(w1m_h[...], w1m_l[...], xsh, xsl, dn1)   # (c+s)@(xr+xi)
        mr = a - b
        mi = c - a - b

        # stage-1 twiddle W_n^(k1*j2): full-table elementwise complex mul
        tr = twc[...]
        ti = tws[...]
        mr, mi = mr * tr - mi * ti, mr * ti + mi * tr

        # stage 2 (contract j2, the lane dim of both operands):
        # out[k2, k1] = sum_j2 W2[k2, j2] * M[k1, j2]
        mrh, mrl = _bf16_split(mr)
        mih, mil = _bf16_split(mi)
        msh, msl = _bf16_split(mr + mi)
        a2 = dot(w2c_h[...], w2c_l[...], mrh, mrl, dn2)
        b2 = dot(w2s_h[...], w2s_l[...], mih, mil, dn2)
        c2 = dot(w2m_h[...], w2m_l[...], msh, msl, dn2)

        # (k2, k1) row-major is natural order k = k2*n1 + k1
        yr_ref[...] = (a2 - b2).reshape(1, out_rows, n1)
        yi_ref[...] = (c2 - a2 - b2).reshape(1, out_rows, n1)

    return kernel


@partial(jax.jit,
         static_argnames=("sign", "n", "out_len", "precision", "interpret"))
def fft_fused(zr: jnp.ndarray, zi: jnp.ndarray, sign: int = -1,
              n: int | None = None, out_len: int | None = None,
              precision: str = "high", interpret: bool = False):
    """Batched complex DFT via the fused two-stage Pallas kernel.

    Same contract as ops.mxfft.fft_mx: zr/zi (B, in_len) float32 with
    in_len <= n an implicit zero pad; sign=-1 forward / +1 inverse
    (unscaled); out_len keeps only the first outputs (computed in whole
    n1-wide rows internally). in_len must be a multiple of n2 = n/n1.
    """
    B, in_len = zr.shape
    n = n or in_len
    n1, n2 = _radix(n)
    if not supported(n, in_len):
        raise ValueError(
            f"fused_fft: unsupported (n={n}, in_len={in_len}); need "
            f"power-of-two n with n2={n2} >= 128 and in_len % n2 == 0")
    in_rows = in_len // n2

    out_rows = n2
    if out_len is not None and out_len < n:
        out_rows = max(1, -(-out_len // n1))
    out_n = out_rows * n1

    w1 = _dft_table(in_rows, n1, n1, sign)          # W_n1^(j1*k1), sliced rows
    tw = _dft_table(n1, n2, n, sign)                # W_n^(k1*j2)
    w2 = _dft_table(out_rows, n2, n2, sign)         # W_n2^(k2*j2), sliced rows

    consts = []
    for mat in w1:
        consts += list(_bf16_split_np(mat))
    consts += [jnp.asarray(tw[0]), jnp.asarray(tw[1])]
    for mat in w2:
        consts += list(_bf16_split_np(mat))
    const_specs = [
        pl.BlockSpec(c.shape, lambda b, _nd=c.ndim: (0,) * _nd,
                     memory_space=pltpu.VMEM)
        for c in consts
    ]

    dot = _DOTS.get(precision, _dot3)
    kernel = _make_kernel(in_rows, n2, out_rows, n1, dot)
    zr3 = zr.reshape(B, in_rows, n2)
    zi3 = zi.reshape(B, in_rows, n2)
    # The per-candidate working set (in/out blocks, bf16-split tables,
    # f32 intermediates) tops out ~40 MB at n=2^19 — above Mosaic's
    # conservative 16 MB default scoped-vmem limit but comfortably
    # inside the v5e's 128 MB physical VMEM.
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    yr, yi = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, in_rows, n2), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)] * 2 + const_specs,
        out_specs=[pl.BlockSpec((1, out_rows, n1), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((B, out_rows, n1),
                                        jnp.float32)] * 2,
        interpret=interpret,
        **kwargs,
    )(zr3, zi3, *consts)
    yr = yr.reshape(B, out_n)
    yi = yi.reshape(B, out_n)
    if out_len is not None and out_n > out_len:
        yr, yi = yr[:, :out_len], yi[:, :out_len]
    return yr, yi
