"""Large batched FFT as MXU matrix products (four-step Cooley-Tukey).

XLA's TPU FFT custom-call runs far below the HBM roofline for big batched
1-D transforms (measured on the ES hot path: ~147 ms per generation for the
(512, 2^19) rfft/irfft pair at population 256 — ~15x off speed-of-light).
Factoring n = n1*n2 and running the two short DFT stages as complex matrix
products moves the work onto the MXU, where a 2^19-point transform over a
256-candidate population costs ~3 bf16-TFLOP per direction at HIGH
precision (3-pass bf16 = f32-grade accuracy).

Algorithm (decimation-in-time four-step): with j = j1*n2 + j2 and
k = k2*n1 + k1,

    X[k2*n1 + k1] = sum_j2 W_n^(k1*j2) W_n2^(k2*j2) sum_j1 x[j1*n2+j2] W_n1^(k1*j1)

i.e. reshape to (n1, n2), DFT the columns (matmul over j1), twiddle by
W_n^(k1*j2), DFT the rows (matmul over j2), transpose-reshape back to
natural order.

``packed_lti_apply`` uses this to run the fused-LTI chain stage on a
stereo population by packing z = x_L + i*x_R — one complex transform per
candidate instead of two real ones — and applying the (scalar / monomix)
response directly on the packed spectrum via hermitian identities.
Used by the population renderer (chain/executor.py); the per-candidate /
gradient paths keep jnp.fft.
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,   # 1-pass bf16 (fastest)
    "high": jax.lax.Precision.HIGH,         # 3-pass bf16 (~f32)
    "highest": jax.lax.Precision.HIGHEST,   # 6-pass bf16
}


_MAX_DIRECT = 2048  # largest direct DFT matrix (full MXU tiles, 16 MB f32)


def _radix(n: int) -> int:
    """First-stage radix: near-sqrt split. Radices below 128 under-fill the
    systolic array (measured: a [128, 32, 128] factorization of 2^19 is no
    faster than [1024, 512] despite 5x fewer nominal FLOPs), so keep every
    contraction a multiple of full 128-tiles."""
    k = n.bit_length() - 1
    if (1 << k) != n:
        raise ValueError(f"mxfft requires a power-of-two size, got {n}")
    return 1 << ((k + 1) // 2)


def _phase(rows: int, cols: int, denom: int, sign: float):
    """sign*2*pi*((r*c) mod denom)/denom as a traced (rows, cols) f32
    angle grid. Built ON DEVICE (iota products) rather than as numpy
    constants: at the long-audio sizes (n = 2^22+) the table constants
    were >100 MB of HLO, which the remote-relay compile service cannot
    embed (the device->host fetch of a trace-time jax.Array constant is
    UNIMPLEMENTED on the axon backend). The (r*c) mod denom reduction is
    exact in int32 for every denom <= 2^31, and the reduced product is a
    small-enough integer that the f32 angle is ~1e-7 rad accurate — the
    f64-free equivalent of the old numpy path (same trick as
    pallas/mega_fft._phase_cs). XLA hoists the tables as loop-invariant,
    so per-dispatch cost is a few ms of VPU transcendentals."""
    r = jnp.arange(rows, dtype=jnp.int32)[:, None]
    c = jnp.arange(cols, dtype=jnp.int32)[None, :]
    prod = (r * c) % denom
    return (sign * 2.0 * math.pi / denom) * prod.astype(jnp.float32)


def _dft_mats(m: int, sign: float):
    """Forward (sign=-1) / inverse (sign=+1) DFT matrix W[j, k] as
    (cos, sin, cos+sin) float32 (the sum matrix serves the 3-multiply
    Karatsuba complex product). Traced, not constant — see _phase."""
    ang = _phase(m, m, m, sign)
    c = jnp.cos(ang)
    s = jnp.sin(ang)
    return c, s, c + s


def _twiddle(n1: int, n2: int, sign: float):
    """W_n^(k1*j2) as (n2, n1) float32 cos/sin (laid out [j2, k1] to match
    the step-1 output layout). Traced, not constant — see _phase."""
    ang = _phase(n2, n1, n1 * n2, sign)
    return jnp.cos(ang), jnp.sin(ang)


def _cmatmul(ar, ai, mats, precision):
    """(ar + i*ai) @ (c + i*s) via Karatsuba (3 real matmuls; the constant
    (c+s) matrix is precomputed)."""
    c, s, cs = mats
    t1 = jnp.matmul(ar, c, precision=precision)
    t2 = jnp.matmul(ai, s, precision=precision)
    t3 = jnp.matmul(ar + ai, cs, precision=precision)
    return t1 - t2, t3 - t1 - t2


def _fft_rec(zr, zi, n: int, sign: int, prec, out_limit: int | None = None):
    """Recursive mixed-radix DFT over the last axis. Each level splits
    n = r * m: a radix-r DFT matmul over the outer digit, the n-point
    twiddle, then recursion on m. Radices stay near sqrt(n) so every
    contraction is whole MXU tiles.

    The inputs may be SHORTER than n (implicit zero padding — the
    convolution guard band): the stage-1 contraction then only uses the
    nonzero rows of the DFT matrix, halving its FLOPs for a 2x guard.
    ``out_limit`` (a multiple of the stage-1 radix, or None) keeps only the
    first outputs — the inverse transform of a convolution only needs the
    first T samples, which halves the inner-level matmul columns.
    """
    in_len = zr.shape[-1]
    if n <= _MAX_DIRECT:
        c, s, cs = _dft_mats(n, sign)
        if in_len < n:
            c, s, cs = c[:in_len], s[:in_len], cs[:in_len]
        if out_limit is not None and out_limit < n:
            c, s, cs = c[:, :out_limit], s[:, :out_limit], cs[:, :out_limit]
        return _cmatmul(zr, zi, (c, s, cs), prec)
    r = _radix(n)
    m = n // r
    lead = zr.shape[:-1]

    r_used = -(-in_len // m)  # ceil: outer digits with any nonzero input
    if r_used * m != in_len:
        pad = [(0, 0)] * (zr.ndim - 1) + [(0, r_used * m - in_len)]
        zr, zi = jnp.pad(zr, pad), jnp.pad(zi, pad)
    ar = zr.reshape(-1, r_used, m)
    ai = zi.reshape(-1, r_used, m)
    # radix-r DFT over the outer digit j1 (transpose + matmul)
    ar = jnp.swapaxes(ar, -1, -2)  # (B, j2, j1)
    ai = jnp.swapaxes(ai, -1, -2)
    c, s, cs = _dft_mats(r, sign)
    if r_used < r:
        c, s, cs = c[:r_used], s[:r_used], cs[:r_used]
    br, bi = _cmatmul(ar, ai, (c, s, cs), prec)  # (B, j2, k1)

    # twiddle W_n^(k1*j2), laid out (j2, k1)
    tc, ts = _twiddle(r, m, sign)
    cr = br * tc - bi * ts
    ci = br * ts + bi * tc

    # recurse on the inner digit: (B, k1, j2) with m on the last axis
    cr = jnp.swapaxes(cr, -1, -2)
    ci = jnp.swapaxes(ci, -1, -2)
    m_out = None
    if out_limit is not None and out_limit < n:
        # X[k2*r + k1] < out_limit needs every k2 <= (out_limit-1)//r, i.e.
        # ceil(out_limit/r) inner outputs. Flooring here silently DROPPED
        # tail outputs once the recursion is >= 2 levels deep (n > 2^22):
        # the kept count shrank at each level and the caller's final slice
        # could not restore samples that were never computed.
        m_out = -(-out_limit // r)
    dr, di = _fft_rec(cr, ci, m, sign, prec, out_limit=m_out)
    m_kept = dr.shape[-1]

    # natural order: X[k2*r + k1] -> transpose to (k2, k1)
    dr = jnp.swapaxes(dr, -1, -2).reshape(*lead, m_kept * r)
    di = jnp.swapaxes(di, -1, -2).reshape(*lead, m_kept * r)
    return dr, di


@partial(jax.jit, static_argnames=("n", "sign", "precision", "out_len"))
def fft_mx(zr: jnp.ndarray, zi: jnp.ndarray, sign: int = -1,
           precision: str = "high", n: int | None = None,
           out_len: int | None = None):
    """Batched complex DFT over the last axis via MXU matmul stages.

    zr/zi: (..., in_len) float32 with in_len <= n (shorter inputs are an
    implicit zero pad — cheaper than materializing it); n a power of two.
    sign=-1 forward, sign=+1 inverse WITHOUT the 1/n scale (caller applies
    it). ``out_len`` returns only the first outputs (rounded up to the
    stage radix internally, then sliced).
    Returns (real, imag) in natural frequency order.
    """
    n = n or zr.shape[-1]
    out_limit = None
    if out_len is not None and out_len < n:
        r = _radix(n) if n > _MAX_DIRECT else n
        out_limit = min(-(-out_len // r) * r, n)
    dr, di = _fft_rec(zr, zi, n, sign, _PRECISIONS[precision],
                      out_limit=out_limit)
    if out_len is not None and dr.shape[-1] > out_len:
        dr, di = dr[..., :out_len], di[..., :out_len]
    return dr, di


def hermitian_extend(H: jnp.ndarray, n: int) -> jnp.ndarray:
    """Half-grid response (..., n//2+1) -> full grid (..., n) via
    H[n-k] = conj(H[k]) (real impulse response)."""
    body = jnp.conj(jnp.flip(H[..., 1:-1], axis=-1))
    return jnp.concatenate([H, body], axis=-1)


def _apply_packed_response(Zr, Zi, P, Q, Pc, Qc, n: int):
    """Y = P_full*Z + Q_full*conj(Zrev) where the full-grid responses are
    defined by their lower-half values (P, Q on k in [0, n/2]) and
    upper-half generators (P_full[n-k] = conj(Pc[k]), same for Q).

    Each output half is ONE elementwise expression over aligned or
    reversed slices of Z and the half-grid arrays, so XLA compiles it to a
    couple of loop fusions — no full-grid response or reversed-Z
    materialization (measured: the materializing formulation spent ~60 ms
    per generation in rev/roll/concat/mul passes at population 512).
    Q/Qc may be None (pure diagonal response). Returns (Yr, Yi).
    """
    F = n // 2 + 1
    z_lo = jax.lax.complex(Zr[..., :F], Zi[..., :F])
    z_hi = jax.lax.complex(Zr[..., F:], Zi[..., F:])

    # NB: negative-step slices (a[..., x:y:-1]) lower to GATHER on TPU
    # (measured 31 ms/gen at pop 512); slice + jnp.flip lowers to the much
    # cheaper reverse op instead.
    def _revslice(a, lo, hi):
        return jnp.flip(a[..., lo:hi], axis=-1)

    y_lo = P * z_lo
    if Q is not None:
        # conj(Z[(n-k) % n]) for k in [0, n/2]: k=0 -> Z[0], else reversed
        # upper slice
        r_lo = jnp.conj(jnp.concatenate(
            [jax.lax.complex(Zr[..., :1], Zi[..., :1]),
             jax.lax.complex(_revslice(Zr, n - F + 1, None),
                             _revslice(Zi, n - F + 1, None))],
            axis=-1))
        y_lo = y_lo + Q * r_lo

    y_hi = jnp.conj(_revslice(Pc, 1, -1)) * z_hi
    if Qc is not None:
        z_mid_rev = jax.lax.complex(_revslice(Zr, 1, n // 2),
                                    _revslice(Zi, 1, n // 2))
        y_hi = y_hi + jnp.conj(_revslice(Qc, 1, -1)) * jnp.conj(z_mid_rev)

    # DC/Nyquist correction: per-channel irfft forces those self-conjugate
    # bins to Re(Y_ch); the packed equivalent is (Y(b) + Y_ext(b))/2 where
    # Y_ext(b) = conj(Pc(b)) Z(b) + conj(Qc(b)) conj(Z(b)) is the
    # conjugate-extension value (Zrev(b) = Z(b) at b in {0, n/2}). Without
    # it, responses with complex DC/Nyquist values (fractional delays)
    # leak the dropped imaginary parts into both packed channels. The
    # corrected columns ride the output concatenate (a column update
    # would copy the whole (B, n) array).
    def _fix(b):
        zb = z_lo[..., b:b + 1]
        ext = jnp.conj(Pc[..., b:b + 1]) * zb
        if Qc is not None:
            ext = ext + jnp.conj(Qc[..., b:b + 1]) * jnp.conj(zb)
        return 0.5 * (y_lo[..., b:b + 1] + ext)

    parts = [_fix(0), y_lo[..., 1:F - 1], _fix(F - 1), y_hi]
    Yr = jnp.concatenate([jnp.real(p) for p in parts], axis=-1)
    Yi = jnp.concatenate([jnp.imag(p) for p in parts], axis=-1)
    return Yr, Yi


def packed_lti_apply(x: jnp.ndarray, kind: str, H, n: int,
                     precision: str = "high") -> jnp.ndarray:
    """Apply a fused LTI response to a population by packed complex FFT.

    x: (B, C, T) float32 with C in {1, 2}; H on the half grid (B, n//2+1)
    per the response kinds of chain/responses.py ("scalar" or "monomix").
    Returns the filtered (B, C, T) (linear convolution up to lag n - T).

    Stereo packs z = x_L + i*x_R (one transform per candidate); the
    response application uses XL = (Z + conj(Zrev))/2,
    XR = -i(Z - conj(Zrev))/2:
      scalar H:   Y = H*Z                       (no unpacking needed)
      monomix:    Y = [D + (GL+iGR)(1-i)/2]*Z + [(GL+iGR)(1+i)/2]*conj(Zrev)
    Mono packs candidate pairs (z = x_2b + i*x_{2b+1}) with per-part
    responses H1, H2: Y = ((H1+H2)/2)*Z + ((H1-H2)/2)*conj(Zrev).

    precision "mixed" = forward at "high" (3-pass bf16, ~f32), inverse at
    "default" (1-pass): the inverse's ~1e-3 relative noise sits below the
    bfloat16 embed front end's own quantization (~4e-3), so fitness
    ranking is unaffected while 2/3 of the inverse matmul passes drop.
    """
    if precision == "mixed":
        fwd_prec, inv_prec = "high", "default"
    else:
        fwd_prec = inv_prec = precision
    B, C, T = x.shape
    # the guard band to n is an IMPLICIT zero pad: fft_mx skips the zero
    # rows of its first DFT stage instead of transforming them
    if C == 2:
        zr, zi = x[:, 0, :], x[:, 1, :]
    else:
        Bp = B + (B % 2)
        if Bp != B:
            x = jnp.pad(x, ((0, 1), (0, 0), (0, 0)))
        zr, zi = x[0::2, 0, :], x[1::2, 0, :]

    Zr, Zi = fft_mx(zr, zi, sign=-1, precision=fwd_prec, n=n)

    ones = jnp.ones((1, n // 2 + 1), jnp.complex64)  # broadcast (B,1)->(B,F)
    if C == 2 and kind == "scalar":
        Hh = H * ones
        P, Q, Pc, Qc = Hh, None, Hh, None  # hermitian diagonal response
    elif C == 2:  # monomix
        # all response arithmetic on the half grid; the upper halves
        # follow from hermitian D/GL/GR:
        #   P[k] = D + (GL+iGR)(1-i)/2,  P[n-k] = conj(D + (GL-iGR)(1+i)/2)
        #   Q[k] = (GL+iGR)(1+i)/2,      Q[n-k] = conj((GL-iGR)(1-i)/2)
        D, GL, GR = (v * ones for v in H)
        A1 = GL + 1j * GR
        A2 = GL - 1j * GR
        c1 = (1.0 - 1j) / 2.0
        c2 = (1.0 + 1j) / 2.0
        P, Q = D + A1 * c1, A1 * c2
        Pc, Qc = D + A2 * c2, A2 * c1
    else:  # mono: candidate pairs with distinct scalar responses
        Hh = H * ones
        if Hh.shape[0] % 2 == 1:
            Hh = jnp.concatenate(
                [Hh, jnp.ones((1, Hh.shape[1]), Hh.dtype)], axis=0)
        P = (Hh[0::2] + Hh[1::2]) / 2.0
        Q = (Hh[0::2] - Hh[1::2]) / 2.0
        Pc, Qc = P, Q  # both hermitian
    Yr, Yi = _apply_packed_response(Zr, Zi, P, Q, Pc, Qc, n)

    # inverse only needs the first T samples: the inner DFT level drops the
    # unused output columns
    yr, yi = fft_mx(Yr, Yi, sign=1, precision=inv_prec, out_len=T)
    scale = 1.0 / n
    if C == 2:
        return jnp.stack([yr * scale, yi * scale], axis=1)
    y = jnp.stack([yr * scale, yi * scale], axis=1)
    y = y.reshape(-1, 1, T)[:B]
    return y
