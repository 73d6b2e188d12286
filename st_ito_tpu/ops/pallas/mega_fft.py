"""Glue-free packed-LTI FFT pair: stereo pack + forward FFT emitting
(Zlo, Zrev) directly, and an inverse FFT consuming (Ylo, Yhig) directly.

Profiling the ES hot path (PERF_NOTES.md, r3) showed the four-step FFT's
dots surrounded by ~50 ms/gen of pure data movement at pop 512 / n 2^19:
channel slices into the packed transform, slice+reverse+concat passes
building Zrev = Z[(n-k) mod n], lane padding for the response kernel,
flip+concat reassembling the full spectrum from (Ylo, Yhig), and the
final stack back to (B, 2, T) — every pass a full (512, 2^19) HBM round
trip, several in quarter-utilized T(2,128)/T(1,128) layouts.

These two kernels eliminate all of it structurally:

- ``fwd_pack_fft``: reads the stereo block (1, 2, in_rows, n2), packs
  z = L + i R in VMEM, runs both four-step stages (dot contracting
  sublanes, full-table twiddle, dot contracting lanes), and emits BOTH
  half-grid arrays the fused response kernel consumes: Zlo[k] = Z[k] and
  Zrev[k] = Z[(n-k) mod n], each laid out (Rp, n1) row-major = the
  natural flat half grid padded to Rp = pad8(n2/2 + 1) rows.
- ``inv_unpack_fft``: consumes (Ylo, Yhig) in the same layout and runs
  the inverse four-step, producing (1, 2, Tr, n2) scaled L/R time rows.

The mirror Z[(n-k) mod n] never exists as a data-movement op (Mosaic has
no `rev`, and XLA's slice+reverse+concat is what we are deleting):
natural index (k2, k1) of bin b = k2*n1 + k1 maps the mirror to
(n2-1-k2, n1-k1) for k1 >= 1, so the mirrored output is produced by the
same stage-2 contraction against ROW-PERMUTED W2 tables and a stage-1
pass against COLUMN-PERMUTED W1/twiddle tables — index permutations
baked into the (traced, loop-invariant; never HLO constants — the
compile relay rejects multi-MB literals) table builders, plus a tiny
separate dot for the k1 = 0 column where the mirror wraps rows. The
inverse absorbs the (Ylo, Yhig) split the same way: stage A runs once
with natural tables over the masked lo half and once with row-permuted
tables over the masked hi half (whose lane coordinate is the mirrored
k1, handled by lane-mirrored twiddle/stage-B tables), and the wrapped
k1 = 0 column contributes through a third skinny dot.

Accuracy matches the four-step at HIGH precision: Mosaic only lowers
DEFAULT/HIGHEST dot precisions, so f32-grade dots are built manually as
3-pass bfloat16 hi/lo contractions with the 3-multiply complex trick
(shared with ops/pallas/fused_fft.py).

Reached via ``fft_mode="mega"`` of the population renderer / bench;
parity is tested against the packed four-step path in interpret mode
(tests/test_mega_fft.py).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from st_ito_tpu.ops.pallas.fused_fft import _DOTS, _bf16_split


def _radix(n: int) -> tuple[int, int]:
    k = n.bit_length() - 1
    if (1 << k) != n:
        raise ValueError(f"mega_fft requires a power-of-two size, got {n}")
    n1 = 1 << ((k + 1) // 2)
    return n1, n // n1


def _pad8(x: int) -> int:
    return -(-x // 8) * 8


def half_grid(n: int) -> tuple[int, int]:
    """(Rp, n1): the padded half-grid row count and lane width. Flat
    arrays are (B, Rp * n1) with bin k at flat index k (k <= n/2)."""
    n1, n2 = _radix(n)
    return _pad8(n2 // 2 + 1), n1


def supported(n: int, T: int) -> bool:
    if n <= 0 or (n & (n - 1)):
        return False
    n1, n2 = _radix(n)
    return n2 >= 128 and n1 >= 128 and T % n2 == 0 and 0 < T <= n


# ------------------------------------------------------------- tables


def _phase_cs(rows_idx, cols_idx, denom: int, sign: int):
    """cos/sin/(cos+sin) of sign*2*pi*((r*c) mod denom)/denom from int32
    index vectors — traced jnp (loop-invariant, hoisted by XLA), exact
    integer phase reduction (f32 r*c drifts ~1e-2 rad at 2^19 grids)."""
    prod = (rows_idx[:, None] * cols_idx[None, :]) % denom
    ang = (sign * 2.0 * math.pi / denom) * prod.astype(jnp.float32)
    c = jnp.cos(ang)
    s = jnp.sin(ang)
    return c, s, c + s


def _bf16_tables(cs) -> list[jnp.ndarray]:
    out = []
    for t in cs:
        hi, lo = _bf16_split(t)
        out += [hi, lo]
    return out


def _ar(k, dtype=jnp.int32):
    return jnp.arange(k, dtype=dtype)


def _fwd_tables(n: int, in_rows: int, Rp: int, sign: int = -1):
    n1, n2 = _radix(n)
    j1 = _ar(in_rows)
    k1 = _ar(n1)
    k1m = (n1 - k1) % n1          # mirrored output-lane index
    j2 = _ar(n2)
    r = _ar(Rp)
    # stage 1 (contract j1): W_n1^(j1*k1); mirrored-column variant
    w1 = _bf16_tables(_phase_cs(j1, k1, n1, sign))
    w1m = _bf16_tables(_phase_cs(j1, k1m, n1, sign))
    # stage-1 twiddle W_n^(k1*j2) as full (n1, n2) tables, f32
    t1c, t1s, _ = _phase_cs(k1, j2, n, sign)
    t1mc, t1ms, _ = _phase_cs(k1m, j2, n, sign)
    # stage 2 (contract j2): W_n2^(k2*j2) with k2 = r (lo), n2-1-r (rev),
    # (n2-r) % n2 (the wrapped k1=0 column; f32 — it runs as an exact
    # elementwise multiply-reduce, not a dot: Mosaic miscompiles dots
    # with 1-lane outputs)
    w2lo = _bf16_tables(_phase_cs(r, j2, n2, sign))
    w2rev = _bf16_tables(_phase_cs(n2 - 1 - r, j2, n2, sign))
    c0c, c0s, _ = _phase_cs((n2 - r) % n2, j2, n2, sign)
    return w1 + w1m + [t1c, t1s, t1mc, t1ms] + w2lo + w2rev + [c0c, c0s]


def _inv_tables(n: int, Tr: int, Rp: int, sign: int = 1):
    n1, n2 = _radix(n)
    Rh = n2 // 2 + 1
    r = _ar(Rp)
    t2 = _ar(n2)                  # tau2
    k1 = _ar(n1)
    li = (n1 - k1) % n1           # hi lanes carry mirrored k1
    t1 = _ar(Tr)                  # tau1
    # stage A (contract Y rows): W_n2^(tau2*k2); k2 = r (lo), n2-1-r (hi),
    # (n2-r) % n2 (wrapped k1=0 column, valid rows 1..n2/2-1 only)
    wa_lo = _bf16_tables(_phase_cs(r, t2, n2, sign))
    wa_hi = _bf16_tables(_phase_cs(n2 - 1 - r, t2, n2, sign))
    c0_valid = ((r >= 1) & (r < n2 // 2)).astype(jnp.float32)[:, None]
    wa_c0 = _bf16_tables(tuple(t * c0_valid
                               for t in _phase_cs((n2 - r) % n2, t2, n2,
                                                  sign)))
    # stage-A twiddle W_n^(tau2*k1), natural and lane-mirrored
    twc, tws, _ = _phase_cs(t2, k1, n, sign)
    twmc, twms, _ = _phase_cs(t2, li, n, sign)
    # stage B (contract k1 lanes): W_n1^(tau1*k1), natural and mirrored
    wb = _bf16_tables(_phase_cs(t1, k1, n1, sign))
    wbm = _bf16_tables(_phase_cs(t1, li, n1, sign))
    # data masks: lo keeps bins <= n/2 (row Rh-1 only lane 0); hi keeps
    # rows 0..n2/2-1 at lanes >= 1 (lane 0 and the Nyquist-dup row go
    # through the column dot / are duplicates)
    rows = r[:, None]
    lanes = k1[None, :]
    mask_lo = jnp.where(rows < Rh - 1, 1.0,
                        jnp.where((rows == Rh - 1) & (lanes == 0), 1.0, 0.0))
    mask_hi = jnp.where((rows < Rh - 1) & (lanes >= 1), 1.0, 0.0)
    return (wa_lo + wa_hi + wa_c0 + [twc, tws, twmc, twms] + wb + wbm
            + [mask_lo.astype(jnp.float32), mask_hi.astype(jnp.float32)])


# ------------------------------------------------------------- kernels


def _cdot(dot, dn, tab, xr, xi, xs):
    """3-multiply complex contraction: tab = 6 bf16 arrays
    (c_hi, c_lo, s_hi, s_lo, m_hi, m_lo) for (cos, sin, cos+sin);
    x given as bf16 hi/lo pairs for (re, im, re+im).
    Returns f32 (re, im) of sum tab * x over the dn contraction."""
    ch, cl, sh, sl, mh, ml = tab
    a = dot(ch, cl, *xr, dn)
    b = dot(sh, sl, *xi, dn)
    c = dot(mh, ml, *xs, dn)
    return a - b, c - a - b


def _splits(ar, ai):
    return _bf16_split(ar), _bf16_split(ai), _bf16_split(ar + ai)


_DN_ROWS = (((0,), (0,)), ((), ()))   # contract sublanes of both
_DN_LANES = (((1,), (1,)), ((), ()))  # contract lanes of both


_N_FWD_TABS = 30  # table refs consumed by the forward FFT body


def _fwd_compute(x_ref, tabs, dot):
    """The forward packed-FFT body: x block (1, 2, in_rows, n2) + the 30
    forward tables -> (zlr, zli, zvr, zvi), each (Rp, n1) in VMEM."""
    (w1c_h, w1c_l, w1s_h, w1s_l, w1m_h, w1m_l,
     v1c_h, v1c_l, v1s_h, v1s_l, v1m_h, v1m_l,
     t1c, t1s, t1mc, t1ms,
     lo_c_h, lo_c_l, lo_s_h, lo_s_l, lo_m_h, lo_m_l,
     rv_c_h, rv_c_l, rv_s_h, rv_s_l, rv_m_h, rv_m_l,
     c0c, c0s) = tabs
    xr = x_ref[0, 0]          # (in_rows, n2): z = L + i R
    xi = x_ref[0, 1]
    xs = _splits(xr, xi)

    # stage 1, natural and mirrored-k1 variants
    w1 = (w1c_h[...], w1c_l[...], w1s_h[...], w1s_l[...],
          w1m_h[...], w1m_l[...])
    v1 = (v1c_h[...], v1c_l[...], v1s_h[...], v1s_l[...],
          v1m_h[...], v1m_l[...])
    mr, mi = _cdot(dot, _DN_ROWS, w1, *xs)       # (n1, n2), rows k1
    ur, ui = _cdot(dot, _DN_ROWS, v1, *xs)       # rows (n1-k1)%n1

    # stage-1 twiddle (full tables, f32 elementwise)
    mr, mi = (mr * t1c[...] - mi * t1s[...],
              mr * t1s[...] + mi * t1c[...])
    ur, ui = (ur * t1mc[...] - ui * t1ms[...],
              ur * t1ms[...] + ui * t1mc[...])

    ms = _splits(mr, mi)
    us = _splits(ur, ui)
    lo = (lo_c_h[...], lo_c_l[...], lo_s_h[...], lo_s_l[...],
          lo_m_h[...], lo_m_l[...])
    rv = (rv_c_h[...], rv_c_l[...], rv_s_h[...], rv_s_l[...],
          rv_m_h[...], rv_m_l[...])
    # stage 2: Zlo[r, k1] over natural M; Zrev main over mirrored M
    zlr, zli = _cdot(dot, _DN_LANES, lo, *ms)    # (Rp, n1)
    zvr_m, zvi_m = _cdot(dot, _DN_LANES, rv, *us)

    # k1 = 0 column of Zrev wraps rows: exact f32 multiply-reduce
    # against M's k1 = 0 row (a dot here would have a 1-lane output,
    # which Mosaic miscompiles)
    m0r = mr[0:1, :]
    m0i = mi[0:1, :]
    cc = c0c[...]
    cs = c0s[...]
    zc0r = jnp.sum(cc * m0r - cs * m0i, axis=1, keepdims=True)
    zc0i = jnp.sum(cc * m0i + cs * m0r, axis=1, keepdims=True)

    zvr = jnp.concatenate([zc0r, zvr_m[:, 1:]], axis=1)
    zvi = jnp.concatenate([zc0i, zvi_m[:, 1:]], axis=1)
    return zlr, zli, zvr, zvi


def _make_fwd_kernel(in_rows, n1, n2, Rp, dot):
    def kernel(*refs):
        x_ref = refs[0]
        tabs = refs[1:1 + _N_FWD_TABS]
        zlr_ref, zli_ref, zvr_ref, zvi_ref = refs[1 + _N_FWD_TABS:]
        zlr, zli, zvr, zvi = _fwd_compute(x_ref, tabs, dot)
        zlr_ref[...] = zlr.reshape(1, Rp, n1)
        zli_ref[...] = zli.reshape(1, Rp, n1)
        zvr_ref[...] = zvr.reshape(1, Rp, n1)
        zvi_ref[...] = zvi.reshape(1, Rp, n1)

    return kernel


def _make_fwd_resp_kernel(in_rows, n1, n2, Rp, dot, stage_descrs,
                          n_params, n_active, n_tables, ny):
    """Forward packed FFT + the fused LTI response construction/apply in
    ONE kernel: per candidate, compute (Zlo, Zrev) in VMEM, evaluate and
    compose every stage's rp response from per-candidate scalars + full
    (rows, Rp, n1) frequency tables, apply the packed hermitian formula,
    patch the DC/Nyquist self-conjugate bins, and emit (Ylo, Yhig)
    directly — the Z spectra never reach HBM (8 (B, Rp*n1) f32 round
    trips deleted vs the fwd_pack_fft -> response-kernel split).
    ``ny`` = (row, lane) of the Nyquist bin in the half grid."""
    from st_ito_tpu.ops.pallas.packed_response import (
        _apply_block, _compose_block)

    def kernel(*refs):
        x_ref = refs[0]
        pos = 1
        tabs = refs[pos:pos + _N_FWD_TABS]
        pos += _N_FWD_TABS
        flat_params = refs[pos:pos + n_params]
        pos += n_params
        flat_active = refs[pos:pos + n_active]
        pos += n_active
        flat_tables = refs[pos:pos + n_tables]
        pos += n_tables
        ylo_r_ref, ylo_i_ref, yhi_r_ref, yhi_i_ref = refs[pos:pos + 4]

        zlr, zli, zvr, zvi = _fwd_compute(x_ref, tabs, dot)

        param_blocks, active_blocks, table_blocks = [], [], []
        pi = ai = ti = 0
        for effect, pnames, tnames, statics in stage_descrs:
            param_blocks.append(
                {name: flat_params[pi + j][...] for j, name in
                 enumerate(pnames)})
            pi += len(pnames)
            if n_active:
                active_blocks.append(flat_active[ai][...])
                ai += 1
            else:
                active_blocks.append(None)
            table_blocks.append(
                {name: flat_tables[ti + j][...] for j, name in
                 enumerate(tnames)})
            ti += len(tnames)

        kind, H = _compose_block(stage_descrs, param_blocks, active_blocks,
                                 table_blocks)
        ylo_r, ylo_i, yhi_r, yhi_i = _apply_block(
            kind, H, zlr[None], zli[None], zvr[None], zvi[None])
        row = jax.lax.broadcasted_iota(jnp.int32, ylo_r.shape, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, ylo_r.shape, 2)
        ny_row, ny_lane = ny
        sel = (((row == 0) & (lane == 0))
               | ((row == ny_row) & (lane == ny_lane)))
        ylo_r = jnp.where(sel, 0.5 * (ylo_r + yhi_r), ylo_r)
        ylo_i = jnp.where(sel, 0.5 * (ylo_i + yhi_i), ylo_i)
        ylo_r_ref[...] = ylo_r
        ylo_i_ref[...] = ylo_i
        yhi_r_ref[...] = yhi_r
        yhi_i_ref[...] = yhi_i

    return kernel


def _make_inv_kernel(n, n1, n2, Rp, Tr, dot):
    scale = 1.0 / n

    def kernel(ylr_ref, yli_ref, yvr_ref, yvi_ref,
               lo_c_h, lo_c_l, lo_s_h, lo_s_l, lo_m_h, lo_m_l,
               hi_c_h, hi_c_l, hi_s_h, hi_s_l, hi_m_h, hi_m_l,
               c0_c_h, c0_c_l, c0_s_h, c0_s_l, c0_m_h, c0_m_l,
               twc, tws, twmc, twms,
               wb_c_h, wb_c_l, wb_s_h, wb_s_l, wb_m_h, wb_m_l,
               vb_c_h, vb_c_l, vb_s_h, vb_s_l, vb_m_h, vb_m_l,
               mask_lo, mask_hi,
               y_ref):
        ylr = ylr_ref[0] * mask_lo[...]
        yli = yli_ref[0] * mask_lo[...]
        yhr = yvr_ref[0]
        yhi = yvi_ref[0]
        yhr_m = yhr * mask_hi[...]
        yhi_m = yhi * mask_hi[...]

        lo = (lo_c_h[...], lo_c_l[...], lo_s_h[...], lo_s_l[...],
              lo_m_h[...], lo_m_l[...])
        hi = (hi_c_h[...], hi_c_l[...], hi_s_h[...], hi_s_l[...],
              hi_m_h[...], hi_m_l[...])
        c0 = (c0_c_h[...], c0_c_l[...], c0_s_h[...], c0_s_l[...],
              c0_m_h[...], c0_m_l[...])

        # stage A: contract the Y rows (natural lanes from the lo half,
        # mirrored lanes from the hi half, wrapped lane-0 column)
        ar, ai = _cdot(dot, _DN_ROWS, lo, *_splits(ylr, yli))  # (n2, n1)
        hr, hi_ = _cdot(dot, _DN_ROWS, hi, *_splits(yhr_m, yhi_m))
        # wrapped k1=0 column: lane-pad the Yhig column to 128 before the
        # dot (Mosaic miscompiles dots with 1-lane outputs), use column 0
        zpad = jnp.zeros((yhr.shape[0], 127), jnp.float32)
        y0r = jnp.concatenate([yhr[:, 0:1], zpad], axis=1)
        y0i = jnp.concatenate([yhi[:, 0:1], zpad], axis=1)
        c0r, c0i = _cdot(dot, _DN_ROWS, c0, *_splits(y0r, y0i))  # (n2, 128)
        ar = jnp.concatenate([ar[:, 0:1] + c0r[:, 0:1], ar[:, 1:]], axis=1)
        ai = jnp.concatenate([ai[:, 0:1] + c0i[:, 0:1], ai[:, 1:]], axis=1)

        # stage-A twiddle, natural / lane-mirrored
        ar, ai = (ar * twc[...] - ai * tws[...],
                  ar * tws[...] + ai * twc[...])
        hr, hi_ = (hr * twmc[...] - hi_ * twms[...],
                   hr * twms[...] + hi_ * twmc[...])

        wb = (wb_c_h[...], wb_c_l[...], wb_s_h[...], wb_s_l[...],
              wb_m_h[...], wb_m_l[...])
        vb = (vb_c_h[...], vb_c_l[...], vb_s_h[...], vb_s_l[...],
              vb_m_h[...], vb_m_l[...])
        # stage B: contract k1 (lanes); outputs (Tr, n2) natural time
        br, bi = _cdot(dot, _DN_LANES, wb, *_splits(ar, ai))
        cr, ci = _cdot(dot, _DN_LANES, vb, *_splits(hr, hi_))
        yr = (br + cr) * scale    # L channel, rows tau1 of n2 samples
        yi = (bi + ci) * scale    # R channel

        y_ref[0, 0] = yr
        y_ref[0, 1] = yi

    return kernel


def _vmem_params(interpret: bool):
    if interpret:
        return {}
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=110 * 1024 * 1024)}


@partial(jax.jit, static_argnames=("n", "precision", "interpret"))
def fwd_pack_fft(x: jnp.ndarray, n: int, precision: str = "high",
                 interpret: bool = False):
    """x (B, 2, T) float32 -> (ZloR, ZloI, ZrevR, ZrevI), each (B, Rp, n1)
    float32 with bin k of Z = FFT(L + iR, n) at (k // n1, k % n1) for
    k <= n/2 (higher indices hold discardable aliased values). The 3-D
    tiled layout flows into packed_response_apply_rp_padded unchanged —
    flattening to (B, Rp*n1) would be an XLA retile pass."""
    B, C, T = x.shape
    assert C == 2, "fwd_pack_fft is stereo-only"
    if not supported(n, T):
        raise ValueError(f"mega_fft: unsupported (n={n}, T={T})")
    n1, n2 = _radix(n)
    Rp, _ = half_grid(n)
    in_rows = T // n2

    dot = _DOTS.get(precision, _DOTS["high"])
    tables = _fwd_tables(n, in_rows, Rp)
    kernel = _make_fwd_kernel(in_rows, n1, n2, Rp, dot)

    x4 = x.reshape(B, 2, in_rows, n2)
    t_specs = [pl.BlockSpec(t.shape, lambda b, _nd=t.ndim: (0,) * _nd,
                            memory_space=pltpu.VMEM) for t in tables]
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 2, in_rows, n2), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + t_specs,
        out_specs=[pl.BlockSpec((1, Rp, n1), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)] * 4,
        out_shape=[jax.ShapeDtypeStruct((B, Rp, n1), jnp.float32)] * 4,
        interpret=interpret,
        **_vmem_params(interpret),
    )(x4, *tables)
    return outs


def fwd_pack_fft_response(x: jnp.ndarray, stages, n: int,
                          sample_rate: float, precision: str = "high",
                          interpret: bool = False):
    """fwd_pack_fft with the LTI response fused into the kernel epilogue:
    x (B, 2, T) float32 + rp stages -> (YloR, YloI, YhigR, YhigI), each
    (B, Rp, n1), DC/Nyquist-corrected — ready for inv_unpack_fft. VMEM
    budget: ~24 MB forward tables + ~43 MB response tables (freeverb's 38
    rows at Fp = Rp*n1 dominate) + working set, under the 110 MB scoped
    limit on v5e."""
    from st_ito_tpu.ops.pallas.packed_response import _build_stage_inputs

    B, C, T = x.shape
    assert C == 2, "fwd_pack_fft_response is stereo-only"
    if not supported(n, T):
        raise ValueError(f"mega_fft: unsupported (n={n}, T={T})")
    n1, n2 = _radix(n)
    Rp, _ = half_grid(n)
    Fp = Rp * n1
    F = n // 2 + 1
    in_rows = T // n2

    dot = _DOTS.get(precision, _DOTS["high"])
    tables = _fwd_tables(n, in_rows, Rp)
    stage_descrs, P_, A_, T_ = _build_stage_inputs(stages, B, n,
                                                   sample_rate, Fp)
    P = [a.reshape(-1, 1, 1).astype(jnp.float32) for a in P_]
    A = [a.reshape(-1, 1, 1).astype(jnp.float32) for a in A_]
    T3 = [a.reshape(a.shape[0], Rp, n1) for a in T_]

    ny = F - 1
    kernel = _make_fwd_resp_kernel(in_rows, n1, n2, Rp, dot, stage_descrs,
                                   len(P), len(A), len(T3),
                                   (ny // n1, ny % n1))

    x4 = x.reshape(B, 2, in_rows, n2)
    t_specs = [pl.BlockSpec(t.shape, lambda b, _nd=t.ndim: (0,) * _nd,
                            memory_space=pltpu.VMEM) for t in tables]
    p_spec = pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    rt_specs = [pl.BlockSpec((a.shape[0], Rp, n1), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM) for a in T3]
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=([pl.BlockSpec((1, 2, in_rows, n2), lambda b: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM)]
                  + t_specs + [p_spec] * (len(P) + len(A)) + rt_specs),
        out_specs=[pl.BlockSpec((1, Rp, n1), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)] * 4,
        out_shape=[jax.ShapeDtypeStruct((B, Rp, n1), jnp.float32)] * 4,
        interpret=interpret,
        **_vmem_params(interpret),
    )(x4, *tables, *P, *A, *T3)
    return outs


@partial(jax.jit, static_argnames=("n", "T", "precision", "interpret",
                                   "rows"))
def inv_unpack_fft(YloR, YloI, YhigR, YhigI, n: int, T: int,
                   precision: str = "high", interpret: bool = False,
                   rows: bool = False):
    """(Ylo, Yhig) half-grid arrays (B, Rp, n1) -> y (B, 2, T) float32,
    the scaled inverse FFT's (L, R) = (re, im) unpacking. Junk lanes
    (bins > n/2 in Ylo, the k=0/Nyquist duplicates in Yhig, pad rows)
    are masked inside the kernel. ``rows=True`` returns the kernel's
    native (B, 2, Tr, n2) hop-blocked form instead — skipping the
    (B, 2, T) flatten retile for consumers that frame by rows
    (frame_signal_rows)."""
    B = YloR.shape[0]
    if not supported(n, T):
        raise ValueError(f"mega_fft: unsupported (n={n}, T={T})")
    n1, n2 = _radix(n)
    Rp, _ = half_grid(n)
    Tr = T // n2

    dot = _DOTS.get(precision, _DOTS["high"])
    tables = _inv_tables(n, Tr, Rp)
    kernel = _make_inv_kernel(n, n1, n2, Rp, Tr, dot)

    Y = (YloR, YloI, YhigR, YhigI)
    t_specs = [pl.BlockSpec(t.shape, lambda b, _nd=t.ndim: (0,) * _nd,
                            memory_space=pltpu.VMEM) for t in tables]
    y = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, Rp, n1), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)] * 4 + t_specs,
        out_specs=pl.BlockSpec((1, 2, Tr, n2), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, Tr, n2), jnp.float32),
        interpret=interpret,
        **_vmem_params(interpret),
    )(*Y, *tables)
    if rows:
        return y
    return y.reshape(B, 2, T)


def packed_lti_apply_mega(
    x: jnp.ndarray,
    stages,  # [(effect, params_dict_of_(B,), active_(B,)_or_None), ...]
    n: int,
    sample_rate: float,
    precision: str = "high",
    interpret: bool = False,
    rows: bool = False,
) -> jnp.ndarray:
    """Full fused-LTI group application: fwd_pack_fft -> fused response
    kernel -> inv_unpack_fft. Drop-in alternative to
    packed_lti_apply_rp (ops/pallas/packed_response.py) with all the
    XLA-level glue (slices, reverses, concats, pads, the output stack)
    removed; the caller guarantees shapes qualify via supported()."""
    from st_ito_tpu.ops.pallas.packed_response import (
        packed_response_apply_rp_padded)

    B, C, T = x.shape
    assert C == 2, "mega path is stereo-only"
    F = n // 2 + 1
    Rp, n1 = half_grid(n)
    Fp = Rp * n1
    if precision == "mixed":
        fwd_prec, inv_prec = "high", "default"
    else:
        fwd_prec = inv_prec = precision

    ZlR, ZlI, ZvR, ZvI = fwd_pack_fft(x, n, precision=fwd_prec,
                                      interpret=interpret)
    YlR, YlI, YvR, YvI = packed_response_apply_rp_padded(
        ZlR, ZlI, ZvR, ZvI, stages, n, sample_rate, F, Fp,
        interpret=interpret)
    return inv_unpack_fft(YlR, YlI, YvR, YvI, n, T, precision=inv_prec,
                          interpret=interpret, rows=rows)


def packed_lti_apply_mega2(
    x: jnp.ndarray,
    stages,  # [(effect, params_dict_of_(B,), active_(B,)_or_None), ...]
    n: int,
    sample_rate: float,
    precision: str = "high",
    interpret: bool = False,
    rows: bool = False,
) -> jnp.ndarray:
    """Two-kernel fused-LTI group: (forward FFT + response) -> inverse FFT.
    Same semantics as packed_lti_apply_mega with the middle kernel's eight
    (B, Rp*n1) float32 HBM round trips deleted (PERF_NOTES "Remaining
    headroom": the full mega fusion)."""
    B, C, T = x.shape
    assert C == 2, "mega path is stereo-only"
    if precision == "mixed":
        fwd_prec, inv_prec = "high", "default"
    else:
        fwd_prec = inv_prec = precision
    YlR, YlI, YvR, YvI = fwd_pack_fft_response(
        x, stages, n, sample_rate, precision=fwd_prec, interpret=interpret)
    return inv_unpack_fft(YlR, YlI, YvR, YvI, n, T, precision=inv_prec,
                          interpret=interpret, rows=rows)
