"""Fused LTI response construction + packed-spectrum application (Pallas).

The generic fused-LTI path (chain/responses.py + ops/mxfft.py) evaluates
each stage's rational response as (B, F) complex64 arrays, composes them,
builds the packed-application coefficients, and applies them — a dozen
materialized ~1 GB intermediates at population 512 / n = 2^19, measured at
~150 ms per generation of pure elementwise/data-movement time on v5e.

This module fuses ALL of that into one Pallas kernel: each (candidate
block, frequency block) grid cell evaluates the stages' responses from a
handful of per-candidate scalars + small frequency tables (real-pair math
from chain/rp_responses.py), composes them, and applies the packed
hermitian formula — reading the packed spectrum once and writing the
result once. HBM traffic drops from ~25 passes of (B, F) complex to
4 reads + 4 writes of (B, F) float32.

Only the stereo packed layout (z = x_L + i x_R) is supported; the mono
pair-packed layout and non-rp-capable stages keep the generic path
(chain/executor.py falls back automatically).

Used by build_batched_render_fn on the ES hot path
(reference bottleneck this replaces: st_ito/style_transfer.py:474-573's
per-candidate serial C++ renders).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

from st_ito_tpu.chain import rp_responses as rp

_BB = 8     # candidates per block (sublane axis)
_LF = 512   # frequency bins per block (lane axis)


def _compose_block(stage_descrs, param_blocks, active_blocks, table_blocks):
    """Shared by the kernel and the pure-jnp reference: evaluate, bypass-
    blend and compose every stage's rp response for one block."""
    kind, H = "scalar", None
    for si, (effect, pnames, tnames, statics) in enumerate(stage_descrs):
        build = rp.RP_BUNDLES[effect][1]
        params = {name: param_blocks[si][name] for name in pnames}
        tables = {name: table_blocks[si][name] for name in tnames}
        tables.update(statics)
        k2, H2 = build(params, tables)
        if active_blocks[si] is not None:
            k2, H2 = rp.rp_bypass(k2, H2, active_blocks[si])
        kind, H = rp.rp_compose(kind, H, k2, H2)
    return kind, H


def _apply_block(kind, H, zr, zi, zrr, zri):
    P, Q, Pc, Qc = rp.rp_packed_coeffs(kind, H)
    return rp.rp_packed_apply(P, Q, Pc, Qc, zr, zi, zrr, zri)


def _make_kernel(stage_descrs, n_params, n_active, n_tables, dc_ny):
    """dc_ny = ((dc_block, dc_lane), (ny_block, ny_lane)): grid positions
    of the DC and Nyquist bins. Per-channel irfft semantics force those
    self-conjugate bins to Re(Y_ch); the packed equivalent is the average
    of the lower-half value and the conjugate-extension value, which is
    exactly Yhig at those bins (Zrev(b) = Z(b) for b in {0, n/2}).
    Without the correction, responses with complex DC/Nyquist values
    (fractional delays) leak the dropped imaginary parts into both
    channels."""
    def kernel(*refs):
        zr_ref, zi_ref, zrr_ref, zri_ref = refs[:4]
        pos = 4
        flat_params = refs[pos:pos + n_params]
        pos += n_params
        flat_active = refs[pos:pos + n_active]
        pos += n_active
        flat_tables = refs[pos:pos + n_tables]
        pos += n_tables
        ylo_r_ref, ylo_i_ref, yhi_r_ref, yhi_i_ref = refs[pos:pos + 4]

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
            kind, H, zr_ref[...], zi_ref[...], zrr_ref[...], zri_ref[...])
        fblk = pl.program_id(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, ylo_r.shape, 1)
        (dcb, dcl), (nyb, nyl) = dc_ny
        sel = (((fblk == dcb) & (lane == dcl))
               | ((fblk == nyb) & (lane == nyl)))
        ylo_r = jnp.where(sel, 0.5 * (ylo_r + yhi_r), ylo_r)
        ylo_i = jnp.where(sel, 0.5 * (ylo_i + yhi_i), ylo_i)
        ylo_r_ref[...] = ylo_r
        ylo_i_ref[...] = ylo_i
        yhi_r_ref[...] = yhi_r
        yhi_i_ref[...] = yhi_i

    return kernel


def _pad_axis(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def packed_response_apply_rp(
    ZrL, ZiL, ZrR, ZiR,
    stage_descrs, param_arrays, active_arrays, table_arrays,
    interpret: bool = False,
):
    """Run the fused kernel on the half-grid spectra.

    ZrL/ZiL: Z on k in [0, n/2] — (B, F) float32.
    ZrR/ZiR: Zrev[k] = Z[(n-k) mod n] on the same range.
    stage_descrs: [(effect, param_names, table_names, statics), ...].
    param_arrays: flat list of (B,) float32 (stage-major, name order).
    active_arrays: flat list of (B,) float32 masks (or empty list).
    table_arrays: flat list of (rows, F) float32 (stage-major, name order).

    Returns (YloR, YloI, YhigR, YhigI), each (B, F):
      Ylo[k]  = Y[k]             for k in [0, n/2]
      Yhig[k] = Y[(n-k) mod n]   (at k in {0, n/2}: the conjugate-
                 extension value, used for the DC/Nyquist correction)
    """
    B, F = ZrL.shape
    Bp = -(-B // _BB) * _BB
    Fp = -(-F // _LF) * _LF

    Z = [_pad_axis(_pad_axis(a, Bp, 0), Fp, 1) for a in (ZrL, ZiL, ZrR, ZiR)]
    P = [_pad_axis(a.reshape(-1, 1).astype(jnp.float32), Bp, 0)
         for a in param_arrays]
    A = [_pad_axis(a.reshape(-1, 1).astype(jnp.float32), Bp, 0)
         for a in active_arrays]
    # pad frequency tables by REPLICATING the last column: padded bins then
    # compute a valid (discarded) response instead of dividing by zero.
    # Dtypes preserved (the delay's integer phase-index table must stay i32)
    T = [jnp.pad(a, ((0, 0), (0, Fp - a.shape[1])), mode="edge")
         if a.shape[1] != Fp else a for a in table_arrays]

    grid = (Bp // _BB, Fp // _LF)
    z_spec = pl.BlockSpec((_BB, _LF), lambda b, f: (b, f),
                          memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((_BB, 1), lambda b, f: (b, 0),
                          memory_space=pltpu.VMEM)
    t_specs = [pl.BlockSpec((a.shape[0], _LF), lambda b, f: (0, f),
                            memory_space=pltpu.VMEM) for a in T]

    dc_ny = ((0, 0), ((F - 1) // _LF, (F - 1) % _LF))
    kernel = _make_kernel(stage_descrs, len(P), len(A), len(T), dc_ny)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[z_spec] * 4 + [p_spec] * (len(P) + len(A)) + t_specs,
        out_specs=[z_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((Bp, Fp), jnp.float32)] * 4,
        interpret=interpret,
    )(*Z, *P, *A, *T)
    return tuple(o[:B, :F] for o in outs)


def _build_stage_inputs(stages, B: int, n: int, sample_rate: float, Fp: int):
    """Shared kernel-input construction: stage descriptors, flat param /
    active-mask / frequency-table arrays (tables built at width Fp)."""
    stage_descrs, param_arrays, active_arrays, table_arrays = [], [], [], []
    any_active = any(a is not None for _, _, a in stages)
    for effect, params, active in stages:
        tables_fn = rp.RP_BUNDLES[effect][0]
        tab = tables_fn(sample_rate, n, Fp)
        statics = {k: v for k, v in tab.items() if not hasattr(v, "shape")}
        arrays = {k: v for k, v in tab.items() if hasattr(v, "shape")}
        pnames = tuple(sorted(params))
        tnames = tuple(sorted(arrays))
        stage_descrs.append((effect, pnames, tnames, statics))
        param_arrays += [jnp.asarray(params[k], jnp.float32) for k in pnames]
        table_arrays += [arrays[k] for k in tnames]
        if any_active:
            mask = (jnp.ones((B,), jnp.float32) if active is None
                    else active.astype(jnp.float32))
            active_arrays.append(mask)
    return stage_descrs, param_arrays, active_arrays, table_arrays


def _make_kernel_3d(stage_descrs, n_params, n_active, n_tables, dc_ny):
    """3-D variant of _make_kernel for the mega FFT path: blocks are
    (candidates, rows, lanes) slabs of the (B, Rp, n1) half-grid layout;
    dc_ny = ((dc_rblk, dc_row, dc_lane), (ny_rblk, ny_row, ny_lane)) with
    rblk the grid position along the row axis. Same DC/Nyquist semantics
    as _make_kernel (see its docstring)."""
    def kernel(*refs):
        zr_ref, zi_ref, zrr_ref, zri_ref = refs[:4]
        pos = 4
        flat_params = refs[pos:pos + n_params]
        pos += n_params
        flat_active = refs[pos:pos + n_active]
        pos += n_active
        flat_tables = refs[pos:pos + n_tables]
        pos += n_tables
        ylo_r_ref, ylo_i_ref, yhi_r_ref, yhi_i_ref = refs[pos:pos + 4]

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
            kind, H, zr_ref[...], zi_ref[...], zrr_ref[...], zri_ref[...])
        rblk = pl.program_id(1)
        row = jax.lax.broadcasted_iota(jnp.int32, ylo_r.shape, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, ylo_r.shape, 2)
        (dcb, dcr, dcl), (nyb, nyr, nyl) = dc_ny
        sel = (((rblk == dcb) & (row == dcr) & (lane == dcl))
               | ((rblk == nyb) & (row == nyr) & (lane == nyl)))
        ylo_r = jnp.where(sel, 0.5 * (ylo_r + yhi_r), ylo_r)
        ylo_i = jnp.where(sel, 0.5 * (ylo_i + yhi_i), ylo_i)
        ylo_r_ref[...] = ylo_r
        ylo_i_ref[...] = ylo_i
        yhi_r_ref[...] = yhi_r
        yhi_i_ref[...] = yhi_i

    return kernel


_RB = 8  # half-grid rows per block in the 3-D (mega) layout


def packed_response_apply_rp_padded(
    ZrL, ZiL, ZrR, ZiR,
    stages,  # [(effect, params_dict_of_(B,), active_(B,)_or_None), ...]
    n: int,
    sample_rate: float,
    F: int,
    Fp: int,
    interpret: bool = False,
):
    """3-D variant for the mega FFT path (ops/pallas/mega_fft.py): the
    four spectra arrive (B, Rp, n1) — the natural tiled half grid with
    bin k at (k // n1, k % n1) and bins beyond F holding discardable
    junk. No padding, slicing, table edge-replication or flat reshapes
    happen here (that XLA retile glue is exactly what the mega kernels
    delete; Fp = Rp * n1 must match). B must be a multiple of the
    candidate block and Rp of the row block. Returns
    (YloR, YloI, YhigR, YhigI) in the same (B, Rp, n1) layout."""
    B, Rp, n1 = ZrL.shape
    assert Rp * n1 == Fp and B % _BB == 0 and Rp % _RB == 0, (
        ZrL.shape, Fp, B)
    stage_descrs, P_, A_, T_ = _build_stage_inputs(stages, B, n,
                                                   sample_rate, Fp)
    P = [a.reshape(-1, 1, 1).astype(jnp.float32) for a in P_]
    A = [a.reshape(-1, 1, 1).astype(jnp.float32) for a in A_]
    # frequency tables keep their leading semantic dim and tile to the
    # same (rows, Rp, n1) half grid (traced, loop-invariant -> computed
    # once per ES block directly in this layout)
    T3 = [a.reshape(a.shape[0], Rp, n1) for a in T_]

    grid = (B // _BB, Rp // _RB)
    z_spec = pl.BlockSpec((_BB, _RB, n1), lambda b, r: (b, r, 0),
                          memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((_BB, 1, 1), lambda b, r: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    t_specs = [pl.BlockSpec((a.shape[0], _RB, n1), lambda b, r: (0, r, 0),
                            memory_space=pltpu.VMEM) for a in T3]

    ny = F - 1
    dc_ny = ((0, 0, 0),
             (ny // n1 // _RB, (ny // n1) % _RB, ny % n1))
    kernel = _make_kernel_3d(stage_descrs, len(P), len(A), len(T3), dc_ny)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[z_spec] * 4 + [p_spec] * (len(P) + len(A)) + t_specs,
        out_specs=[z_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((B, Rp, n1), jnp.float32)] * 4,
        interpret=interpret,
    )(ZrL, ZiL, ZrR, ZiR, *P, *A, *T3)


def packed_lti_apply_rp(
    x: jnp.ndarray,
    stages,  # [(effect, params_dict_of_(B,), active_(B,)_or_None), ...]
    n: int,
    sample_rate: float,
    precision: str = "high",
    interpret: bool = False,
    fft_impl: str = "mx",
) -> jnp.ndarray:
    """Full fused-LTI group application for a stereo population: packed
    forward FFT -> fused response kernel -> inverse FFT. Drop-in
    replacement for ops/mxfft.packed_lti_apply when every stage in the
    group is rp-capable (chain/executor.py decides).

    ``fft_impl="fused"`` (legacy alias "mx3") routes both transforms
    through the fused two-stage Pallas kernel (ops/pallas/fused_fft.py)
    when the shapes qualify (power-of-two n with full-lane stage dims and
    T a multiple of n2); falls back to the jnp four-step (ops/mxfft.py)
    otherwise."""
    from st_ito_tpu.ops.mxfft import _PRECISIONS, fft_mx  # noqa: F401

    if precision == "mixed":
        fwd_prec, inv_prec = "high", "default"
    else:
        fwd_prec = inv_prec = precision
    B, C, T = x.shape
    assert C == 2, "fused rp path is stereo-only"
    F = n // 2 + 1
    Fp = -(-F // _LF) * _LF

    fwd_fft = inv_fft = fft_mx
    if fft_impl in ("fused", "mx3"):
        from st_ito_tpu.ops.pallas import fused_fft

        if fused_fft.supported(n, T):
            fwd_fft = inv_fft = partial(fused_fft.fft_fused,
                                        interpret=interpret)

    Zr, Zi = fwd_fft(x[:, 0, :], x[:, 1, :], sign=-1, precision=fwd_prec, n=n)
    ZrL, ZiL = Zr[:, :F], Zi[:, :F]
    # Zrev[k] = Z[(n-k) mod n] for k in [0, n/2]: [Z0, Z_{n-1}, .., Z_{n/2}]
    ZrR = jnp.concatenate([Zr[:, :1], jnp.flip(Zr[:, n // 2:], -1)], -1)
    ZiR = jnp.concatenate([Zi[:, :1], jnp.flip(Zi[:, n // 2:], -1)], -1)

    stage_descrs, param_arrays, active_arrays, table_arrays = (
        _build_stage_inputs(stages, B, n, sample_rate, Fp))

    YloR, YloI, YhiR, YhiI = packed_response_apply_rp(
        ZrL, ZiL, ZrR, ZiR, stage_descrs, param_arrays, active_arrays,
        table_arrays, interpret=interpret)

    # Ylo arrives with the DC/Nyquist correction already applied inside
    # the kernel (see _make_kernel) — keep the 2-piece aligned concat
    # (host-side column surgery here measured ~150-300 ms/gen in TPU
    # relayout/copy passes at pop 512).
    Yr = jnp.concatenate([YloR, jnp.flip(YhiR[:, 1:n // 2], -1)], -1)
    Yi = jnp.concatenate([YloI, jnp.flip(YhiI[:, 1:n // 2], -1)], -1)
    yr, yi = inv_fft(Yr, Yi, sign=1, precision=inv_prec, n=n,
                     out_len=T)
    scale = 1.0 / n
    return jnp.stack([yr * scale, yi * scale], axis=1)


def packed_response_apply_rp_reference(
    ZrL, ZiL, ZrR, ZiR,
    stage_descrs, param_arrays, active_arrays, table_arrays,
    nyq_bin: int | None = None,
):
    """Pure-jnp execution of the identical rp math on the full half grid —
    the correctness oracle for the kernel (and a debugging aid).

    ``nyq_bin``: global index of the Nyquist bin (the kernel derives it
    from the unpadded F); when given, the DC/Nyquist irfft-semantics
    correction is applied exactly as in the kernel."""
    param_blocks, active_blocks, table_blocks = [], [], []
    pi = ai = ti = 0
    for effect, pnames, tnames, statics in stage_descrs:
        param_blocks.append(
            {name: param_arrays[pi + j].reshape(-1, 1)
             for j, name in enumerate(pnames)})
        pi += len(pnames)
        if active_arrays:
            active_blocks.append(active_arrays[ai].reshape(-1, 1))
            ai += 1
        else:
            active_blocks.append(None)
        table_blocks.append(
            {name: table_arrays[ti + j] for j, name in enumerate(tnames)})
        ti += len(tnames)
    kind, H = _compose_block(stage_descrs, param_blocks, active_blocks,
                             table_blocks)
    ylo_r, ylo_i, yhi_r, yhi_i = _apply_block(kind, H, ZrL, ZiL, ZrR, ZiR)
    if nyq_bin is not None:
        idx = jnp.arange(ylo_r.shape[-1])[None, :]
        sel = (idx == 0) | (idx == nyq_bin)
        ylo_r = jnp.where(sel, 0.5 * (ylo_r + yhi_r), ylo_r)
        ylo_i = jnp.where(sel, 0.5 * (ylo_i + yhi_i), ylo_i)
    return ylo_r, ylo_i, yhi_r, yhi_i
