"""Pallas kernels for first-order recurrences along time.

Why: jax.lax.associative_scan is O(T log T) with ~log2(T) full HBM round
trips of the (coeff, drive[, min]) element tuples — for the compressor
ballistics at (pop=256, ch=2, T=262144) that is tens of GB of traffic. A
TPU recurrence is cheap if the *parallel* axis fills the VPU: lay the
independent recurrences (population x channels) across an (8, 128) tile and
step T sequentially in VMEM. One HBM pass, O(T) work.

Layout: inputs are transposed to (T, lead) then viewed as (T, G, 8, 128)
with G = lead/1024 groups. The grid is (G, T_blocks); the carry lives in a
VMEM scratch that persists across the sequential T-block iterations
(grid iteration is minor-to-major, so T_blocks is the fastest axis).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

_LANE = 128
_SUBLANE = 8
_TILE = _LANE * _SUBLANE  # 1024 parallel recurrences per grid row


def pallas_scan_available() -> bool:
    return _HAS_PALLAS and jax.default_backend() == "tpu"


_MAX_SCAN_HBM_BYTES = 6 << 30  # (T, lead_pad) f32 in+out pair budget


def pallas_scan_profitable(lead: int, T: int) -> bool:
    """Always True since segment-chunked execution landed: when the fat
    (T, lead_pad) layout would dominate HBM (the 1024-lane tile pads a
    small population on a very long signal up to 16x — observed 2 x 11 GB
    buffers for a 60 s chunked render at population microbatch 32),
    _run_scan now splits T into bounded segments threaded through explicit
    carry I/O instead of falling back to the associative-scan form (whose
    log2(T)-stage unrolled HLO took >23 min to compile at minutes-long T).
    Kept for API stability; callers may treat it as an availability
    check."""
    del lead, T
    return True


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------


def _ballistics_kernel(c_ref, aa_ref, ar_ref, out_ref, carry):
    """Decoupled detector over one (T_blk, 8, 128) block.

    carry: (2, 8, 128) scratch = (y1, g) persisted across T blocks
    (initialized by the _run_scan wrapper at the first T block).
    """
    aa = aa_ref[0]
    ar = ar_ref[0]
    T_blk = c_ref.shape[0]

    def body(t, state):
        y1, g = state
        c = c_ref[t]
        y1 = jnp.minimum(c, ar * y1 + (1.0 - ar) * c)
        g = aa * g + (1.0 - aa) * y1
        out_ref[t] = g
        return (y1, g)

    y1, g = jax.lax.fori_loop(0, T_blk, body, (carry[0], carry[1]))
    carry[0] = y1
    carry[1] = g


def _make_biquad_cascade_kernel(num_sections: int, with_active: bool = False):
    """Kernel factory: ``num_sections`` exact TDF-II biquads in series over
    one (T_blk, 8, 128) block; 2 carried states per section.

    Replaces the EQ's FFT application on the ES hot path: a 2^19-point
    batched FFT pair costs ~180 ms on v5e while this kernel streams the
    block once through VMEM (~10 ms) and is bit-faithful to scipy lfilter.

    ``with_active``: one extra per-lane vec ref (1.0 = effect on); the
    bypass blend out = act*y + (1-act)*x happens at write time with the
    input already in registers — the executor-level jnp.where select was
    a full extra HBM round trip of the population signal.
    """
    n_vec = 5 * num_sections + (1 if with_active else 0)

    def kernel(x_ref, *rest):
        # rest = coefficient refs (+ active ref), out_ref, carry
        coeff_refs = rest[:5 * num_sections]
        act = rest[5 * num_sections][0] if with_active else None
        out_ref = rest[n_vec]
        carry = rest[n_vec + 1]

        coeffs = [coeff_refs[i][0] for i in range(5 * num_sections)]
        T_blk = x_ref.shape[0]

        def body(t, states):
            xin = x_ref[t]
            v = xin
            new_states = []
            for s in range(num_sections):
                b0, b1, b2, a1, a2 = coeffs[5 * s:5 * s + 5]
                s1, s2 = states[2 * s], states[2 * s + 1]
                y = b0 * v + s1
                new_states.append(b1 * v - a1 * y + s2)
                new_states.append(b2 * v - a2 * y)
                v = y
            if with_active:
                v = act * v + (1.0 - act) * xin
            out_ref[t] = v
            return tuple(new_states)

        init = tuple(carry[i] for i in range(2 * num_sections))
        final = jax.lax.fori_loop(0, T_blk, body, init)
        for i in range(2 * num_sections):
            carry[i] = final[i]

    return kernel


def biquad_cascade_pallas(
    x: jnp.ndarray,
    b: jnp.ndarray,
    a: jnp.ndarray,
    t_block: int = 512,
    interpret: bool = False,
    active=None,
) -> jnp.ndarray:
    """Exact serial biquad cascade over the last axis, parallel over leading
    dims. x: (..., T); b, a: (..., S, 3) with a0 = 1 (broadcast against x's
    leading dims). ``active``: optional per-item float mask broadcastable
    to the leading dims (1.0 = filter on, 0.0 = bypass), blended in-kernel."""
    lead_shape = x.shape[:-1]
    T = x.shape[-1]
    lead = int(np.prod(lead_shape)) if lead_shape else 1
    S = b.shape[-2]

    b = jnp.broadcast_to(b, lead_shape + b.shape[-2:]).reshape(lead, S, 3)
    a = jnp.broadcast_to(a, lead_shape + a.shape[-2:]).reshape(lead, S, 3)
    vec = []
    for s in range(S):
        vec.extend([b[:, s, 0], b[:, s, 1], b[:, s, 2], a[:, s, 1], a[:, s, 2]])
    if active is not None:
        act = jnp.broadcast_to(
            jnp.asarray(active, jnp.float32), lead_shape).reshape(lead)
        vec.append(act)

    out = _run_scan(
        _make_biquad_cascade_kernel(S, with_active=active is not None),
        [x.reshape(lead, T).astype(jnp.float32)],
        vec, T, lead, t_block, interpret,
        carry_shape=(2 * S, _SUBLANE, _LANE),
    )
    return out.reshape(*lead_shape, T).astype(x.dtype)


_LN10_OVER_20 = float(np.log(10.0) / 20.0)


def _make_eq_comp_kernel(num_sections: int, eq_active: bool,
                         comp_active: bool, with_dist: bool = False,
                         dist_active: bool = False):
    """Kernel factory: biquad-cascade EQ followed by the fully fused
    feed-forward compressor (and optionally the tanh distortion) in ONE
    Pallas pass over one (T_blk, 8, 128) block.

    Why fused: on the basic chain (EQ -> compressor -> distortion,
    reference: scripts/run_optim.py:375-407) the stages are adjacent; run
    separately each pays a (lead, T) <-> (T, G, 8, 128) relayout pair plus
    a full HBM round trip of the (pop, ch, T) signal for the intermediate.
    Fusing keeps the EQ output in VMEM and feeds the compressor (and the
    elementwise distortion) directly — three dispatches and ~4 GB/gen of
    traffic become one dispatch at pop 512 / T 262144.

    vec refs, in order: 5*S biquad coeffs, [eq_act], th, slope, knee,
    aa, ar, mk, [comp_act], [drive, outg, [dist_act]]. carry:
    (2*S + 2, 8, 128) = biquad states + (y1, g) detector state. One extra
    (T_blk, 8, 128) VMEM scratch holds the gain curve (out_ref holds the
    EQ output the final apply needs).
    """
    n_eq = 5 * num_sections + (1 if eq_active else 0)
    n_comp = 6 + (1 if comp_active else 0)
    n_vec = n_eq + n_comp + (
        (2 + (1 if dist_active else 0)) if with_dist else 0)

    def kernel(x_ref, *rest):
        coeff_refs = rest[:5 * num_sections]
        eq_act = rest[5 * num_sections][0] if eq_active else None
        th, slope, knee, aa, ar, mk = (rest[n_eq + i][0] for i in range(6))
        comp_act = rest[n_eq + 6][0] if comp_active else None
        if with_dist:
            base = n_eq + n_comp
            drive = rest[base][0]
            outg = rest[base + 1][0]
            dist_act = rest[base + 2][0] if dist_active else None
        out_ref = rest[n_vec]
        carry = rest[n_vec + 1]
        gbuf = rest[n_vec + 2]

        coeffs = [coeff_refs[i][0] for i in range(5 * num_sections)]
        T_blk = x_ref.shape[0]

        # ---- EQ: serial biquad cascade, blended output lands in out_ref
        def eq_body(t, states):
            xin = x_ref[t]
            v = xin
            new_states = []
            for s in range(num_sections):
                b0, b1, b2, a1, a2 = coeffs[5 * s:5 * s + 5]
                s1, s2 = states[2 * s], states[2 * s + 1]
                y = b0 * v + s1
                new_states.append(b1 * v - a1 * y + s2)
                new_states.append(b2 * v - a2 * y)
                v = y
            if eq_active:
                v = eq_act * v + (1.0 - eq_act) * xin
            out_ref[t] = v
            return tuple(new_states)

        init = tuple(carry[i] for i in range(2 * num_sections))
        final = jax.lax.fori_loop(0, T_blk, eq_body, init)
        for i in range(2 * num_sections):
            carry[i] = final[i]

        # ---- compressor on the EQ output: vectorized gain computer,
        # sequential ballistics, vectorized apply (same structure as
        # _make_compressor_kernel — transcendentals stay out of the loop)
        xb = out_ref[:]
        env_db = jnp.log(jnp.maximum(jnp.abs(xb), 1e-8)) * (
            20.0 / np.log(10.0))
        over = env_db - th
        knee_region = slope * (over + knee / 2.0) ** 2 / (2.0 * knee)
        gbuf[:] = jnp.where(
            2.0 * over < -knee,
            jnp.zeros_like(over),
            jnp.where(2.0 * over > knee, slope * over, knee_region),
        )

        def comp_body(t, state):
            y1, g = state
            c = gbuf[t]
            y1 = jnp.minimum(c, ar * y1 + (1.0 - ar) * c)
            g = aa * g + (1.0 - aa) * y1
            gbuf[t] = g
            return (y1, g)

        y1, g = jax.lax.fori_loop(
            0, T_blk, comp_body,
            (carry[2 * num_sections], carry[2 * num_sections + 1]))
        carry[2 * num_sections] = y1
        carry[2 * num_sections + 1] = g

        y = xb * jnp.exp(gbuf[:] * _LN10_OVER_20) * mk
        if comp_active:
            y = comp_act * y + (1.0 - comp_act) * xb
        if with_dist:
            yd = jnp.tanh(y * drive) * outg
            if dist_active:
                y = dist_act * yd + (1.0 - dist_act) * y
            else:
                y = yd
        out_ref[:] = y

    return kernel


def eq_compressor_fused_pallas(
    x: jnp.ndarray,
    b: jnp.ndarray,
    a: jnp.ndarray,
    threshold_db,
    ratio,
    knee_db,
    alpha_attack,
    alpha_release,
    makeup_gain_db=0.0,
    eq_active=None,
    comp_active=None,
    drive_db=None,
    dist_gain_db=0.0,
    dist_active=None,
    t_block: int = 512,
    interpret: bool = False,
    shared_lead_shape: tuple | None = None,
    compact_out: bool = True,
) -> jnp.ndarray:
    """Biquad-cascade EQ immediately followed by the unlinked feed-forward
    compressor (and, when ``drive_db`` is given, the tanh distortion with
    its output gain), as ONE Pallas pass. x: (..., T); b, a: (..., S, 3)
    with a0 = 1; compressor/distortion params broadcastable to x's leading
    dims. eq_active / comp_active / dist_active: optional per-item float
    bypass masks (1.0 = effect on), each blended in-kernel at its stage
    boundary — identical semantics to running biquad_cascade_pallas,
    compressor_fused_pallas, then tanh(y*drive)*outg with the respective
    masks.

    ``shared_lead_shape=(B, C)``: x is the population-shared (C, T)
    input; the broadcast to (B, C, T) never materializes (the lane
    pattern streams into the kernel instead — see _run_scan shared_seq).
    Result is (B, C, T)."""
    if shared_lead_shape is not None:
        lead_shape = tuple(shared_lead_shape)
        assert x.ndim == 2 and x.shape[0] == lead_shape[-1], (
            x.shape, lead_shape)
    else:
        lead_shape = x.shape[:-1]
    T = x.shape[-1]
    lead = int(np.prod(lead_shape)) if lead_shape else 1
    S = b.shape[-2]

    b = jnp.broadcast_to(b, lead_shape + b.shape[-2:]).reshape(lead, S, 3)
    a = jnp.broadcast_to(a, lead_shape + a.shape[-2:]).reshape(lead, S, 3)

    def vec(v):
        return jnp.broadcast_to(
            jnp.asarray(v, jnp.float32), lead_shape).reshape(lead)

    vecs = []
    for s in range(S):
        vecs.extend([b[:, s, 0], b[:, s, 1], b[:, s, 2],
                     a[:, s, 1], a[:, s, 2]])
    if eq_active is not None:
        vecs.append(vec(eq_active))
    vecs.extend([
        vec(threshold_db),
        vec(1.0 / jnp.asarray(ratio, jnp.float32) - 1.0),
        vec(jnp.maximum(jnp.asarray(knee_db, jnp.float32), 1e-3)),
        vec(alpha_attack),
        vec(alpha_release),
        vec(10.0 ** (jnp.asarray(makeup_gain_db, jnp.float32) / 20.0)),
    ])
    if comp_active is not None:
        vecs.append(vec(comp_active))
    with_dist = drive_db is not None
    if with_dist:
        vecs.append(vec(10.0 ** (jnp.asarray(drive_db, jnp.float32) / 20.0)))
        vecs.append(vec(10.0 ** (jnp.asarray(dist_gain_db,
                                             jnp.float32) / 20.0)))
        if dist_active is not None:
            vecs.append(vec(dist_active))

    out = _run_scan(
        _make_eq_comp_kernel(S, eq_active is not None,
                             comp_active is not None,
                             with_dist=with_dist,
                             dist_active=dist_active is not None),
        [x.astype(jnp.float32) if shared_lead_shape is not None
         else x.reshape(lead, T).astype(jnp.float32)],
        vecs, T, lead, t_block, interpret,
        shared_seq=shared_lead_shape is not None,
        carry_shape=(2 * S + 2, _SUBLANE, _LANE),
        # this kernel's buffers (in/out double-buffered blocks + gain
        # scratch + ~35 vec refs) exceed the default 16 MB scoped-vmem
        # limit at t_block 512 (measured 17.9 MB); v5e has 128 MB physical.
        # Only this kernel needs the raise — the other _run_scan users fit.
        vmem_limit_mb=64,
        gain_scratch=True,
        compact_out=compact_out,
    )
    return out.reshape(*lead_shape, T).astype(x.dtype)


def _make_compressor_kernel(with_active: bool = False):
    """Fully fused feed-forward compressor over one (T_blk, 8, 128) block:
    |x| -> dB -> soft-knee gain computer -> decoupled ballistics -> linear
    gain -> apply. The unfused XLA form costs ~5 extra HBM round trips of
    the (pop, ch, T) signal (abs/log/gain-computer/exp/multiply passes) plus
    transcendental passes — all of it rides along with the recurrence here.

    carry: (2, 8, 128) = (y1, g) detector state. ``with_active``: one
    extra per-lane vec ref; the bypass blend happens at write time (the
    executor-level select was a full extra HBM pass).
    """
    def kernel(x_ref, th_ref, slope_ref, knee_ref, aa_ref, ar_ref,
               mk_ref, *rest):
        act = rest[0][0] if with_active else None
        out_ref = rest[1 if with_active else 0]
        carry = rest[2 if with_active else 1]

        th = th_ref[0]
        slope = slope_ref[0]  # 1/ratio - 1
        knee = knee_ref[0]    # max(knee_db, 1e-3)
        aa = aa_ref[0]
        ar = ar_ref[0]
        mk = mk_ref[0]        # linear makeup gain
        T_blk = x_ref.shape[0]

        # transcendentals VECTORIZED over the whole block (putting them
        # inside the sequential loop serializes them on the VPU — measured
        # slower than the unfused form); only the 2-op recurrence runs per
        # step, reading and rewriting out_ref in place as the gr -> g
        # scratch.
        xb = x_ref[:]
        env_db = jnp.log(jnp.maximum(jnp.abs(xb), 1e-8)) * (
            20.0 / np.log(10.0))
        over = env_db - th
        knee_region = slope * (over + knee / 2.0) ** 2 / (2.0 * knee)
        out_ref[:] = jnp.where(
            2.0 * over < -knee,
            jnp.zeros_like(over),
            jnp.where(2.0 * over > knee, slope * over, knee_region),
        )

        def body(t, state):
            y1, g = state
            c = out_ref[t]
            y1 = jnp.minimum(c, ar * y1 + (1.0 - ar) * c)
            g = aa * g + (1.0 - aa) * y1
            out_ref[t] = g
            return (y1, g)

        y1, g = jax.lax.fori_loop(0, T_blk, body, (carry[0], carry[1]))
        carry[0] = y1
        carry[1] = g

        y = xb * jnp.exp(out_ref[:] * _LN10_OVER_20) * mk
        if with_active:
            y = act * y + (1.0 - act) * xb
        out_ref[:] = y

    return kernel


def compressor_fused_pallas(
    x: jnp.ndarray,
    threshold_db,
    ratio,
    knee_db,
    alpha_attack,
    alpha_release,
    makeup_gain_db=0.0,
    t_block: int = 512,
    interpret: bool = False,
    active=None,
) -> jnp.ndarray:
    """Whole unlinked compressor as one Pallas pass. x: (..., T); params
    broadcastable to x's leading dims. ``active``: optional per-item float
    mask (1.0 = effect on), blended in-kernel."""
    lead_shape = x.shape[:-1]
    T = x.shape[-1]
    lead = int(np.prod(lead_shape)) if lead_shape else 1

    def vec(v):
        return jnp.broadcast_to(
            jnp.asarray(v, jnp.float32), lead_shape).reshape(lead)

    th = vec(threshold_db)
    slope = vec(1.0 / jnp.asarray(ratio, jnp.float32) - 1.0)
    knee = vec(jnp.maximum(jnp.asarray(knee_db, jnp.float32), 1e-3))
    aa = vec(alpha_attack)
    ar = vec(alpha_release)
    mk = vec(10.0 ** (jnp.asarray(makeup_gain_db, jnp.float32) / 20.0))
    vecs = [th, slope, knee, aa, ar, mk]
    if active is not None:
        vecs.append(vec(active))

    out = _run_scan(
        _make_compressor_kernel(with_active=active is not None),
        [x.reshape(lead, T).astype(jnp.float32)],
        vecs,
        T, lead, t_block, interpret,
    )
    return out.reshape(*lead_shape, T).astype(x.dtype)


def _linrec_kernel(a_ref, b_ref, out_ref, carry):
    """y[t] = a[t]*y[t-1] + b[t] over one (T_blk, 8, 128) block."""
    T_blk = a_ref.shape[0]

    def body(t, y):
        y = a_ref[t] * y + b_ref[t]
        out_ref[t] = y
        return y

    carry[0] = jax.lax.fori_loop(0, T_blk, body, carry[0])


# --------------------------------------------------------------------------
# host-side wrappers
# --------------------------------------------------------------------------


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


_SEG_TARGET_BYTES = 1 << 30  # fat (T_seg, lead_pad) in+out pair per segment


def _transpose_emit(blk, out_ref, t_block):
    """Write the (t_block, 8, 128) VMEM block into a (1024, t_block)
    compact-layout out block: outT[s*128+l, t] = blk[t, s, l].

    Mosaic has no vector transpose, and the XLA-level alternative — the
    (T, lead_pad) -> (lead, T) relayout of the whole population signal
    after the kernel — profiled at ~13 ms/gen on the ES hot path
    (PERF_NOTES "Remaining headroom"). Instead the transpose runs on the
    otherwise-idle MXU as dn=((0,),(0,)) contractions against an exact
    bf16 identity: dot_general(x (t,128), I (t,t)) = x^T with exactly
    one nonzero product per output element. A 3-way bf16 split of x
    (hi/lo/lolo, ~24 mantissa bits, each summand exact against I) keeps
    the result f32-faithful; the three (128,t)x(t,t) passes per sublane
    cost ~0.4 ms/gen of MXU time at pop 512 / T 2^18."""
    r = jax.lax.broadcasted_iota(jnp.int32, (t_block, t_block), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (t_block, t_block), 1)
    eye = jnp.where(r == c, 1.0, 0.0).astype(jnp.bfloat16)
    dn = (((0,), (0,)), ((), ()))
    for s in range(_SUBLANE):
        x = blk[:, s, :]                       # (t_block, 128) f32
        hi = x.astype(jnp.bfloat16)
        r1 = x - hi.astype(jnp.float32)
        lo = r1.astype(jnp.bfloat16)
        ll = (r1 - lo.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = None
        for part in (hi, lo, ll):
            d = jax.lax.dot_general(part, eye, dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        out_ref[s * _LANE:(s + 1) * _LANE, :] = acc


def _scan_call(kernel, seq, seq_specs, vec, T_seg, t_block, G, carry_shape,
               gain_scratch, vmem_limit_mb, interpret, shared_seq,
               carry_in=None, compact_out=False):
    """One pallas_call over (G, T_seg // t_block) blocks. seq/vec arrive in
    final (fat-block / lane-pattern / vec) array form with their specs.

    ``carry_in`` (G, nstate, 8, 128) switches the carry to explicit I/O:
    the wrapper seeds the VMEM carry from it at the first T block and
    emits the final state as a second output — the segment-chunked
    execution path threads it through lax.scan. Without it the carry is
    zero-initialized scratch (single-call path, original behavior).

    ``compact_out``: the kernel writes its (t_block, 8, 128) block into a
    VMEM scratch and _transpose_emit lands it in a (lead_pad, T_seg)
    output directly — no XLA relayout pass downstream."""
    nstate = carry_shape[0]
    n_seq = len(seq)
    n_vec = len(vec)
    with_cio = carry_in is not None
    Tb = T_seg // t_block
    lead_pad = G * _TILE

    vec_spec = pl.BlockSpec(
        (1, 1, _SUBLANE, _LANE),
        lambda g, t: (0, g, 0, 0),
        memory_space=pltpu.VMEM,
    )
    if compact_out:
        out_spec = pl.BlockSpec(
            (_TILE, t_block),
            lambda g, t: (g, t),
            memory_space=pltpu.VMEM,
        )
    else:
        out_spec = pl.BlockSpec(
            (t_block, 1, _SUBLANE, _LANE),
            lambda g, t: (t, g, 0, 0),
            memory_space=pltpu.VMEM,
        )
    cio_spec = pl.BlockSpec(
        (1, nstate, _SUBLANE, _LANE),
        lambda g, t: (g, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )

    def kernel_wrap(*refs):
        ins = refs[:n_seq + n_vec]
        pos = n_seq + n_vec
        cin_ref = refs[pos] if with_cio else None
        pos += 1 if with_cio else 0
        out_ref = refs[pos]
        pos += 1
        cout_ref = refs[pos] if with_cio else None
        pos += 1 if with_cio else 0
        carry = refs[pos]
        pos += 1
        gbuf = refs[pos] if gain_scratch else None
        pos += 1 if gain_scratch else 0
        oblk = refs[pos] if compact_out else None

        t_idx = pl.program_id(1)

        @pl.when(t_idx == 0)
        def _():
            for i in range(nstate):
                if with_cio:
                    carry[i] = cin_ref[0, i]
                else:
                    carry[i] = jnp.zeros(carry.shape[1:], carry.dtype)

        # drop the singleton G axis from each block view
        class _View:
            def __init__(self, ref):
                self._ref = ref
                self.shape = (ref.shape[0],) + ref.shape[2:]

            def __getitem__(self, t):
                return self._ref[t, 0]

            def __setitem__(self, t, v):
                self._ref[t, 0] = v

        class _SharedView:
            """(t_block, 128) lane pattern -> per-t (8, 128) sublane splat."""
            def __init__(self, ref):
                self._ref = ref
                self.shape = (ref.shape[0], _SUBLANE, _LANE)

            def __getitem__(self, t):
                return jnp.broadcast_to(self._ref[t][None, :],
                                        (_SUBLANE, _LANE))

        if shared_seq:
            views = [_SharedView(ins[0])] + [_View(r) for r in ins[1:]]
        else:
            views = [_View(r) for r in ins]

        class _FlatView:
            """compact_out: the kernel's working block is the oblk VMEM
            scratch (same (t_block, 8, 128) view it always wrote); the
            real out block gets the MXU-transposed copy afterwards."""
            def __init__(self, ref):
                self._ref = ref
                self.shape = ref.shape

            def __getitem__(self, t):
                return self._ref[t]

            def __setitem__(self, t, v):
                self._ref[t] = v

        out_view = _FlatView(oblk) if compact_out else _View(out_ref)
        if gain_scratch:
            kernel(*views, out_view, carry, gbuf)
        else:
            kernel(*views, out_view, carry)
        if compact_out:
            _transpose_emit(oblk[...], out_ref, t_block)

        if with_cio:
            @pl.when(t_idx == Tb - 1)
            def _():
                for i in range(nstate):
                    cout_ref[0, i] = carry[i]

    kwargs = {}
    if not interpret and vmem_limit_mb is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024)
    if compact_out:
        out_shapes = [jax.ShapeDtypeStruct((G * _TILE, T_seg), jnp.float32)]
    else:
        out_shapes = [jax.ShapeDtypeStruct((T_seg, G, _SUBLANE, _LANE),
                                           jnp.float32)]
    out_specs = [out_spec]
    if with_cio:
        out_shapes.append(jax.ShapeDtypeStruct((G, nstate, _SUBLANE, _LANE),
                                               jnp.float32))
        out_specs.append(cio_spec)
    outs = pl.pallas_call(
        kernel_wrap,
        grid=(G, Tb),
        in_specs=(list(seq_specs) + [vec_spec] * n_vec
                  + ([cio_spec] if with_cio else [])),
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=(
            [pltpu.VMEM(carry_shape, jnp.float32)]
            + ([pltpu.VMEM((t_block, _SUBLANE, _LANE), jnp.float32)]
               if gain_scratch else [])
            + ([pltpu.VMEM((t_block, _SUBLANE, _LANE), jnp.float32)]
               if compact_out else [])),
        interpret=interpret,
        **kwargs,
    )(*seq, *vec, *([carry_in] if with_cio else []))
    if with_cio:
        return outs[0], outs[1]
    return outs[0], None


def _run_scan(kernel, seq_inputs, vec_inputs, T, lead, t_block, interpret,
              carry_shape=(2, _SUBLANE, _LANE), gain_scratch=False,
              vmem_limit_mb=None, shared_seq=False, compact_out=False):
    """seq_inputs: list of (lead, T) arrays; vec_inputs: list of (lead,)
    arrays broadcast per recurrence. Returns (lead, T).

    ``shared_seq``: seq_inputs is ONE (C, T) array shared by every lead
    slot with channel = lead % C (the layout of reshape((B, C)) leads).
    Instead of materializing + relayouting the (lead, T) broadcast
    (~2-3 GB of HBM traffic per generation on the ES hot path), a tiny
    (T, 128) lane pattern is streamed and broadcast across sublanes
    in-kernel. Requires 128 % C == 0 and a kernel that reads its input
    item-wise (x_ref[t]) only.

    Long signals run SEGMENT-CHUNKED automatically: when the fat
    (T, lead_pad) in+out layouts would exceed _MAX_SCAN_HBM_BYTES, T is
    split into ~_SEG_TARGET_BYTES segments executed by ONE compiled
    pallas_call inside a lax.scan that threads the carry state through
    explicit kernel I/O. Peak memory stays bounded by the segment size
    (the compact (lead, T) forms are all that persists), and the
    compiled program is segment-sized — this replaces the old
    pallas_scan_profitable -> associative-scan fallback, whose
    log2(T)-stage unrolled HLO at minutes-long T was measured to take
    >23 min to compile on the relay compile service."""
    G = -(-lead // _TILE)
    lead_pad = G * _TILE
    Tb = -(-T // t_block)
    T_pad = Tb * t_block

    vec = [
        _pad_to(v, lead_pad, 0).reshape(1, G, _SUBLANE, _LANE)
        for v in vec_inputs
    ]
    seq_spec = pl.BlockSpec(
        (t_block, 1, _SUBLANE, _LANE),
        lambda g, t: (t, g, 0, 0),
        memory_space=pltpu.VMEM,
    )
    lane_spec = pl.BlockSpec((t_block, _LANE), lambda g, t: (t, 0),
                             memory_space=pltpu.VMEM)

    if shared_seq:
        (x2,) = seq_inputs
        C = x2.shape[0]
        assert _LANE % C == 0, f"shared_seq needs 128 % C == 0, C={C}"

    # (lead, T_seg) -> (T_seg, G, 8, 128)
    def to_blocks(x, T_seg):
        x = _pad_to(x, lead_pad, 0)
        x = _pad_to(x, T_seg, 1)
        return x.T.reshape(T_seg, G, _SUBLANE, _LANE)

    fat_bytes = 2 * 4 * T_pad * lead_pad
    if fat_bytes <= _MAX_SCAN_HBM_BYTES:
        # single-call path: whole T in one grid
        if shared_seq:
            # (T, 128) with row t = [x_0[t], .., x_{C-1}[t], x_0[t], ...]
            # — exactly the per-lane input of the (T, G, 8, 128) layout
            xl = jnp.tile(x2.T.astype(jnp.float32), (1, _LANE // C))
            seq = [_pad_to(xl, T_pad, 0)]
            seq_specs = [lane_spec]
        else:
            seq = [to_blocks(x.astype(jnp.float32), T_pad)
                   for x in seq_inputs]
            seq_specs = [seq_spec] * len(seq)
        out, _ = _scan_call(kernel, seq, seq_specs, vec, T_pad, t_block, G,
                            carry_shape, gain_scratch, vmem_limit_mb,
                            interpret, shared_seq, compact_out=compact_out)
        if compact_out:
            return out[:lead, :T]
        return out.reshape(T_pad, lead_pad).T[:lead, :T]

    # ---- segment-chunked path ----
    blocks_per_seg = max(1, _SEG_TARGET_BYTES // (2 * 4 * t_block * lead_pad))
    seg_len = blocks_per_seg * t_block
    S = -(-T_pad // seg_len)
    T_pad2 = S * seg_len

    if shared_seq:
        xl = jnp.tile(x2.T.astype(jnp.float32), (1, _LANE // C))
        xs = _pad_to(xl, T_pad2, 0).reshape(S, seg_len, _LANE)
        seq_specs = [lane_spec]
    else:
        xs = jnp.stack(
            [_pad_to(x.astype(jnp.float32), T_pad2, 1)
             .reshape(lead, S, seg_len).swapaxes(0, 1)
             for x in seq_inputs], axis=1)  # (S, n_seq, lead, seg)
        seq_specs = [seq_spec] * len(seq_inputs)

    carry0 = jnp.zeros((G,) + tuple(carry_shape), jnp.float32)

    def body(carry, x_seg):
        if shared_seq:
            seq = [x_seg]
        else:
            seq = [to_blocks(x_seg[i], seg_len)
                   for i in range(x_seg.shape[0])]
        out_b, carry = _scan_call(kernel, seq, seq_specs, vec, seg_len,
                                  t_block, G, carry_shape, gain_scratch,
                                  vmem_limit_mb, interpret, shared_seq,
                                  carry_in=carry, compact_out=compact_out)
        # back to the compact (lead, seg) form before stacking
        if compact_out:
            return carry, out_b[:lead]
        return carry, out_b.reshape(seg_len, lead_pad).T[:lead]

    _, outs = jax.lax.scan(body, carry0, xs)  # (S, lead, seg)
    out = jnp.moveaxis(outs, 0, 1).reshape(lead, T_pad2)
    return out[:, :T]


def ballistics_pallas(
    c: jnp.ndarray,
    alpha_attack,
    alpha_release,
    t_block: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused decoupled attack/release detector.

    c: (..., T) gain-computer output in dB. alpha_attack/alpha_release:
    scalars or arrays broadcastable to c's leading dims.
    """
    lead_shape = c.shape[:-1]
    T = c.shape[-1]
    lead = int(np.prod(lead_shape)) if lead_shape else 1
    c2 = c.reshape(lead, T).astype(jnp.float32)
    aa = jnp.broadcast_to(jnp.asarray(alpha_attack, jnp.float32), lead_shape)
    ar = jnp.broadcast_to(jnp.asarray(alpha_release, jnp.float32), lead_shape)
    out = _run_scan(
        _ballistics_kernel, [c2],
        [aa.reshape(lead), ar.reshape(lead)],
        T, lead, t_block, interpret,
    )
    return out.reshape(*lead_shape, T).astype(c.dtype)


def linear_recurrence_pallas(
    coeff: jnp.ndarray,
    drive: jnp.ndarray,
    t_block: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """y[t] = coeff[t]*y[t-1] + drive[t] along the last axis (Pallas)."""
    lead_shape = coeff.shape[:-1]
    T = coeff.shape[-1]
    lead = int(np.prod(lead_shape)) if lead_shape else 1
    out = _run_scan(
        _linrec_kernel,
        [coeff.reshape(lead, T).astype(jnp.float32),
         drive.reshape(lead, T).astype(jnp.float32)],
        [],
        T, lead, t_block, interpret,
    )
    return out.reshape(*lead_shape, T).astype(coeff.dtype)
