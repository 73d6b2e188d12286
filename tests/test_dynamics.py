"""Compressor / limiter behavioral and parity tests."""

import numpy as np
import jax.numpy as jnp

from st_ito_tpu.ops.dynamics import (
    ballistics_parallel,
    ballistics_scan,
    compressor,
    gain_computer,
    limiter,
)

SR = 48000.0
RNG = np.random.default_rng(1)


def test_gain_computer_regions():
    env = jnp.array([-40.0, -20.0, 0.0])
    gr = gain_computer(env, threshold_db=-20.0, ratio=4.0, knee_db=0.01)
    np.testing.assert_allclose(np.asarray(gr[0]), 0.0, atol=1e-4)  # below
    np.testing.assert_allclose(np.asarray(gr[1]), 0.0, atol=1e-2)  # at threshold
    # 20 dB over, ratio 4 -> output 5 dB over -> reduction -15 dB
    np.testing.assert_allclose(np.asarray(gr[2]), -15.0, atol=0.05)


def test_gain_computer_soft_knee_continuous():
    env = jnp.linspace(-40.0, 0.0, 1001)
    gr = np.asarray(gain_computer(env, -20.0, 4.0, 12.0))
    # piecewise C1: finite differences should have no jumps
    d = np.diff(gr)
    assert np.max(np.abs(np.diff(d))) < 1e-2


def test_ballistics_parallel_equals_serial():
    """The min-affine associative scan is exact: parallel == serial."""
    T = 48000
    c = np.zeros(T, np.float32)
    c[8000:16000] = -12.0
    c[30000:31000] = -6.0
    c += -np.abs(RNG.standard_normal(T).astype(np.float32)) * 0.5
    aa = np.exp(-1 / (0.010 * SR))  # 10ms attack
    ar = np.exp(-1 / (0.100 * SR))  # 100ms release
    g_par = np.asarray(ballistics_parallel(jnp.asarray(c), aa, ar))
    g_ser = np.asarray(ballistics_scan(jnp.asarray(c), aa, ar))
    np.testing.assert_allclose(g_par, g_ser, atol=5e-3)


def test_ballistics_attack_release_times():
    """Step down: settles with attack speed; step back: recovers with release."""
    T = 48000
    c = np.zeros(T, np.float32)
    c[1000:24000] = -20.0
    aa = np.exp(-1 / (0.005 * SR))
    ar = np.exp(-1 / (0.200 * SR))
    g = np.asarray(ballistics_parallel(jnp.asarray(c), aa, ar))
    # ~5 time constants after attack onset, gain reached ~ -20
    assert g[1000 + int(0.030 * SR)] < -19.0
    # shortly after release onset, still mostly held (slow release)
    assert g[24000 + int(0.050 * SR)] < -12.0
    # long after, recovered
    assert g[-1] > -2.0


def test_compressor_reduces_dynamic_range():
    T = 48000
    t = np.arange(T) / SR
    sig = np.sin(2 * np.pi * 200 * t).astype(np.float32)
    env = np.where((t > 0.4) & (t < 0.6), 1.0, 0.05).astype(np.float32)
    x = (sig * env)[None, :]  # (1, T)
    y = np.asarray(
        compressor(jnp.asarray(x), SR, threshold_db=-20.0, ratio=8.0,
                   attack_ms=2.0, release_ms=60.0, knee_db=3.0)
    )
    loud_in = np.abs(x[0, int(0.5 * SR) - 1000 : int(0.5 * SR) + 1000]).max()
    loud_out = np.abs(y[0, int(0.5 * SR) - 1000 : int(0.5 * SR) + 1000]).max()
    quiet_in = np.abs(x[0, int(0.2 * SR) - 1000 : int(0.2 * SR) + 1000]).max()
    quiet_out = np.abs(y[0, int(0.2 * SR) - 1000 : int(0.2 * SR) + 1000]).max()
    ratio_in = loud_in / quiet_in
    ratio_out = loud_out / quiet_out
    assert ratio_out < ratio_in * 0.5  # range compressed
    np.testing.assert_allclose(quiet_out, quiet_in, rtol=0.05)  # quiet untouched


def test_compressor_makeup_gain():
    x = jnp.asarray(RNG.standard_normal((1, 8192)).astype(np.float32) * 0.01)
    y0 = compressor(x, SR, threshold_db=-10.0, makeup_gain_db=0.0)
    y6 = compressor(x, SR, threshold_db=-10.0, makeup_gain_db=6.0)
    np.testing.assert_allclose(np.asarray(y6), np.asarray(y0) * 10 ** (6 / 20), rtol=1e-4)


def test_compressor_stereo_linked():
    """Loud left channel should duck the right channel too."""
    T = 24000
    left = np.ones(T, np.float32) * 0.9
    right = np.ones(T, np.float32) * 0.05
    x = jnp.asarray(np.stack([left, right])[None])  # (1, 2, T)
    y = np.asarray(compressor(x, SR, threshold_db=-20.0, ratio=10.0,
                              attack_ms=0.1, release_ms=50.0))
    # steady state: both channels share the same gain
    g_l = y[0, 0, -100:].mean() / 0.9
    g_r = y[0, 1, -100:].mean() / 0.05
    np.testing.assert_allclose(g_l, g_r, rtol=1e-3)
    assert g_l < 0.3  # heavy reduction


def test_limiter_caps_peaks():
    T = 48000
    x = jnp.asarray((RNG.standard_normal((1, T)) * 0.5).astype(np.float32))
    y = np.asarray(limiter(x, SR, threshold_db=-6.0, release_ms=50.0))
    # after attack settles, peaks approach the threshold
    assert np.abs(y[0, 1000:]).max() < 10 ** (-6 / 20) * 1.6


def test_compressor_lookahead_shapes():
    x = jnp.asarray(RNG.standard_normal((2, 2, 4096)).astype(np.float32))
    y = compressor(x, SR, lookahead_samples=512)
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())


def test_fused_compressor_kernel_matches_unfused():
    """The fully fused Pallas compressor (interpret mode) must match the
    op-by-op XLA form bit-closely."""
    from st_ito_tpu.ops.dynamics import (
        _time_constant_alpha,
        compressor,
    )
    from st_ito_tpu.ops.pallas.scan import compressor_fused_pallas

    rng = np.random.default_rng(3)
    B, C, T = 3, 2, 4096
    x = jnp.asarray(rng.standard_normal((B, C, T)).astype(np.float32) * 0.5)
    th = jnp.asarray(rng.uniform(-40, -5, (B, 1)).astype(np.float32))
    ratio = jnp.asarray(rng.uniform(1.5, 10, (B, 1)).astype(np.float32))
    sr = 48000.0

    ref = compressor(x, sr, threshold_db=th[..., None], ratio=ratio[..., None],
                     attack_ms=5.0, release_ms=80.0, knee_db=0.5,
                     link_channels=False)
    aa = _time_constant_alpha(5.0, sr)
    ar = _time_constant_alpha(80.0, sr)
    lead = (B, C)
    fused = compressor_fused_pallas(
        x, jnp.broadcast_to(th, lead), jnp.broadcast_to(ratio, lead),
        jnp.full(lead, 0.5), jnp.full(lead, aa), jnp.full(lead, ar),
        jnp.zeros(lead), interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_compressor_in_kernel_bypass_blend():
    """active=0 rows must come back bit-identical to the input; active=1
    rows must match the no-mask kernel output."""
    from st_ito_tpu.ops.dynamics import _time_constant_alpha
    from st_ito_tpu.ops.pallas.scan import compressor_fused_pallas

    rng = np.random.default_rng(5)
    B, C, T = 4, 2, 2048
    x = jnp.asarray(rng.standard_normal((B, C, T)).astype(np.float32) * 0.5)
    lead = (B, C)
    aa = _time_constant_alpha(5.0, 48000.0)
    ar = _time_constant_alpha(80.0, 48000.0)
    args = (x, jnp.full(lead, -20.0), jnp.full(lead, 6.0),
            jnp.full(lead, 0.5), jnp.full(lead, aa), jnp.full(lead, ar),
            jnp.zeros(lead))
    act = jnp.asarray([1.0, 0.0, 1.0, 0.0])[:, None]
    y_mask = compressor_fused_pallas(
        *args, interpret=True, active=jnp.broadcast_to(act, lead))
    y_on = compressor_fused_pallas(*args, interpret=True)
    np.testing.assert_array_equal(np.asarray(y_mask[1]), np.asarray(x[1]))
    np.testing.assert_array_equal(np.asarray(y_mask[3]), np.asarray(x[3]))
    np.testing.assert_allclose(np.asarray(y_mask[0]), np.asarray(y_on[0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(y_mask[2]), np.asarray(y_on[2]),
                               atol=1e-6)


def test_biquad_cascade_in_kernel_bypass_blend():
    from st_ito_tpu.ops.iir import biquad_coeffs
    from st_ito_tpu.ops.pallas.scan import biquad_cascade_pallas

    rng = np.random.default_rng(6)
    B, T = 4, 2048
    x = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
    b, a = biquad_coeffs(6.0, 1000.0, 0.7, 48000.0, "peaking")
    b = jnp.broadcast_to(jnp.asarray(b), (B, 1, 3))
    a = jnp.broadcast_to(jnp.asarray(a), (B, 1, 3))
    act = jnp.asarray([1.0, 0.0, 0.0, 1.0])
    y_mask = biquad_cascade_pallas(x, b, a, interpret=True, active=act)
    y_on = biquad_cascade_pallas(x, b, a, interpret=True)
    np.testing.assert_array_equal(np.asarray(y_mask[1]), np.asarray(x[1]))
    np.testing.assert_array_equal(np.asarray(y_mask[2]), np.asarray(x[2]))
    np.testing.assert_allclose(np.asarray(y_mask[0]), np.asarray(y_on[0]),
                               atol=1e-6)


def test_segmented_scan_matches_single_call():
    """Long-T segment-chunked _run_scan (explicit carry I/O threaded
    through lax.scan) is bit-exact vs the single-call grid for every
    public scan kernel, including the shared-input eqcomp head. Replaces
    the old associative-scan fallback on long signals (engine.py used to
    flip renderer_fast=False; its log2(T)-stage HLO took >23 min to
    compile at 60 s through the relay compile service)."""
    import st_ito_tpu.ops.pallas.scan as S

    rng = np.random.default_rng(7)
    B, C, T = 3, 2, 1000
    x = jnp.asarray(rng.standard_normal((B, C, T)).astype(np.float32)) * 0.3
    nsec = 6
    b = jnp.asarray(rng.uniform(0.2, 1.0, (B, C, nsec, 3)).astype(np.float32))
    a = jnp.concatenate(
        [jnp.ones((B, C, nsec, 1)),
         jnp.asarray(rng.uniform(-0.3, 0.3, (B, C, nsec, 2)).astype(
             np.float32))], -1)
    kw = dict(
        threshold_db=jnp.asarray(rng.uniform(-30, -10, (B, 1)), jnp.float32),
        ratio=jnp.asarray(rng.uniform(2, 6, (B, 1)), jnp.float32),
        knee_db=0.5,
        alpha_attack=jnp.asarray(rng.uniform(.8, .99, (B, 1)), jnp.float32),
        alpha_release=jnp.asarray(rng.uniform(.8, .99, (B, 1)), jnp.float32),
        makeup_gain_db=1.5,
        eq_active=jnp.asarray([1., 0., 1.])[:, None],
        comp_active=jnp.asarray([0., 1., 1.])[:, None],
        drive_db=jnp.asarray(rng.uniform(0, 12, (B, 1)), jnp.float32),
        dist_gain_db=-2.0,
        dist_active=jnp.asarray([1., 1., 0.])[:, None],
        t_block=128, interpret=True)
    x2 = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32)) * 0.3
    act = jnp.asarray([1., 0., 1.])[:, None]
    aa = jnp.asarray(rng.uniform(0.8, 0.99, 5).astype(np.float32))
    ar = jnp.asarray(rng.uniform(0.8, 0.99, 5).astype(np.float32))
    c5 = jnp.asarray(rng.standard_normal((5, T)).astype(np.float32))
    la = jnp.asarray(rng.uniform(-0.9, 0.9, (5, T)).astype(np.float32))
    lb = jnp.asarray(rng.standard_normal((5, T)).astype(np.float32))

    def run_all():
        return (
            S.eq_compressor_fused_pallas(x, b, a, **kw),
            S.eq_compressor_fused_pallas(x2, b, a,
                                         shared_lead_shape=(B, C), **kw),
            S.compressor_fused_pallas(x, jnp.float32(-20), 4.0, 1.0, 0.9,
                                      0.95, active=act, t_block=128,
                                      interpret=True),
            S.biquad_cascade_pallas(x, b, a, t_block=128, interpret=True,
                                    active=act),
            S.ballistics_pallas(c5, aa, ar, t_block=128, interpret=True),
            S.linear_recurrence_pallas(la, lb, t_block=128, interpret=True),
        )

    saved = (S._MAX_SCAN_HBM_BYTES, S._SEG_TARGET_BYTES)
    try:
        # thresholds that force ~4 segments at these tiny shapes
        S._MAX_SCAN_HBM_BYTES = 4 * 2 * 1024 * 600
        S._SEG_TARGET_BYTES = 4 * 2 * 1024 * 256
        seg = run_all()
    finally:
        S._MAX_SCAN_HBM_BYTES, S._SEG_TARGET_BYTES = saved
    one = run_all()
    for y_seg, y_one in zip(seg, one):
        np.testing.assert_array_equal(np.asarray(y_seg), np.asarray(y_one))


def test_eq_comp_compact_out_matches_fat_layout():
    """compact_out=True (the default: in-kernel MXU identity-dot transpose
    emitting (lead, T) directly, deleting the ~13 ms/gen XLA relayout on
    the ES hot path) is bit-exact vs the original fat-layout output, for
    both the per-candidate and the shared-input forms and under
    segment-chunked execution."""
    import st_ito_tpu.ops.pallas.scan as S

    rng = np.random.default_rng(11)
    B, C, T, nsec = 3, 2, 700, 6
    x = jnp.asarray(rng.standard_normal((B, C, T)).astype(np.float32)) * 0.3
    x2 = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32)) * 0.3
    b = jnp.asarray(rng.uniform(0.2, 1.0, (B, C, nsec, 3)).astype(np.float32))
    a = jnp.concatenate(
        [jnp.ones((B, C, nsec, 1)),
         jnp.asarray(rng.uniform(-0.3, 0.3, (B, C, nsec, 2)).astype(
             np.float32))], -1)
    kw = dict(threshold_db=-18.0, ratio=4.0, knee_db=2.0,
              alpha_attack=0.92, alpha_release=0.97, makeup_gain_db=1.0,
              drive_db=6.0, dist_gain_db=-2.0, t_block=128, interpret=True)

    def pair(**extra):
        yc = S.eq_compressor_fused_pallas(compact_out=True, **kw, **extra)
        yf = S.eq_compressor_fused_pallas(compact_out=False, **kw, **extra)
        np.testing.assert_array_equal(np.asarray(yc), np.asarray(yf))

    pair(x=x, b=b, a=a)
    pair(x=x2, b=b, a=a, shared_lead_shape=(B, C))
    saved = (S._MAX_SCAN_HBM_BYTES, S._SEG_TARGET_BYTES)
    try:
        S._MAX_SCAN_HBM_BYTES = 4 * 2 * 1024 * 600
        S._SEG_TARGET_BYTES = 4 * 2 * 1024 * 256
        pair(x=x, b=b, a=a)
        pair(x=x2, b=b, a=a, shared_lead_shape=(B, C))
    finally:
        S._MAX_SCAN_HBM_BYTES, S._SEG_TARGET_BYTES = saved
