"""Chain executor: codec round-trip, bypass, vmapped population render."""

import numpy as np
import jax
import jax.numpy as jnp

from st_ito_tpu import proc
from st_ito_tpu.chain import (
    ChainSpec,
    basic_chain,
    basic_compressor,
    basic_distortion,
    basic_parametric_eq,
    build_render_fn,
    parameters_to_dict,
)

SR = 48000
RNG = np.random.default_rng(4)


def _audio(ch=1, T=16384):
    return jnp.asarray((RNG.standard_normal((ch, T)) * 0.3).astype(np.float32))


def test_chain_param_count():
    chain = basic_chain(with_bypass=True)
    # 18 + 4 + 2 + 3 + 4 params + 5 bypasses
    assert chain.num_params == 18 + 4 + 2 + 3 + 4 + 5
    assert basic_chain(with_bypass=False).num_params == 31


def test_init_params_are_defaults():
    chain = basic_chain()
    w0 = chain.init_params()
    d = parameters_to_dict(w0, chain)
    assert d["ParametricEQ"]["low_shelf_cutoff_freq"] == 80.0
    assert d["Compressor"]["ratio"] == 4.0
    assert d["Reverb"]["room_size"] == 0.5
    assert d["ParametricEQ"]["our_bypass"] == 0.0


def test_render_all_bypassed_is_identity():
    chain = basic_chain()
    render = build_render_fn(chain, SR, num_channels=2,
                             peak_normalize_output=False)
    x = _audio(2)
    w = chain.init_params()
    for s, start, _ in chain.stage_slices():
        w = w.at[start].set(1.0)  # bypass all
    y = render(w, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_render_mono_promotes_to_stereo():
    chain = basic_chain()
    render = build_render_fn(chain, SR, num_channels=1)
    y = render(chain.init_params(), _audio(1))
    assert y.shape[0] == 2  # Delay/Reverb are stereo stages


def test_fixed_parameters_pinned():
    stage = basic_distortion(fixed={"drive_db": 0.75})
    chain = ChainSpec(stages=(stage,), with_bypass=False)
    render = build_render_fn(chain, SR, 1, peak_normalize_output=False)
    x = _audio(1)
    w_a = jnp.array([0.1, 0.5])
    w_b = jnp.array([0.9, 0.5])  # drive slot ignored (pinned)
    np.testing.assert_allclose(
        np.asarray(render(w_a, x)), np.asarray(render(w_b, x)), atol=1e-7
    )


def test_vmapped_population_render():
    """The ES hot path: one jitted launch renders the whole population."""
    chain = basic_chain()
    render = build_render_fn(chain, SR, num_channels=1)
    x = _audio(1, T=32768)
    pop = 16
    W = jnp.asarray(RNG.uniform(0, 1, (pop, chain.num_params)).astype(np.float32))
    render_pop = jax.jit(jax.vmap(lambda w: render(w, x)))
    Y = render_pop(W)
    assert Y.shape == (pop, 2, 32768)
    assert bool(jnp.isfinite(Y).all())
    # population members produce different audio
    assert float(jnp.std(Y, axis=0).mean()) > 1e-4


def test_render_gradients_flow():
    chain = ChainSpec(
        stages=(basic_parametric_eq(), basic_compressor()), with_bypass=False
    )
    render = build_render_fn(chain, SR, 1, peak_normalize_output=False)
    x = _audio(1, T=8192)

    def loss(w):
        return jnp.mean(render(w, x) ** 2)

    g = jax.grad(loss)(chain.init_params())
    assert g.shape == (22,)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0


def test_proc_simple_and_complex():
    x = jnp.asarray((RNG.standard_normal((2, 1, 16384)) * 0.3).astype(np.float32))
    p_simple = jnp.asarray(RNG.uniform(0, 1, (2, proc.NUM_SIMPLE_PARAMS)).astype(np.float32))
    y = proc.apply_simple_autodiff_processor(x, p_simple, SR)
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())

    p_complex = jnp.asarray(RNG.uniform(0, 1, (2, proc.NUM_COMPLEX_PARAMS)).astype(np.float32))
    y = proc.apply_complex_autodiff_processor(x, p_complex, SR)
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())


def test_proc_eq15_band3_and_high_shelf_share_params():
    """Reference parity: the 15-param EQ applies SIX sections — params[12:15]
    drive both a peaking band AND the high shelf (st_ito/methods/style.py:
    175-201 passes the 12:15 slice twice), so a +12 dB setting there boosts
    highs by ~two sections' worth, not one."""
    T = 32768
    x = jnp.asarray((RNG.standard_normal((1, 1, T)) * 0.1).astype(np.float32))
    p = np.full((1, 15), 0.5, np.float32)  # all gains 0 dB -> identity-ish
    p[0, 12] = (12.0 + 18.0) / 36.0       # +12 dB at params[12:15]
    p[0, 13] = (8000.0 - 20.0) / (20000.0 - 20.0)  # 8 kHz (linear range)
    p[0, 14] = (0.7 - 0.1) / 9.9          # modest Q
    y = proc.apply_parametric_eq_15(x, jnp.asarray(p), SR)

    f = np.fft.rfftfreq(T, 1 / SR)
    hi = (f > 7000) & (f < 9000)
    X = np.abs(np.fft.rfft(np.asarray(x)[0, 0]))
    Y = np.abs(np.fft.rfft(np.asarray(y)[0, 0]))
    boost_db = 20 * np.log10(Y[hi].sum() / X[hi].sum())
    # a single +12 dB section cannot exceed ~12.5 dB anywhere; the two
    # stacked sections measure ~17.8 dB at the band center
    assert boost_db > 15.0, boost_db


def test_proc_gradients():
    x = jnp.asarray((RNG.standard_normal((1, 1, 8192)) * 0.3).astype(np.float32))

    def loss(p):
        return jnp.mean(proc.apply_complex_autodiff_processor(x, p, SR) ** 2)

    p = jnp.full((1, proc.NUM_COMPLEX_PARAMS), 0.5)
    g = jax.grad(loss)(p)
    assert bool(jnp.isfinite(g).all())
    # most parameters should receive gradient
    assert int((jnp.abs(g) > 0).sum()) > 30
