"""CMA-ES convergence + ITO synthetic-target recovery (the reference's
built-in self-test: render a target with known params, recover it —
reference: scripts/run_optim.py:452-521)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from st_ito_tpu.chain import (
    ChainSpec,
    basic_compressor,
    basic_distortion,
    basic_parametric_eq,
    build_render_fn,
)
from st_ito_tpu.ito import CMAES, run_autodiff, run_es, run_random, run_rule_based
from st_ito_tpu.models.registry import (
    get_mfcc_feature_embeds,
    load_mfcc_feature_extractor,
    load_param_model,
    get_param_embeds,
)

SR = 48000
RNG = np.random.default_rng(6)


# ---------------- CMA-ES core ----------------


def test_cmaes_sphere():
    es = CMAES(np.full(8, 0.8), 0.3, popsize=16, bounds=(0, 1), seed=0)
    target = np.full(8, 0.3)
    for _ in range(100):
        X = es.ask()
        es.tell(X, [float(np.sum((x - target) ** 2)) for x in X])
    xbest, fbest = es.result
    assert fbest < 1e-6
    np.testing.assert_allclose(xbest, target, atol=1e-3)


def test_cmaes_rosenbrock():
    es = CMAES(np.full(6, 0.1), 0.3, popsize=32, bounds=(0, 1), seed=1)

    def rosen(x):
        return float(np.sum(100 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2))

    for _ in range(300):
        X = es.ask()
        es.tell(X, [rosen(x) for x in X])
    assert es.result[1] < 1e-3  # optimum at all-ones (boundary corner)


def test_cmaes_bounds_respected():
    es = CMAES(np.full(4, 0.5), 0.8, popsize=12, bounds=(0, 1), seed=2)
    for _ in range(5):
        X = es.ask()
        assert X.min() >= 0.0 and X.max() <= 1.0
        es.tell(X, list(np.sum(X**2, axis=1)))


def test_cmaes_state_roundtrip():
    es = CMAES(np.full(4, 0.5), 0.3, popsize=8, seed=3)
    for _ in range(3):
        X = es.ask()
        es.tell(X, list(np.sum((X - 0.2) ** 2, axis=1)))
    state = es.state_dict()
    es2 = CMAES(np.full(4, 0.5), 0.3, popsize=8, seed=3)
    es2.load_state_dict(state)
    np.testing.assert_allclose(es2.mean, es.mean)
    assert es2.best_f == es.best_f


# ---------------- ITO end-to-end (small, CPU-friendly) ----------------


def _test_signal(T=32768):
    t = np.arange(T) / SR
    x = sum(np.sin(2 * np.pi * f * t) * a
            for f, a in [(110, 1.0), (220, 0.6), (440, 0.4), (880, 0.3),
                         (1760, 0.2), (3520, 0.1)])
    x *= np.exp(-((t % 0.25) / 0.08))
    x = x + RNG.standard_normal(T) * 0.01
    return jnp.asarray((x / np.abs(x).max() * 0.8).astype(np.float32))[None, None, :]


def _small_chain():
    return ChainSpec(
        stages=(basic_parametric_eq(), basic_compressor(), basic_distortion()),
        with_bypass=False,
    )


@pytest.fixture(scope="module")
def mfcc_setup():
    model = load_mfcc_feature_extractor()
    return model, get_mfcc_feature_embeds


def test_run_es_recovers_synthetic_target(mfcc_setup):
    """fval must drop substantially on the synthetic-target task."""
    model, embed_func = mfcc_setup
    chain = _small_chain()
    x = _test_signal()
    render = build_render_fn(chain, SR, 1)
    w_target = jnp.asarray(RNG.uniform(0.2, 0.8, chain.num_params).astype(np.float32))
    y_target = render(w_target, x[0])[None]

    result = run_es(
        x, y_target, SR, chain, model, embed_func=embed_func,
        max_iters=10, popsize=16, sigma0=0.3, crop_len=32768,
        seed=0, verbose=False,
    )
    assert result["output_audio"].shape[1:] == y_target.shape[1:]
    assert len(result["fval_history"]) > 0
    # optimized fval must beat the identity baseline (input vs target)
    id_embed = embed_func(x, model, SR)
    tgt_embed = embed_func(y_target, model, SR)
    base = -float(jnp.sum(id_embed["mono"] * tgt_embed["mono"]))
    assert result["fopt"] < base + 1e-4
    assert result["evals_per_sec"] > 0


def test_run_es_fval_decreases(mfcc_setup):
    model, embed_func = mfcc_setup
    chain = _small_chain()
    x = _test_signal()
    render = build_render_fn(chain, SR, 1)
    w_target = jnp.asarray(np.array([0.8, 0.3, 0.3] * 6 + [0.7, 0.5, 0.2, 0.3]
                                    + [0.6, 0.5], np.float32))
    y_target = render(w_target, x[0])[None]
    result = run_es(x, y_target, SR, chain, model, embed_func=embed_func,
                    max_iters=12, popsize=16, sigma0=0.3, crop_len=32768,
                    find_w0=False, seed=1, verbose=False)
    h = result["fval_history"]
    assert h[-1] <= h[0]


def test_run_autodiff_decreases_loss(mfcc_setup):
    model, embed_func = mfcc_setup
    chain = _small_chain()
    x = _test_signal(16384)
    render = build_render_fn(chain, SR, 1)
    w_target = jnp.asarray(RNG.uniform(0.3, 0.7, chain.num_params).astype(np.float32))
    y_target = render(w_target, x[0])[None]
    result = run_autodiff(x, y_target, SR, model, embed_func=embed_func,
                          chain=chain, lr=5e-2, n_iters=30, verbose=False)
    assert result["fval_history"][-1] < result["fval_history"][0]


def test_run_random_and_input(mfcc_setup):
    model, _ = mfcc_setup
    chain = _small_chain()
    x = _test_signal(16384)
    out = run_random(x, x, SR, chain, model)
    assert out["output_audio"].shape[0] == 1
    assert "param_dict" in out
    out = __import__("st_ito_tpu.ito", fromlist=["run_input"]).run_input(x, x, SR)
    np.testing.assert_allclose(np.asarray(out["output_audio"]), np.asarray(x))


def test_run_rule_based_matches_spectrum():
    x = _test_signal(65536)
    # target = brighter version of x
    from st_ito_tpu.ops import parametric_eq
    y = parametric_eq(x[0], SR, high_shelf_gain_db=12.0,
                      high_shelf_cutoff_freq=4000.0)[None]
    out = run_rule_based(x, y, SR)
    z = np.asarray(out["output_audio"])[0, 0]
    X = np.abs(np.fft.rfft(np.asarray(x)[0, 0]))
    Z = np.abs(np.fft.rfft(z))
    f = np.fft.rfftfreq(len(z), 1 / SR)
    hi = (f > 6000) & (f < 12000)
    lo = (f > 100) & (f < 1000)
    tilt_in = X[hi].sum() / X[lo].sum()
    tilt_out = Z[hi].sum() / Z[lo].sum()
    assert tilt_out > tilt_in * 1.5  # matched EQ brightened the input


# ---------------- early stopping + dropout schedule ----------------


def _patch_fitness(monkeypatch, make_fvals, record=None):
    """Replace engine.make_fitness_fn with a synthetic objective so the
    ES control flow (early stop, dropout schedule) is tested in isolation."""
    from st_ito_tpu.ito import engine

    def fake_make_fitness_fn(*args, **kwargs):
        dropout = args[7] if len(args) > 7 else kwargs.get("dropout", 0.0)

        def fitness(W, x, target_embeds, target_content_embeds, rng):
            if record is not None:
                record.append(dropout)
            return jnp.asarray(make_fvals(np.asarray(W)), jnp.float32)

        return fitness

    monkeypatch.setattr(engine, "make_fitness_fn", fake_make_fitness_fn)


def _zero_embed(audio, model, sample_rate, **kwargs):
    return {"mono": jnp.zeros((audio.shape[0], 4))}


def test_run_es_improving_run_is_not_truncated(monkeypatch):
    """Regression: a steadily improving run must execute ALL max_iters
    generations (the old delta was computed against a history that already
    contained the current generation, so every run stopped at patience+1)."""
    calls = {"n": 0}

    def improving(W):
        calls["n"] += 1
        return np.full(W.shape[0], -0.02 * calls["n"])

    _patch_fitness(monkeypatch, improving)
    chain = _small_chain()
    x = _test_signal(16384)
    result = run_es(x, x, SR, chain, None, embed_func=_zero_embed,
                    max_iters=20, popsize=8, find_w0=False, seed=0,
                    verbose=False)
    assert len(result["fval_history"]) == 20


def test_run_es_stalled_run_stops_early(monkeypatch):
    _patch_fitness(monkeypatch, lambda W: np.ones(W.shape[0]))
    chain = _small_chain()
    x = _test_signal(16384)
    result = run_es(x, x, SR, chain, None, embed_func=_zero_embed,
                    max_iters=40, popsize=8, find_w0=False, seed=0,
                    early_stop_patience=10, verbose=False)
    # gen 0 seeds the counter; gens 1..11 show no improvement -> stop at 12
    assert len(result["fval_history"]) == 12


def test_run_es_final_iteration_disables_dropout(monkeypatch):
    """Reference zeroes dropout on the last generation
    (style_transfer.py:632-635)."""
    record = []
    calls = {"n": 0}

    def improving(W):
        calls["n"] += 1
        return np.full(W.shape[0], -0.02 * calls["n"])

    _patch_fitness(monkeypatch, improving, record=record)
    chain = _small_chain()
    x = _test_signal(16384)
    run_es(x, x, SR, chain, None, embed_func=_zero_embed, dropout=0.5,
           max_iters=3, popsize=8, find_w0=False, seed=0, verbose=False)
    assert record == [0.5, 0.5, 0.0]


def test_fitness_cache_pins_chain_refs(mfcc_setup):
    """Regression: the program cache must hold strong refs to its id()-keyed
    objects, else a GC'd chain can alias a new allocation at the same
    address and return a stale compiled program."""
    import gc
    import weakref

    from st_ito_tpu.ito.engine import _FITNESS_CACHE, make_fitness_fn

    model, embed_func = mfcc_setup
    chain = _small_chain()
    fn = make_fitness_fn(chain, model, SR, 1, embed_func)
    ref = weakref.ref(chain)
    key = next(k for k, v in _FITNESS_CACHE.items() if v[0] is fn)
    assert chain in _FITNESS_CACHE[key][1:]  # value pins the chain
    del chain
    gc.collect()
    assert ref() is not None  # still alive -> its id cannot be reused


# ---------------- device-resident ES (k generations per dispatch) --------


def test_device_cmaes_sphere():
    """The on-device ask/tell math converges like the host CMAES."""
    from st_ito_tpu.ito import device_es

    N, lam = 8, 16
    target = jnp.full(N, 0.3)
    consts = device_es.cma_consts(N, lam)
    state = device_es.cma_init(np.full(N, 0.8), 0.3)

    def fitness_impl(mparams, cparams, W, x, te, tce, rng):
        return jnp.sum((W - target[None, :]) ** 2, axis=-1)

    run = device_es.make_block_runner(fitness_impl, consts, k=25)
    key = jax.random.PRNGKey(0)
    for i in range(4):
        key, sub = jax.random.split(key)
        state, stats = run(state, None, None, jnp.zeros((1, 8)), None, None,
                           sub)
    assert float(state.best_f) < 1e-5
    np.testing.assert_allclose(np.asarray(state.best_x), np.asarray(target),
                               atol=5e-3)
    # ask respects [0,1] bounds via reflection
    W = device_es.cma_ask(state, consts, jax.random.PRNGKey(7))
    assert float(W.min()) >= 0.0 and float(W.max()) <= 1.0


def test_device_cmaes_state_dict_interop():
    """Device snapshots load into the host CMAES and back."""
    from st_ito_tpu.ito import device_es

    consts = device_es.cma_consts(4, 8)
    state = device_es.cma_init(np.full(4, 0.5), 0.3)

    def fitness_impl(mparams, cparams, W, x, te, tce, rng):
        return jnp.sum((W - 0.2) ** 2, axis=-1)

    run = device_es.make_block_runner(fitness_impl, consts, k=3)
    state, _ = run(state, None, None, jnp.zeros((1, 4)), None, None,
                   jax.random.PRNGKey(0))
    d = device_es.state_to_dict(state)
    es = CMAES(np.full(4, 0.5), 0.3, popsize=8, seed=0)
    es.load_state_dict(d)
    np.testing.assert_allclose(es.mean, d["mean"])
    assert es.generation == 3 and es.counteval == 24
    state2 = device_es.state_from_dict(es.state_dict())
    np.testing.assert_allclose(np.asarray(state2.C), np.asarray(state.C),
                               atol=1e-6)


def test_run_es_device_blocks_recovers_synthetic_target(mfcc_setup):
    """gens_per_dispatch>1 routes through the device loop and still
    recovers the synthetic target; histories stay per-generation."""
    model, embed_func = mfcc_setup
    chain = _small_chain()
    x = _test_signal()
    render = build_render_fn(chain, SR, 1)
    w_target = jnp.asarray(
        RNG.uniform(0.2, 0.8, chain.num_params).astype(np.float32))
    y_target = render(w_target, x[0])[None]

    result = run_es(
        x, y_target, SR, chain, model, embed_func=embed_func,
        max_iters=10, popsize=16, sigma0=0.3, crop_len=32768,
        seed=0, verbose=False, gens_per_dispatch=4,
    )
    assert len(result["fval_history"]) == 10
    assert len(result["wopt_history"]) == 10
    id_embed = embed_func(x, model, SR)
    tgt_embed = embed_func(y_target, model, SR)
    base = -float(jnp.sum(id_embed["mono"] * tgt_embed["mono"]))
    assert result["fopt"] < base + 1e-4
    # best-so-far history is monotone non-increasing
    assert all(b <= a + 1e-7 for a, b in
               zip(result["fval_history"], result["fval_history"][1:]))


def test_run_es_device_blocks_dropout_final_gen(mfcc_setup):
    """dropout>0: main gens run in blocks, final generation dropout-free."""
    model, embed_func = mfcc_setup
    chain = _small_chain()
    x = _test_signal()
    result = run_es(
        x, x, SR, chain, model, embed_func=embed_func, dropout=0.3,
        max_iters=5, popsize=8, sigma0=0.3, crop_len=32768,
        find_w0=False, seed=0, verbose=False, gens_per_dispatch=3,
    )
    assert len(result["fval_history"]) == 5
    assert np.isfinite(result["fopt"])


def test_run_es_chunked_long_audio(mfcc_setup):
    """chunked=True (BASELINE config 5): a 2x-crop_len input optimizes on
    the FULL signal via overlap-chunked embeddings (reference crops
    instead, style_transfer.py:505-518)."""
    model, embed_func = mfcc_setup
    chain = _small_chain()
    L = 16384
    x = _test_signal(2 * L)  # twice the chunk length
    render = build_render_fn(chain, SR, 1)
    w_target = jnp.asarray(
        RNG.uniform(0.25, 0.75, chain.num_params).astype(np.float32))
    y_target = render(w_target, x[0])[None]

    result = run_es(x, y_target, SR, chain, model, embed_func=embed_func,
                    max_iters=8, popsize=12, sigma0=0.3, crop_len=L,
                    chunked=True, find_w0=False, seed=0, verbose=False,
                    gens_per_dispatch=4)
    # output covers the FULL length, not the crop
    assert result["output_audio"].shape[-1] == 2 * L
    assert result["fopt"] <= result["fval_history"][0] + 1e-9
    # the chunked wrapper is cached: a second build reuses the identity
    from st_ito_tpu.ito.engine import _chunked_embed_for

    assert _chunked_embed_for(embed_func, L) is _chunked_embed_for(
        embed_func, L)


def test_fitness_pop_microbatch_equivalence(mfcc_setup):
    """pop_microbatch (the HBM cap for full-length chunked renders: pop
    128 @ 60 s requested 24 GB of temps on a 16 GB v5e) evaluates the
    population in lax.map sub-batches and must match the full-population
    fitness exactly."""
    from st_ito_tpu.ito.engine import make_fitness_fn
    from st_ito_tpu.models.registry import get_param_embeds, load_param_model

    chain = _small_chain()
    model = load_param_model(allow_random=True)
    x = _test_signal()[0]
    W = jnp.asarray(RNG.uniform(0.1, 0.9, (12, chain.num_params))
                    .astype(np.float32))
    te = get_param_embeds(x[None], model, SR)
    key = jax.random.PRNGKey(0)
    f_full = make_fitness_fn(chain, model, SR, x.shape[0],
                             compute_dtype="float32")
    f_mb = make_fitness_fn(chain, model, SR, x.shape[0],
                           compute_dtype="float32", pop_microbatch=4)
    a = np.asarray(f_full(W, x, te, None, key))
    b = np.asarray(f_mb(W, x, te, None, key))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_fitness_skips_redundant_peak_norm(mfcc_setup):
    """With a self-normalizing embed (get_param_embeds), the fitness
    renderer skips its output peak-normalization; values must match the
    explicit render-with-norm -> embed -> cosine pipeline exactly (the
    embed's own peak_normalize makes the two scale-invariant-equal)."""
    from st_ito_tpu.chain.executor import build_batched_render_fn
    from st_ito_tpu.ito.engine import make_fitness_fn
    from st_ito_tpu.models.registry import get_param_embeds, load_param_model

    chain = _small_chain()
    model = load_param_model(allow_random=True)
    x = _test_signal()[0]
    W = jnp.asarray(RNG.uniform(0.1, 0.9, (6, chain.num_params))
                    .astype(np.float32))
    te = get_param_embeds(x[None], model, SR)
    fit = make_fitness_fn(chain, model, SR, x.shape[0],
                          compute_dtype="float32")
    got = np.asarray(fit(W, x, te, None, jax.random.PRNGKey(0)))

    render = build_batched_render_fn(chain, SR, x.shape[0], fast=False,
                                     peak_normalize_output=True)
    Y = render(W, jnp.broadcast_to(x[None], (6,) + x.shape))
    oe = get_param_embeds(Y, model, SR)
    exp = np.mean([-np.sum(np.asarray(oe[k]) * np.asarray(te[k]), axis=-1)
                   for k in oe], axis=0)
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_run_staged_es(mfcc_setup):
    """Per-stage CMA-ES with earlier stages frozen at their optimum
    (reference: scripts/run_optim.py:39-234)."""
    from st_ito_tpu.ito import run_staged_es

    model, embed_func = mfcc_setup
    chain = _small_chain()
    x = _test_signal()
    render = build_render_fn(chain, SR, 1)
    w_target = jnp.asarray(RNG.uniform(0.3, 0.7, chain.num_params).astype(np.float32))
    y_target = render(w_target, x[0])[None]
    result = run_staged_es(x, y_target, SR, chain, model,
                           embed_func=embed_func, max_iters=3, popsize=8,
                           sigma0=0.3, seed=0, verbose=False)
    assert result["output_audio"].shape[1:] == y_target.shape[1:]
    assert len(result["fval_history"]) == 3 * len(chain.stages)
    assert len(result["wopt_history"]) == 3 * len(chain.stages)
    assert np.isfinite(result["fopt"])


def test_run_staged_es_early_stops_per_stage(monkeypatch):
    """Each stage now runs the full ES loop (reference:
    scripts/run_optim.py:39-234): a stalled stage stops at patience+2
    generations instead of burning all max_iters."""
    from st_ito_tpu.ito import run_staged_es

    _patch_fitness(monkeypatch, lambda W: np.ones(W.shape[0]))
    chain = _small_chain()
    x = _test_signal(16384)
    result = run_staged_es(x, x, SR, chain, None, embed_func=_zero_embed,
                           max_iters=30, popsize=8, seed=0, verbose=False,
                           early_stop_patience=3)
    # gen 0 seeds the counter; gens 1..4 show no improvement -> 5 per stage
    assert len(result["fval_history"]) == 5 * len(chain.stages)


def test_run_es_random_crop_short_audio_no_padding(mfcc_setup):
    """random_crop=True with T <= crop_len must evaluate the UNPADDED
    signal. Zero-padding candidates to crop_len while target_embed stays
    unpadded dilutes the time-pooled candidate embeddings with silence and
    corrupts the objective (regression: catastrophic mixed-mode PST runs
    where ES ended far below the identity baseline). Defined LAST: it
    draws from the shared module RNG, and inserting it earlier would
    shift every later test's random inputs."""
    model, embed_func = mfcc_setup
    chain = _small_chain()
    x = _test_signal()  # T = 32768 << crop_len below
    render = build_render_fn(chain, SR, 1)
    w_target = jnp.asarray(
        RNG.uniform(0.3, 0.7, chain.num_params).astype(np.float32))
    y_target = render(w_target, x[0])[None]
    common = dict(max_iters=3, popsize=8, sigma0=0.3, find_w0=False,
                  seed=4, verbose=False)
    r_crop = run_es(x, y_target, SR, chain, model, embed_func=embed_func,
                    crop_len=262144, random_crop=True, **common)
    r_ref = run_es(x, y_target, SR, chain, model, embed_func=embed_func,
                   crop_len=262144, random_crop=False, **common)
    np.testing.assert_allclose(r_crop["fval_history"],
                               r_ref["fval_history"], rtol=1e-6)
