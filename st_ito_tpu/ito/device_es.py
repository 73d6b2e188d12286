"""On-device CMA-ES: k generations per XLA dispatch.

The host-side ask/tell loop (ito/cmaes.py) costs microseconds of math but
one full host<->device round trip per generation — ~40 ms through the
tunneled TPU relay, which capped the round-2 headline bench below the
1024 evals/s target even though device time was at target. This module
moves the entire CMA-ES update (sampling, reflection, rank-mu covariance
update, step-size control, eigendecomposition) into the fitness program
and runs ``k`` generations under one ``lax.scan``, so the host fetches
per-generation statistics once per k generations instead of once per
generation.

The math is the standard Hansen (mu/mu_w, lambda) algorithm — the same
update ito/cmaes.py implements on host (replacing the reference's ``cma``
dependency, reference: st_ito/style_transfer.py:614,651-652) — in float32
jnp with ``jnp.linalg.eigh`` for the covariance refresh. State snapshots
convert losslessly to/from the host CMAES ``state_dict`` layout so
preemption-safe resume (engine.run_es ``es_state_path``) works across
both execution modes.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class CMAConsts(NamedTuple):
    """Static strategy parameters (host floats; baked into the program)."""

    N: int
    lam: int
    mu: int
    weights: jnp.ndarray  # (mu,)
    mueff: float
    cc: float
    cs: float
    c1: float
    cmu: float
    damps: float
    chiN: float


class CMAState(NamedTuple):
    """Device-resident evolving state (all float32 except counters)."""

    mean: jnp.ndarray  # (N,)
    sigma: jnp.ndarray  # ()
    pc: jnp.ndarray  # (N,)
    ps: jnp.ndarray  # (N,)
    C: jnp.ndarray  # (N, N)
    B: jnp.ndarray  # (N, N) eigenbasis of C
    D: jnp.ndarray  # (N,) sqrt eigenvalues
    best_x: jnp.ndarray  # (N,)
    best_f: jnp.ndarray  # ()
    generation: jnp.ndarray  # () int32
    counteval: jnp.ndarray  # () int32


def cma_consts(N: int, popsize: int) -> CMAConsts:
    lam = popsize
    mu = lam // 2
    w = math.log(mu + 0.5) - np.log(np.arange(1, mu + 1))
    w = w / w.sum()
    mueff = 1.0 / float(np.sum(w**2))
    cc = (4 + mueff / N) / (N + 4 + 2 * mueff / N)
    cs = (mueff + 2) / (N + mueff + 5)
    c1 = 2 / ((N + 1.3) ** 2 + mueff)
    cmu = min(1 - c1, 2 * (mueff - 2 + 1 / mueff) / ((N + 2) ** 2 + mueff))
    damps = 1 + 2 * max(0.0, math.sqrt((mueff - 1) / (N + 1)) - 1) + cs
    chiN = math.sqrt(N) * (1 - 1 / (4 * N) + 1 / (21 * N**2))
    return CMAConsts(N, lam, mu, jnp.asarray(w, jnp.float32), mueff, cc, cs,
                     c1, cmu, damps, chiN)


def cma_init(x0: np.ndarray, sigma0: float) -> CMAState:
    x0 = np.asarray(x0, np.float32)
    N = x0.size
    return CMAState(
        mean=jnp.asarray(x0),
        sigma=jnp.asarray(sigma0, jnp.float32),
        pc=jnp.zeros(N, jnp.float32),
        ps=jnp.zeros(N, jnp.float32),
        C=jnp.eye(N, dtype=jnp.float32),
        B=jnp.eye(N, dtype=jnp.float32),
        D=jnp.ones(N, jnp.float32),
        best_x=jnp.asarray(x0),
        best_f=jnp.asarray(np.inf, jnp.float32),
        generation=jnp.asarray(0, jnp.int32),
        counteval=jnp.asarray(0, jnp.int32),
    )


def state_to_dict(state: CMAState) -> dict:
    """Fetch to host in the ito/cmaes.py ``state_dict`` layout (f64)."""
    return {
        "mean": np.asarray(state.mean, np.float64),
        "sigma": float(state.sigma),
        "pc": np.asarray(state.pc, np.float64),
        "ps": np.asarray(state.ps, np.float64),
        "C": np.asarray(state.C, np.float64),
        "best_x": np.asarray(state.best_x, np.float64),
        "best_f": float(state.best_f),
        "counteval": int(state.counteval),
        "generation": int(state.generation),
    }


def state_from_dict(d: dict) -> CMAState:
    C = np.asarray(d["C"], np.float64)
    C = (C + C.T) / 2
    d2, B = np.linalg.eigh(C)
    D = np.sqrt(np.maximum(d2, 1e-20))
    return CMAState(
        mean=jnp.asarray(d["mean"], jnp.float32),
        sigma=jnp.asarray(float(d["sigma"]), jnp.float32),
        pc=jnp.asarray(d["pc"], jnp.float32),
        ps=jnp.asarray(d["ps"], jnp.float32),
        C=jnp.asarray(C, jnp.float32),
        B=jnp.asarray(B, jnp.float32),
        D=jnp.asarray(D, jnp.float32),
        best_x=jnp.asarray(d["best_x"], jnp.float32),
        best_f=jnp.asarray(float(d["best_f"]), jnp.float32),
        generation=jnp.asarray(int(d["generation"]), jnp.int32),
        counteval=jnp.asarray(int(d["counteval"]), jnp.int32),
    )


def _reflect01(x: jnp.ndarray) -> jnp.ndarray:
    """Reflect out-of-bounds coordinates back into [0, 1] (same bound
    handling as the host CMAES — keeps candidates feasible without the
    distribution distortion of clipping)."""
    y = x % 2.0
    return jnp.where(y > 1.0, 2.0 - y, y)


def cma_ask(state: CMAState, consts: CMAConsts, key) -> jnp.ndarray:
    z = jax.random.normal(key, (consts.lam, consts.N), jnp.float32)
    y = z @ (state.B * state.D[None, :]).T  # rows: B @ diag(D) @ z_i
    return _reflect01(state.mean[None, :] + state.sigma * y)


def cma_tell(state: CMAState, consts: CMAConsts, X: jnp.ndarray,
             fvals: jnp.ndarray) -> CMAState:
    N, lam, mu = consts.N, consts.lam, consts.mu
    counteval = state.counteval + lam
    generation = state.generation + 1

    order = jnp.argsort(fvals)
    gen_best_f = fvals[order[0]]
    gen_best_x = X[order[0]]
    improved = gen_best_f < state.best_f
    best_f = jnp.where(improved, gen_best_f, state.best_f)
    best_x = jnp.where(improved, gen_best_x, state.best_x)

    X_sel = X[order[:mu]]  # (mu, N)
    old_mean = state.mean
    mean = consts.weights @ X_sel

    y_mean = (mean - old_mean) / state.sigma
    C_inv_sqrt = state.B @ ((1.0 / state.D)[:, None] * state.B.T)
    ps = (1 - consts.cs) * state.ps + math.sqrt(
        consts.cs * (2 - consts.cs) * consts.mueff) * (C_inv_sqrt @ y_mean)

    hsig = (
        jnp.linalg.norm(ps)
        / jnp.sqrt(1 - (1 - consts.cs)
                   ** (2.0 * counteval.astype(jnp.float32) / lam))
        / consts.chiN
        < 1.4 + 2 / (N + 1)
    ).astype(jnp.float32)
    pc = (1 - consts.cc) * state.pc + hsig * math.sqrt(
        consts.cc * (2 - consts.cc) * consts.mueff) * y_mean

    artmp = (X_sel - old_mean[None, :]) / state.sigma
    C = (
        (1 - consts.c1 - consts.cmu) * state.C
        + consts.c1 * (jnp.outer(pc, pc)
                       + (1 - hsig) * consts.cc * (2 - consts.cc) * state.C)
        + consts.cmu * (artmp.T * consts.weights[None, :]) @ artmp
    )

    sigma = state.sigma * jnp.exp(
        (consts.cs / consts.damps)
        * (jnp.linalg.norm(ps) / consts.chiN - 1.0))
    sigma = jnp.minimum(sigma, 1e3)

    C = (C + C.T) / 2
    d2, B = jnp.linalg.eigh(C)
    D = jnp.sqrt(jnp.maximum(d2, 1e-20))

    return CMAState(mean, sigma, pc, ps, C, B, D, best_x, best_f,
                    generation, counteval)


class BlockStats(NamedTuple):
    """Per-generation statistics, PACKED into one array so the host pays
    exactly ONE relay round trip per k-generation block (three separate
    np.asarray fetches measured ~1 s each through the tunneled relay on
    bad days — 3 s of host stall per block)."""

    packed: jnp.ndarray  # (k, N+2) f32: [:, 0] best fitness OF each
    #                      generation, [:, 1] best-so-far AFTER each
    #                      generation, [:, 2:] best-so-far candidate


def make_block_runner(
    fitness_impl: Callable,
    consts: CMAConsts,
    k: int,
    crop_len: int | None = None,
    crop_min_start: int = 16384,
    w_sharding=None,
    lift: bool = False,
) -> Callable:
    """Build the jitted k-generation runner.

    ``fitness_impl(mparams, cparams, W, x, target_embeds,
    target_content_embeds, rng) -> fvals`` is the raw (untraced) fitness of
    engine.make_fitness_fn. When ``crop_len`` is given and the input is
    longer, each generation draws its own random crop start on device
    (reference crop semantics: st_ito/style_transfer.py:505-518 — one crop
    shared by the whole population per generation).

    With ``lift=True`` the runner takes an extra ``lift_args =
    (template (P,), start)`` argument and evaluates fitness on candidates
    embedded into the full frozen parameter vector at [start, start+N)
    (run_es opt_slice support) — passed as data, not closure, so one
    compiled runner serves every stage of a staged run.

    Returns ``run(state, mparams, cparams, x, target_embeds,
    target_content_embeds, key[, lift_args]) -> (state, BlockStats)``;
    jitted, one device dispatch per call.
    """

    def run(state, mparams, cparams, x, target_embeds,
            target_content_embeds, key, lift_args=None):
        T = x.shape[-1]
        do_crop = crop_len is not None and T > crop_len

        def gen_step(carry, key_g):
            st = carry
            key_ask, key_crop, key_fit = jax.random.split(key_g, 3)
            W = cma_ask(st, consts, key_ask)
            if w_sharding is not None:  # population axis over the mesh
                W = jax.lax.with_sharding_constraint(W, w_sharding)
            W_eval = W
            if lift:
                template, start0 = lift_args
                Wf = jnp.tile(template[None, :], (consts.lam, 1))
                W_eval = jax.lax.dynamic_update_slice(
                    Wf, W, (jnp.asarray(0, jnp.int32), start0))
            if do_crop:
                lo = min(crop_min_start, T - crop_len)
                start = jax.random.randint(key_crop, (), lo, T - crop_len)
                xe = jax.lax.dynamic_slice_in_dim(x, start, crop_len, axis=-1)
            else:
                xe = x
            fvals = fitness_impl(mparams, cparams, W_eval, xe, target_embeds,
                                 target_content_embeds, key_fit)
            st = cma_tell(st, consts, W, fvals.astype(jnp.float32))
            row = jnp.concatenate([
                jnp.min(fvals).astype(jnp.float32)[None],
                st.best_f[None], st.best_x])
            return st, row

        keys = jax.random.split(key, k)
        state, packed = jax.lax.scan(gen_step, state, keys)
        return state, BlockStats(packed)

    return jax.jit(run)
