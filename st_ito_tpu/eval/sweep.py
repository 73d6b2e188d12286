"""Metric monotonicity sweep: sweep one effect parameter, check the metric
distance grows monotonically with parameter distance
(reference: scripts/eval/eval_sweep.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from st_ito_tpu.chain import EFFECT_REGISTRY, ChainSpec
from st_ito_tpu.chain.executor import build_render_fn
from st_ito_tpu.eval.metrics import style_similarity


def sweep_parameter(
    x: jnp.ndarray,
    effect_name: str,
    param_name: str,
    model,
    embed_func,
    sample_rate: int = 48000,
    num_steps: int = 11,
) -> dict:
    """x: (2, T). Sweeps param over [0, 1]; similarity measured to the
    render at the sweep minimum. Returns values + similarities +
    Spearman-like monotonicity score."""
    chain = ChainSpec(stages=(EFFECT_REGISTRY[effect_name](),), with_bypass=False)
    render = jax.jit(build_render_fn(chain, sample_rate, 2))
    stage = chain.stages[0]
    pidx = stage.param_names.index(param_name)

    w0 = np.asarray(chain.init_params())
    values = np.linspace(0.0, 1.0, num_steps)
    outs = []
    for v in values:
        w = w0.copy()
        w[pidx] = v
        outs.append(np.asarray(render(jnp.asarray(w, jnp.float32), x)))
    batch = jnp.asarray(np.stack(outs))
    embeds = embed_func(batch, model, sample_rate)
    ref = {k: v[0:1] for k, v in embeds.items()}
    sims = np.asarray(style_similarity(embeds, ref))

    # monotonicity: rank correlation between parameter distance and 1 - sim
    d_param = values - values[0]
    d_metric = 1.0 - sims
    rho = _spearman(d_param[1:], d_metric[1:])
    return {
        "values": values.tolist(),
        "similarities": sims.tolist(),
        "monotonicity": float(rho),
    }


def _spearman(a: np.ndarray, b: np.ndarray) -> float:
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean()
    rb -= rb.mean()
    denom = np.sqrt((ra**2).sum() * (rb**2).sum())
    if denom < 1e-12:
        return 0.0
    return float((ra * rb).sum() / denom)
