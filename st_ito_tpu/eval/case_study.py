"""Single-parameter recovery case study.

Sweep one parameter to create a target at a known value, then check whether
the metric's distance curve over the sweep is minimized at (or near) the true
value — i.e. whether ITO *can* recover it
(reference: scripts/eval/eval_case_study.py:31-120).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from st_ito_tpu.chain import EFFECT_REGISTRY, ChainSpec
from st_ito_tpu.chain.executor import build_render_fn
from st_ito_tpu.eval.metrics import style_similarity


def parameter_recovery_curve(
    x: jnp.ndarray,
    effect_name: str,
    param_name: str,
    target_value: float,
    model,
    embed_func,
    sample_rate: int = 48000,
    num_steps: int = 21,
) -> dict:
    """Returns sweep values, similarity-to-target curve, argmax value and
    recovery error |argmax - target|."""
    chain = ChainSpec(stages=(EFFECT_REGISTRY[effect_name](),), with_bypass=False)
    render = jax.jit(build_render_fn(chain, sample_rate, x.shape[0]))
    stage = chain.stages[0]
    pidx = stage.param_names.index(param_name)
    w0 = np.asarray(chain.init_params())

    w_t = w0.copy()
    w_t[pidx] = target_value
    target = render(jnp.asarray(w_t, jnp.float32), x)
    target_embeds = embed_func(target[None], model, sample_rate)

    values = np.linspace(0.0, 1.0, num_steps)
    outs = []
    for v in values:
        w = w0.copy()
        w[pidx] = v
        outs.append(np.asarray(render(jnp.asarray(w, jnp.float32), x)))
    embeds = embed_func(jnp.asarray(np.stack(outs)), model, sample_rate)
    sims = np.asarray(style_similarity(embeds, target_embeds))

    best = float(values[int(np.argmax(sims))])
    return {
        "values": values.tolist(),
        "similarities": sims.tolist(),
        "target_value": float(target_value),
        "recovered_value": best,
        "recovery_error": abs(best - target_value),
    }
