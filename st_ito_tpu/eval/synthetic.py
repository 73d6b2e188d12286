"""Synthetic known-target evaluation + objective scoring.

Targets rendered from known parameters at easy/medium/hard difficulty; each
method's output is scored with MRSTFT + style similarity against the target
(reference: scripts/eval/eval_synthetic.py:57-145, eval_obj.py:14-88).
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from st_ito_tpu.chain import ChainSpec, build_render_fn
from st_ito_tpu.eval.metrics import style_similarity
from st_ito_tpu.ops.losses import multi_resolution_stft_loss


def make_synthetic_cases(
    chain: ChainSpec,
    x: jnp.ndarray,
    sample_rate: int = 48000,
    seed: int = 0,
) -> list[dict]:
    """Easy/medium/hard x2: targets rendered from known parameter vectors
    whose distance from the chain defaults increases with difficulty."""
    rng = np.random.default_rng(seed)
    render = jax.jit(build_render_fn(chain, sample_rate, x.shape[0]))
    w0 = np.asarray(chain.init_params())
    cases = []
    for difficulty, scale in (("easy", 0.15), ("medium", 0.3), ("hard", 0.5)):
        for rep in range(2):
            w = np.clip(w0 + rng.uniform(-scale, scale, w0.shape), 0, 1)
            y = render(jnp.asarray(w, jnp.float32), x)
            cases.append({
                "name": f"{difficulty}_{rep}",
                "difficulty": difficulty,
                "w_target": w,
                "target": np.asarray(y),
            })
    return cases


def evaluate_outputs(
    outputs: dict,
    target: jnp.ndarray,
    model,
    embed_func,
    sample_rate: int = 48000,
) -> dict:
    """outputs: method -> (1, C, T). Returns per-method
    {mrstft, style_sim} (reference: eval_obj.py:14-88)."""
    t = jnp.asarray(target)[None]
    target_embeds = embed_func(t, model, sample_rate)
    mrstft_jit = jax.jit(multi_resolution_stft_loss)
    results = {}
    for name, y in outputs.items():
        y = jnp.asarray(y)
        mrstft = float(mrstft_jit(y, t))
        e = embed_func(y, model, sample_rate)
        sim = float(np.asarray(style_similarity(e, target_embeds)).mean())
        results[name] = {"mrstft": mrstft, "style_sim": sim}
    return results


def run_synthetic_benchmark(
    chain: ChainSpec,
    x: jnp.ndarray,
    methods: dict,
    model,
    embed_func,
    sample_rate: int = 48000,
    out_path: str | None = None,
    seed: int = 0,
) -> dict:
    cases = make_synthetic_cases(chain, x, sample_rate, seed)
    results = {}
    for case in cases:
        target = jnp.asarray(case["target"])[None]
        outputs = {}
        for mname, method in methods.items():
            out = method["func"](x[None], target, sample_rate,
                                 **method.get("kwargs", {}))
            outputs[mname] = out["output_audio"]
        results[case["name"]] = evaluate_outputs(outputs, case["target"],
                                                 model, embed_func, sample_rate)
        results[case["name"]]["w_target"] = case["w_target"].tolist()
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2, default=float)
    return results
