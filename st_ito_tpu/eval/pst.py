"""Production Style Transfer (PST) benchmark: methods x metrics with timing.

For every (input, target) example each method produces an output; quality is
the mean cosine similarity of style embeddings between output and target,
with wall-clock per method recorded, outputs normalized to -22 LUFS and
written alongside a timestamped results JSON
(reference: scripts/eval/eval_pst.py:652-903).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from st_ito_tpu.eval.metrics import style_similarity
from st_ito_tpu.ops.loudness import loudness_normalize
from st_ito_tpu.ops.waveshape import fade_in
from st_ito_tpu.utils import save_audio

_fade_jit = jax.jit(fade_in, static_argnames=("num_samples",))
_loudnorm_jit = jax.jit(loudness_normalize,
                        static_argnames=("sample_rate", "target_lufs"))


def run_pst_benchmark(
    examples: list[dict],
    methods: dict,
    metrics: dict,
    sample_rate: int = 48000,
    output_dir: str | None = None,
    target_lufs: float = -22.0,
    fade_samples: int = 32768,
) -> dict:
    """examples: [{"name", "input" (C,T) np, "target" (C,T) np}];
    methods: name -> {"func": callable(input, target, sr) -> result dict,
                      "kwargs": {...}};
    metrics: name -> (model, embed_func).
    """
    results: dict = {}
    for ex in examples:
        name = ex["name"]
        x = jnp.asarray(ex["input"])[None]  # (1, C, T)
        y = jnp.asarray(ex["target"])[None]
        if fade_samples:
            x = _fade_jit(x, num_samples=fade_samples)
            y = _fade_jit(y, num_samples=fade_samples)

        target_embeds = {
            m: embed_func(y, model, sample_rate)
            for m, (model, embed_func) in metrics.items()
        }

        results[name] = {}
        for method_name, method in methods.items():
            t0 = time.time()
            out = method["func"](x, y, sample_rate, **method.get("kwargs", {}))
            elapsed = time.time() - t0

            output_audio = out["output_audio"]
            if output_audio.shape[1] == 1 and x.shape[1] == 2:
                output_audio = jnp.concatenate([output_audio] * 2, axis=1)

            entry = {"time_elapsed": elapsed}
            for m, (model, embed_func) in metrics.items():
                out_embeds = embed_func(output_audio, model, sample_rate)
                sim = style_similarity(out_embeds, target_embeds[m])
                entry[f"{m}_sim"] = float(np.asarray(sim).mean())
            if "params" in out:
                entry["params"] = out["params"]
            results[name][method_name] = entry

            if output_dir:
                ex_dir = os.path.join(output_dir, name)
                os.makedirs(ex_dir, exist_ok=True)
                norm = _loudnorm_jit(output_audio, sample_rate=sample_rate,
                                     target_lufs=target_lufs)
                save_audio(os.path.join(ex_dir, f"{method_name}.wav"),
                           np.asarray(norm[0]), sample_rate)

        if output_dir:
            ex_dir = os.path.join(output_dir, name)
            os.makedirs(ex_dir, exist_ok=True)
            for tag, sig in (("input", x), ("target", y)):
                norm = _loudnorm_jit(sig, sample_rate=sample_rate,
                                     target_lufs=target_lufs)
                save_audio(os.path.join(ex_dir, f"{tag}.wav"),
                           np.asarray(norm[0]), sample_rate)

    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        stamp = time.strftime("%Y%m%d-%H%M%S")
        with open(os.path.join(output_dir, f"results_{stamp}.json"), "w") as f:
            json.dump(results, f, indent=2, default=float)
    return results


def default_methods(chain, model, embed_func, popsize=128, max_iters=32,
                    sigma0=0.33, seed=0, style_systems: dict | None = None,
                    gens_per_dispatch: int = 1):
    """The reference benchmark's method set (reference: eval_pst.py:944-1012):
    input / random / rule-based / deepafx-st / deepafx-st+ / style-es.

    ``style_systems``: {"deepafx-st": (system, state), "deepafx-st+":
    (system, state)} — trained StyleTransferSystems for the learned-inference
    baselines (the reference loads two pretrained Lightning checkpoints,
    eval_pst.py:957-973; here any locally trained system, e.g. from
    examples/pst_full_demo.py, fills the same roles). Omitted entries are
    skipped, mirroring how the reference benchmark is gated on its
    checkpoint paths being reachable."""
    from st_ito_tpu.ito import (
        run_es,
        run_input,
        run_learned_inference,
        run_random,
        run_rule_based,
    )

    methods = {
        "input": {"func": lambda x, y, sr: run_input(x, y, sr)},
        "random": {"func": lambda x, y, sr: run_random(x, y, sr, chain, model,
                                                       seed=seed)},
        "rule-based": {"func": lambda x, y, sr: run_rule_based(x, y, sr)},
    }
    for name, (system, state) in (style_systems or {}).items():
        methods[name] = {
            "func": lambda x, y, sr, _s=system, _t=state:
                run_learned_inference(x, y, sr, _s, _t)
        }
    methods["style-es"] = {
        "func": lambda x, y, sr: run_es(
            x, y, sr, chain, model, embed_func=embed_func,
            max_iters=max_iters, popsize=popsize, sigma0=sigma0,
            random_crop=True, find_w0=False, seed=seed, verbose=False,
            gens_per_dispatch=gens_per_dispatch,
        )
    }
    return methods
