"""Production Style Metric (PSM) benchmark: quadruplet ranking.

Given (ref, a, b, c, ...) where ``a`` shares the reference's production
style (same effect + parameters on different content) and the others are
distractors, a metric scores a hit when it ranks ``a`` closest to ``ref``
by cosine; accuracy is swept over the number of distractors
(reference: scripts/eval/eval_psm.py:87-154).

Includes a native quadruplet generator standing in for the reference's
pedalboard grid datagen (reference: scripts/data/vst_datagen_psm_pedalboard.py).
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from st_ito_tpu.chain import EFFECT_REGISTRY, ChainSpec
from st_ito_tpu.chain.executor import build_render_fn
from st_ito_tpu.eval.metrics import style_similarity


def generate_psm_quadruplets(
    audio_sources: list[np.ndarray],
    effect_names: list[str] | None = None,
    num_examples: int = 32,
    num_distractors: int = 3,
    length: int = 65536,
    sample_rate: int = 48000,
    seed: int = 0,
    condition: str = "intra-effect",  # or "inter-effect"
):
    """Returns list of dicts {ref, candidates (first is correct), meta}."""
    if effect_names is None:
        effect_names = ["parametric_eq", "compressor", "distortion", "reverb"]
    rng = np.random.default_rng(seed)

    renders = {}
    for name in effect_names:
        chain = ChainSpec(stages=(EFFECT_REGISTRY[name](),), with_bypass=False)
        renders[name] = (
            chain,
            jax.jit(build_render_fn(chain, sample_rate, 2,
                                    peak_normalize_output=True)),
        )

    def crop(audio):
        C, T = audio.shape
        s = int(rng.integers(0, max(T - length, 1)))
        out = audio[:, s:s + length]
        if out.shape[-1] < length:
            out = np.pad(out, ((0, 0), (0, length - out.shape[-1])))
        if out.shape[0] == 1:
            out = np.repeat(out, 2, axis=0)
        return jnp.asarray(out)

    examples = []
    for _ in range(num_examples):
        name = effect_names[int(rng.integers(0, len(effect_names)))]
        chain, render = renders[name]
        w_style = jnp.asarray(rng.random(chain.num_params).astype(np.float32))

        src_ref, src_other = rng.choice(len(audio_sources), 2, replace=True)
        x_ref = crop(audio_sources[src_ref])
        x_other = crop(audio_sources[src_other])

        ref = render(w_style, x_ref)
        correct = render(w_style, x_other)

        distractors = []
        for _ in range(num_distractors):
            if condition == "inter-effect":
                dname = effect_names[int(rng.integers(0, len(effect_names)))]
                dchain, drender = renders[dname]
                w_d = jnp.asarray(rng.random(dchain.num_params).astype(np.float32))
                distractors.append(drender(w_d, x_other))
            else:
                w_d = jnp.asarray(rng.random(chain.num_params).astype(np.float32))
                distractors.append(render(w_d, x_other))

        examples.append({
            "ref": np.asarray(ref),
            "candidates": [np.asarray(correct)] + [np.asarray(d) for d in distractors],
            "effect": name,
        })
    return examples


def evaluate_metric_on_quadruplets(
    examples: list[dict],
    model,
    embed_func,
    sample_rate: int = 48000,
    max_distractors: int | None = None,
) -> dict:
    """Accuracy vs number of distractors
    (reference: eval_psm.py evaluate_model:87-154)."""
    n_cand = len(examples[0]["candidates"])
    max_d = max_distractors or (n_cand - 1)
    correct_by_d = {d: 0 for d in range(1, max_d + 1)}

    for ex in examples:
        batch = jnp.asarray(np.stack([ex["ref"]] + ex["candidates"]))
        embeds = embed_func(batch, model, sample_rate)
        ref_e = {k: v[0:1] for k, v in embeds.items()}
        cand_e = {k: v[1:] for k, v in embeds.items()}
        sims = np.asarray(style_similarity(cand_e, ref_e))
        for d in range(1, max_d + 1):
            subset = sims[: d + 1]  # correct + d distractors
            if int(np.argmax(subset)) == 0:
                correct_by_d[d] += 1

    n = len(examples)
    return {
        "accuracy_by_distractors": {d: c / n for d, c in correct_by_d.items()},
        "num_examples": n,
    }


def save_quadruplets_to_disk(examples: list[dict], out_dir: str,
                             sample_rate: int = 48000) -> None:
    """Write quadruplets as per-example directories of ref/a/b/c... wavs —
    the reference's on-disk PSM format (reference: eval_psm.py:87-154 reads
    such directories)."""
    from st_ito_tpu.utils import save_audio

    for i, ex in enumerate(examples):
        ex_dir = os.path.join(out_dir, f"{ex.get('effect', 'ex')}_{i:04d}")
        os.makedirs(ex_dir, exist_ok=True)
        save_audio(os.path.join(ex_dir, "ref.wav"), ex["ref"], sample_rate)
        for ci, cand in enumerate(ex["candidates"]):
            name = chr(ord("a") + ci)
            save_audio(os.path.join(ex_dir, f"{name}.wav"), cand, sample_rate)


def load_quadruplets_from_disk(root_dir: str) -> list[dict]:
    """Read per-example directories of ref.wav + a/b/c... candidate wavs
    ('a' is the true match, like the reference's layout)."""
    import glob

    from st_ito_tpu.utils import load_audio

    examples = []
    for ex_dir in sorted(glob.glob(os.path.join(root_dir, "*"))):
        ref_path = os.path.join(ex_dir, "ref.wav")
        if not os.path.isfile(ref_path):
            continue
        ref, _ = load_audio(ref_path)
        candidates = []
        for cand_path in sorted(glob.glob(os.path.join(ex_dir, "[a-z].wav"))):
            audio, _ = load_audio(cand_path)
            candidates.append(audio)
        if candidates:
            examples.append({
                "ref": ref, "candidates": candidates,
                "effect": os.path.basename(ex_dir).rsplit("_", 1)[0],
            })
    return examples


def run_psm_benchmark(
    audio_sources,
    metrics: dict,
    out_path: str | None = None,
    num_examples: int = 32,
    num_distractors: int = 3,
    sample_rate: int = 48000,
    seed: int = 0,
) -> dict:
    """metrics: name -> (model, embed_func). Returns results per metric and
    condition."""
    results = {}
    for condition in ("intra-effect", "inter-effect"):
        examples = generate_psm_quadruplets(
            audio_sources, num_examples=num_examples,
            num_distractors=num_distractors, sample_rate=sample_rate,
            seed=seed, condition=condition,
        )
        results[condition] = {}
        for name, (model, embed_func) in metrics.items():
            results[condition][name] = evaluate_metric_on_quadruplets(
                examples, model, embed_func, sample_rate)
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2, default=float)
    return results
