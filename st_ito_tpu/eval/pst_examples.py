"""PST benchmark example sets: curated real pairs, contrived styled pairs,
and a self-contained synthetic fallback.

Mirrors the reference's example curation
(reference: scripts/eval/eval_pst.py:116-203):

- real examples: 10 curated (input, target) wav pairs per mode with 4
  "active" indices actually used by the benchmark; files come from the
  YouTube benchmark dataset (scripts/benchmark_download.py builds it from
  pst_benchmark.csv).
- contrived examples: DAPS (speech) / MUSDB (music) sources rendered to the
  four production styles, paired neutral -> styled
  (reference: eval_pst.py:116-139).
- synthetic fallback: the same four styles rendered with the native chain
  (eval/cls.py render_style) on any provided audio — self-contained for
  offline environments where neither dataset exists.
"""

from __future__ import annotations

import os

import numpy as np

# (input, target) wav pairs per mode + the benchmark's active indices
# (reference: scripts/eval/eval_pst.py:142-203).
REAL_EXAMPLES: dict[str, tuple[list[tuple[str, str]], list[int]]] = {
    "speech": ([
        ("speech/0YY7K7Xa5rE.wav", "speech/ASU_wpcB-1I.wav"),
        ("speech/GqPGXG5TlZw.wav", "speech/bPYtvBDMoT8.wav"),
        ("speech/Hd9pHZC7Sak.wav", "speech/sNDyQ5wdV7Y.wav"),
        ("speech/kCc8FmEb1nY.wav", "speech/-QqTwJzi7Wo.wav"),
        ("speech/njqx9QHqQnI.wav", "speech/rp18gXVZiws.wav"),
        ("speech/VkBEQDYCpeo.wav", "speech/KmHe_QUCATQ.wav"),
        ("speech/dtp6b76pMak.wav", "speech/505UazMNgLg.wav"),
        ("speech/tI0uvIgh3e8.wav", "speech/DxOIZ4sOQAw.wav"),
        ("speech/YxLm0jmazq8.wav", "speech/nyxcO2vdcCg.wav"),
        ("speech/6PZGOzYUMh4.wav", "speech/4aSHovdnCyY.wav"),
    ], [0, 1, 4, 5]),
    "guitar": ([
        ("guitar/q7dd3PAUpqE.wav", "guitar/1MxfbKkX7Zg.wav"),
        ("guitar/q7dd3PAUpqE.wav", "guitar/5Az0vI2kU8o.wav"),
        ("guitar/9uH5GvurJYc.wav", "guitar/8-lQhm67ZxE.wav"),
        ("guitar/DPGanZQH6L4.wav", "guitar/8_tM8HPkR5w.wav"),
        ("guitar/YDiUYW8gPbE.wav", "guitar/KqNrQw_Ne8w.wav"),
        ("guitar/4cH_Q-uqJhU.wav", "guitar/7Mv-Et66FS4.wav"),
        ("guitar/_xybjiuD9K0.wav", "guitar/DPGanZQH6L4.wav"),
        ("guitar/MmUX2ZKhn_Q.wav", "guitar/KqNrQw_Ne8w.wav"),
        ("guitar/BLrJSfrgYGI.wav", "guitar/ko8G5hkGqvc.wav"),
        ("guitar/Fwnj5n1SdxY.wav", "guitar/wglmFyQPL4o.wav"),
    ], [0, 2, 3, 4]),
    "vocals": ([
        ("vocals/I_QWegHp-r0.wav", "vocals/-o_MW5vifL8.wav"),
        ("vocals/n8cRTh4GEYg.wav", "vocals/CI2a5BxEIV0.wav"),
        ("vocals/IyJ34F3tjG0.wav", "vocals/UGiEw22GI-4.wav"),
        ("vocals/PGS0UvbCwGk.wav", "vocals/U1kifTk5xsU.wav"),
        ("vocals/QP37fZmj-XY.wav", "vocals/CI2a5BxEIV0.wav"),
        ("vocals/ScQISlpnjoQ.wav", "vocals/-o_MW5vifL8.wav"),
        ("vocals/Slhrbuil8Yo.wav", "vocals/w1vxWWD1j50.wav"),
        ("vocals/U1kifTk5xsU.wav", "vocals/w1vxWWD1j50.wav"),
        ("vocals/UKyuxmgir2w.wav", "vocals/uOWK-ArhziU.wav"),
        ("vocals/uOWK-ArhziU.wav", "vocals/Wbuj60Ew2p4.wav"),
    ], [0, 2, 3, 9]),
    "music": ([
        ("music/wXhTHyIgQ_U.wav", "music/PAa2KuxXSYw.wav"),
        ("music/TUVcZfQe-Kw.wav", "music/qku2WZ7aRYw.wav"),
        ("music/1JNmz17gnMw.wav", "music/R-MSfd2S7lo.wav"),
        ("music/UqyT8IEBkvY.wav", "music/TUVcZfQe-Kw.wav"),
        ("music/wXhTHyIgQ_U.wav", "music/UqyT8IEBkvY.wav"),
        ("music/ylXk1LBvIqU.wav", "music/ORxKWb8kKz8.wav"),
        ("music/7nJRGARveVc.wav", "music/1JNmz17gnMw.wav"),
        ("music/HAIDqt2aUek.wav", "music/dhNfddJRulQ.wav"),
        ("music/HMO-gn2qrnc.wav", "music/HAIDqt2aUek.wav"),
        ("music/IL-6hwW4ViA.wav", "music/LwHWGnhg3o4.wav"),
    ], [5, 6, 7, 8]),
}

CONTRIVED_STYLES = ("bright", "broadcast", "telephone", "warm")

# chain type per benchmark run (reference runs the "general" chain for all
# modes, eval_pst.py:1028-1033; per-content chains exist in get_plugins
# :206-649 and map to chain_preset names here).
MODE_CHAINS = {
    "speech": "speech",
    "guitar": "guitar",
    "vocals": "vocals",
    "music": "mastering",
    "general": "general",
}


def _conform(audio: np.ndarray, sr: int, sample_rate: int,
             max_length: int | None):
    """(C, T) float32 at ``sample_rate``, stereo, optionally truncated."""
    import jax.numpy as jnp

    from st_ito_tpu.ops.resample import resample

    if audio.ndim == 1:
        audio = audio[None]
    if sr != sample_rate:
        audio = np.asarray(resample(jnp.asarray(audio), sr, sample_rate))
    if audio.shape[0] == 1:
        audio = np.concatenate([audio, audio], axis=0)
    if max_length and audio.shape[-1] > max_length:
        audio = audio[..., :max_length]
    return audio.astype(np.float32)


def load_real_examples(
    root_dir: str,
    mode: str,
    all_examples: bool = False,
    sample_rate: int = 48000,
    max_length: int | None = None,
) -> list[dict]:
    """Load the curated real pairs for ``mode`` from the benchmark dataset
    directory (built by scripts/benchmark_download.py). Returns run_pst
    examples [{"name", "input", "target"}]; only the benchmark's active
    indices unless all_examples (reference: eval_pst.py:142-203)."""
    from st_ito_tpu.utils import load_audio

    pairs, indices = REAL_EXAMPLES[mode]
    chosen = range(len(pairs)) if all_examples else indices
    examples = []
    for i in chosen:
        in_rel, tgt_rel = pairs[i]
        x, sr_x = load_audio(os.path.join(root_dir, in_rel))
        y, sr_y = load_audio(os.path.join(root_dir, tgt_rel))
        examples.append({
            "name": f"{mode}_{i}",
            "input": _conform(x, sr_x, sample_rate, max_length),
            "target": _conform(y, sr_y, sample_rate, max_length),
        })
    return examples


def contrived_example_paths(mode: str, root_dir: str,
                            index_range=range(80, 100)) -> list[tuple[str, str]]:
    """(neutral, styled) path pairs following the reference's directory
    convention (reference: eval_pst.py:116-139)."""
    if mode == "music":
        dataset_name, sub = "musdb18_44100", "musdb18_44100_styles_100/test"
    elif mode == "speech":
        dataset_name, sub = "cleanraw", "daps_24000_styles_100/test"
    else:
        raise ValueError(f"Unknown contrived mode: {mode}")
    pairs = []
    base = f"{dataset_name}_test.wav"
    for style in CONTRIVED_STYLES:
        for n in index_range:
            pairs.append((
                os.path.join(root_dir, sub, "neutral", f"{n:03d}_neutral_{base}"),
                os.path.join(root_dir, sub, style, f"{n:03d}_{style}_{base}"),
            ))
    return pairs


def load_contrived_examples(root_dir: str, mode: str,
                            sample_rate: int = 48000,
                            max_length: int | None = None,
                            index_range=range(80, 100)) -> list[dict]:
    from st_ito_tpu.utils import load_audio

    examples = []
    for in_path, tgt_path in contrived_example_paths(mode, root_dir,
                                                     index_range):
        x, sr_x = load_audio(in_path)
        y, sr_y = load_audio(tgt_path)
        style = os.path.basename(os.path.dirname(tgt_path))
        n = os.path.basename(tgt_path).split("_")[0]
        examples.append({
            "name": f"{mode}_{style}_{n}",
            "input": _conform(x, sr_x, sample_rate, max_length),
            "target": _conform(y, sr_y, sample_rate, max_length),
        })
    return examples


def synthesize_contrived_examples(
    sources,
    sample_rate: int = 48000,
    styles=CONTRIVED_STYLES,
) -> list[dict]:
    """Self-contained contrived set: render each (C, T) source to each of
    the four production styles with the native chain (the same styles the
    reference's dataset was rendered with; eval/cls.py render_style) and
    pair neutral input -> styled target."""
    import jax.numpy as jnp

    from st_ito_tpu.eval.cls import render_style

    examples = []
    for i, src in enumerate(sources):
        x = jnp.asarray(np.asarray(src, np.float32))
        if x.shape[0] == 1:
            x = jnp.concatenate([x, x], axis=0)
        for style in styles:
            y = render_style(x, style, sample_rate)
            peak = jnp.max(jnp.abs(y))
            y = y / jnp.maximum(peak, 1e-8) * 0.9
            examples.append({
                "name": f"synthetic_{style}_{i}",
                "input": np.asarray(x),
                "target": np.asarray(y),
            })
    return examples


def benchmark_chain(mode_or_type: str, with_bypass: bool = True):
    """Chain for a benchmark run: a MODE_CHAINS key or a chain_preset name
    (reference: eval_pst.py:206-649 get_plugins)."""
    from st_ito_tpu.chain import chain_preset

    name = MODE_CHAINS.get(mode_or_type, mode_or_type)
    return chain_preset(name, with_bypass=with_bypass)
