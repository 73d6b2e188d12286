"""Style classification evaluation: linear probe + zero-shot nearest
reference (reference: scripts/eval/eval_cls.py:92-332).

Styles are production styles (e.g. neutral/warm/bright/broadcast/telephone),
represented here as parameter settings of the native chain so the benchmark
is self-contained without the reference's rendered dataset.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax

from st_ito_tpu.ops.eq import parametric_eq
from st_ito_tpu.ops.dynamics import compressor
from st_ito_tpu.ops.iir import apply_iir_fsm, biquad_coeffs

# ------------- style renderers (bright/warm/broadcast/telephone) -----------


from functools import partial


@partial(jax.jit, static_argnames=("style", "sample_rate"))
def render_style(x: jnp.ndarray, style: str, sample_rate: int) -> jnp.ndarray:
    """Apply one of the five reference styles to (C, T) audio."""
    if style == "neutral":
        return x
    if style == "bright":
        return parametric_eq(x, sample_rate, high_shelf_gain_db=12.0,
                             high_shelf_cutoff_freq=4000.0,
                             low_shelf_gain_db=-4.0)
    if style == "warm":
        return parametric_eq(x, sample_rate, low_shelf_gain_db=8.0,
                             low_shelf_cutoff_freq=200.0,
                             high_shelf_gain_db=-8.0,
                             high_shelf_cutoff_freq=4000.0)
    if style == "broadcast":
        y = compressor(x, sample_rate, threshold_db=-30.0, ratio=8.0,
                       attack_ms=5.0, release_ms=100.0, knee_db=3.0,
                       makeup_gain_db=12.0)
        return jnp.tanh(y)
    if style == "telephone":
        b_hp, a_hp = biquad_coeffs(0.0, 300.0, 0.707, sample_rate, "highpass")
        b_lp, a_lp = biquad_coeffs(0.0, 3400.0, 0.707, sample_rate, "lowpass")
        b = jnp.stack([b_hp, b_lp])
        a = jnp.stack([a_hp, a_lp])
        return apply_iir_fsm(x, b, a)
    raise ValueError(f"unknown style: {style}")


STYLES = ("neutral", "warm", "bright", "broadcast", "telephone")


def make_style_dataset(audio_sources, sample_rate=48000, per_style=8,
                       length=65536, seed=0):
    """Returns (clips (N, 2, T), labels (N,))."""
    rng = np.random.default_rng(seed)
    clips, labels = [], []
    for si, style in enumerate(STYLES):
        for _ in range(per_style):
            src = audio_sources[int(rng.integers(0, len(audio_sources)))]
            C, T = src.shape
            s = int(rng.integers(0, max(T - length, 1)))
            x = src[:, s:s + length]
            if x.shape[-1] < length:
                x = np.pad(x, ((0, 0), (0, length - x.shape[-1])))
            if x.shape[0] == 1:
                x = np.repeat(x, 2, axis=0)
            y = np.asarray(render_style(jnp.asarray(x), style, sample_rate))
            y = y / max(np.abs(y).max(), 1e-8)
            clips.append(y)
            labels.append(si)
    return np.stack(clips), np.asarray(labels)


def _embed_all(clips, model, embed_func, sample_rate, batch=8):
    embeds = []
    for s in range(0, len(clips), batch):
        e = embed_func(jnp.asarray(clips[s:s + batch]), model, sample_rate)
        embeds.append(np.concatenate([np.asarray(v) for v in e.values()], axis=-1))
    return np.concatenate(embeds)


def run_zero_shot_task(clips, labels, model, embed_func, sample_rate=48000,
                       num_refs: int = 1, seed: int = 0) -> float:
    """Nearest-reference classification
    (reference: eval_cls.py:236-332)."""
    rng = np.random.default_rng(seed)
    E = _embed_all(clips, model, embed_func, sample_rate)
    E = E / np.maximum(np.linalg.norm(E, axis=-1, keepdims=True), 1e-12)

    n_styles = labels.max() + 1
    ref_idx = []
    for s in range(n_styles):
        members = np.where(labels == s)[0]
        ref_idx.extend(rng.choice(members, num_refs, replace=False))
    ref_idx = np.asarray(ref_idx)
    refs = E[ref_idx].reshape(n_styles, num_refs, -1).mean(axis=1)

    query = np.setdiff1d(np.arange(len(labels)), ref_idx)
    sims = E[query] @ refs.T
    preds = np.argmax(sims, axis=-1)
    return float((preds == labels[query]).mean())


def run_probe_task(clips, labels, model, embed_func, sample_rate=48000,
                   train_frac: float = 0.7, steps: int = 300,
                   lr: float = 1e-2, seed: int = 0) -> float:
    """Linear probe on frozen embeddings
    (reference: eval_cls.py:192-233)."""
    rng = np.random.default_rng(seed)
    E = _embed_all(clips, model, embed_func, sample_rate)
    n = len(labels)
    perm = rng.permutation(n)
    n_train = int(n * train_frac)
    tr, te = perm[:n_train], perm[n_train:]

    n_classes = int(labels.max() + 1)
    W = jnp.zeros((E.shape[-1], n_classes))
    b = jnp.zeros(n_classes)
    X_tr = jnp.asarray(E[tr])
    y_tr = jnp.asarray(labels[tr])

    opt = optax.adam(lr)
    opt_state = opt.init((W, b))

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            W, b = p
            logits = X_tr @ W + b
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y_tr).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state

    params = (W, b)
    for _ in range(steps):
        params, opt_state = step(params, opt_state)

    W, b = params
    logits = jnp.asarray(E[te]) @ W + b
    preds = np.asarray(jnp.argmax(logits, axis=-1))
    return float((preds == labels[te]).mean())
