"""Metric registry for the eval harness.

Each metric is (load_fn, embed_fn) exactly like the reference's utils.py
loader/embed pairs; ``style_similarity`` is the mean cosine over embedding
heads used to score outputs against targets
(reference: scripts/eval/eval_pst.py:796-827).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from st_ito_tpu.features import get_mir_feature_embeds, load_mir_feature_extractor
from st_ito_tpu.models.registry import (
    get_mfcc_feature_embeds,
    get_param_embeds,
    load_mfcc_feature_extractor,
    load_param_model,
)

def _load_fx_encoder():
    from st_ito_tpu.models.encoders import load_fx_encoder_model

    return load_fx_encoder_model(
        ckpt_path="checkpoints/FXencoder_ps.pt", allow_random=False)


def _get_fx_encoder_embeds(x, model, sample_rate, **kw):
    from st_ito_tpu.models.encoders import get_fx_encoder_embeds

    return get_fx_encoder_embeds(x, model, sample_rate, **kw)


def _load_beats():
    from st_ito_tpu.models.beats import load_beats_model

    return load_beats_model(ckpt_path="checkpoints/BEATs_iter3_plus_AS2M.pt")


def _get_beats_embeds(x, model, sample_rate, **kw):
    from st_ito_tpu.models.beats import get_beats_embeds

    return get_beats_embeds(x, model, sample_rate, **kw)


def _load_wav2vec2():
    from st_ito_tpu.models.registry import load_wav2vec2_model

    return load_wav2vec2_model()


def _get_wav2vec2_embeds(x, model, sample_rate, **kw):
    from st_ito_tpu.models.registry import get_wav2vec2_embeds

    return get_wav2vec2_embeds(x, model, sample_rate, **kw)


def _load_clap():
    from st_ito_tpu.models.registry import load_clap_model

    return load_clap_model()


def _get_clap_embeds(x, model, sample_rate, **kw):
    from st_ito_tpu.models.registry import get_clap_embeds

    return get_clap_embeds(x, model, sample_rate, **kw)


def _load_wav2clip():
    from st_ito_tpu.models.registry import load_wav2clip_model

    return load_wav2clip_model()


def _get_wav2clip_embeds(x, model, sample_rate, **kw):
    from st_ito_tpu.models.registry import get_wav2clip_embeds

    return get_wav2clip_embeds(x, model, sample_rate, **kw)


def _load_vggish():
    from st_ito_tpu.models.registry import load_vggish_model

    return load_vggish_model()


def _get_vggish_embeds(x, model, sample_rate, **kw):
    from st_ito_tpu.models.registry import get_vggish_embeds

    return get_vggish_embeds(x, model, sample_rate, **kw)


METRICS = {
    "param": (load_param_model, get_param_embeds),
    "mfcc": (load_mfcc_feature_extractor, get_mfcc_feature_embeds),
    "mir": (load_mir_feature_extractor, get_mir_feature_embeds),
    # checkpoint-gated baselines (reference: utils.py:316-438, 554-608)
    "clap": (_load_clap, _get_clap_embeds),
    "fx-encoder": (_load_fx_encoder, _get_fx_encoder_embeds),
    "beats": (_load_beats, _get_beats_embeds),
    "wav2vec2": (_load_wav2vec2, _get_wav2vec2_embeds),
    "wav2clip": (_load_wav2clip, _get_wav2clip_embeds),
    "vggish": (_load_vggish, _get_vggish_embeds),
}


def load_metric(name: str, **kwargs):
    load_fn, embed_fn = METRICS[name]
    model = load_fn(**kwargs) if name == "param" else load_fn()
    return model, embed_fn


def cosine(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    num = jnp.sum(a * b, axis=-1)
    den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
    return num / jnp.maximum(den, 1e-12)


@jax.jit
def style_similarity(embeds_a: dict, embeds_b: dict) -> jnp.ndarray:
    """Mean cosine similarity over embedding heads; (bs,). Jitted (eager
    dispatch is unavailable on some TPU backends)."""
    sims = [cosine(embeds_a[k], embeds_b[k]) for k in sorted(embeds_a)]
    return jnp.mean(jnp.stack(sims, axis=0), axis=0)
