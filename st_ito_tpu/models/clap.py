"""CLAP-style audio encoder as a trainable pretext option, in pure JAX.

The reference trains CLAP-backboned pretext variants where the LAION-CLAP
audio tower (an HTS-AT Swin transformer) embeds the mid and side signals
separately (reference: st_ito/models/clap.py:6-42,
cfg/model/pretext/param-clap-pt.yaml / param-clap-ft.yaml). Here the tower
is the native JAX HTS-AT (models/htsat.py) with a linear projection to the
CLAP embedding width, applied per mid/side channel — the "-ft"
(train-from-scratch / fine-tune) role. Loading the released LAION
checkpoint ("-pt") is weight-gated offline like the other pretrained
towers; this module gives the pretext trainer the architecture either way.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from st_ito_tpu.models.htsat import HTSATConfig, htsat_apply, init_htsat_params


@dataclasses.dataclass(frozen=True)
class CLAPAudioConfig:
    embed_dim: int = 512  # CLAP joint-space width
    tower: HTSATConfig = HTSATConfig(embed_dim=768)  # HTS-AT audio tower


def init_clap_audio_params(key, cfg: CLAPAudioConfig):
    k_tower, k_proj = jax.random.split(key)
    import math

    a = math.sqrt(6.0 / (cfg.tower.embed_dim + cfg.embed_dim))
    return {
        "tower": init_htsat_params(k_tower, cfg.tower),
        "projection": {
            "weight": jax.random.uniform(
                k_proj, (cfg.embed_dim, cfg.tower.embed_dim), jnp.float32,
                -a, a),
            "bias": jnp.zeros(cfg.embed_dim, jnp.float32),
        },
    }


def clap_audio_apply(params, x, cfg: CLAPAudioConfig, training: bool = False,
                     rng=None):
    """x (B, C, T) -> (mid_embed, side_embed), each (B, embed_dim).

    Mid/side split then one tower forward per signal, exactly the
    reference's CLAP wrapper semantics (st_ito/models/clap.py:20-42); mono
    input duplicates mid as side."""
    if x.shape[1] == 2:
        mid = ((x[:, 0, :] + x[:, 1, :]) / 2.0)[:, None, :]
        side = ((x[:, 0, :] - x[:, 1, :]) / 2.0)[:, None, :]
        # one batched tower pass over [mid ‖ side]
        both = jnp.concatenate([mid, side], axis=0)
        e, _ = htsat_apply(params["tower"], both, cfg.tower,
                           training=training, rng=rng)
        B = x.shape[0]
        e_mid, e_side = e[:B], e[B:]
    else:
        e_mid, _ = htsat_apply(params["tower"], x, cfg.tower,
                               training=training, rng=rng)
        e_side = e_mid
    proj = params["projection"]

    def project(v):
        return v @ proj["weight"].T + proj["bias"]

    return project(e_mid), project(e_side)
