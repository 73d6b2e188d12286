"""Minimal embedding-extraction example (reference: scripts/embed.py).

    python scripts/embed.py [--ckpt tmp/afx-rep.ckpt] [--allow-random]
"""

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from st_ito_tpu.models import get_param_embeds, load_param_model

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--allow-random", action="store_true")
    args = parser.parse_args()

    model = load_param_model(args.ckpt, allow_random=args.allow_random)

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 2, 262144)).astype(np.float32))
    embeds = get_param_embeds(x, model, sample_rate=48000)
    print("mid :", embeds["mid"].shape, np.asarray(embeds["mid"])[0, :4])
    print("side:", embeds["side"].shape, np.asarray(embeds["side"])[0, :4])
