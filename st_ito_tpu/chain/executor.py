"""Compile a ChainSpec into one pure render function.

``build_render_fn(chain, sample_rate, num_channels)`` returns
``render(w, x) -> y`` with w the flat raw [0,1] vector and x (C, T). The
whole chain traces into a single XLA program: vmap it over a population of
w's and the entire CMA-ES generation renders in one device launch — this
replaces the reference's serial per-candidate C++ plugin loop
(reference: st_ito/style_transfer.py:45-115, 499-528).

Semantics preserved from the reference executor:
- leading ``our_bypass`` slot per stage when chain.with_bypass: w > 0.5
  skips the stage (reference: style_transfer.py:88-92)
- fixed parameters pinned regardless of w (reference: style_transfer.py:79-84)
- mono -> stereo promotion at the first stereo stage
  (reference: style_transfer.py:94-102)
- optional per-stage normalization and final peak normalize
  (reference: style_transfer.py:106-113)
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from st_ito_tpu.chain.params import ChainSpec, StageSpec


def _stage_param_dict(stage: StageSpec, w_slice: jnp.ndarray, offset: int):
    """Denormalized name->value dict for one stage from its w slice."""
    out = {}
    for i, p in enumerate(stage.params):
        raw = w_slice[offset + i]
        if p.name in stage.fixed_parameters:
            raw = jnp.asarray(stage.fixed_parameters[p.name], jnp.float32)
        out[p.name] = p.denormalize(raw)
    return out


def build_render_fn(
    chain: ChainSpec,
    sample_rate: int,
    num_channels: int,
    normalize_stages: bool = False,
    peak_normalize_output: bool = True,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Returns render(w (P,), x (num_channels, T)) -> y (C_out, T).

    Channel promotion is resolved statically: output has 2 channels iff the
    input is stereo or any stage is stereo (num_channels == 2).
    """
    slices = chain.stage_slices()
    bypass_off = 1 if chain.with_bypass else 0

    def render(w: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        for stage, start, end in slices:
            w_slice = w[start:end]
            params = _stage_param_dict(stage, w_slice, bypass_off)

            if stage.num_channels == 2 and x.shape[0] == 1:
                x = jnp.concatenate([x, x], axis=0)

            y = stage.process_fn(x, params, sample_rate)

            if chain.with_bypass:
                active = w_slice[0] <= 0.5
                y = jnp.where(active, y, x)

            if normalize_stages:
                peak = jnp.max(jnp.abs(y))
                y = y / jnp.maximum(peak, 1e-8)
            x = y

        if peak_normalize_output:
            peak = jnp.max(jnp.abs(x))
            x = x / jnp.maximum(peak, 1e-8)
        return x

    return render


def output_channels(chain: ChainSpec, in_channels: int) -> int:
    if in_channels == 2:
        return 2
    return 2 if any(s.num_channels == 2 for s in chain.stages) else 1


def parameters_to_dict(w, chain: ChainSpec) -> dict:
    """Flat raw vector -> nested {stage: {param: physical value}} dict,
    bypass reported raw (reference: st_ito/style_transfer.py:324-359)."""
    import numpy as np

    w = np.asarray(w)
    out = {}
    for stage, start, end in chain.stage_slices():
        d = {}
        offset = start
        if chain.with_bypass:
            d["our_bypass"] = float(w[start])
            offset += 1
        for i, p in enumerate(stage.params):
            raw = w[offset + i]
            if p.name in stage.fixed_parameters:
                raw = stage.fixed_parameters[p.name]
            d[p.name] = float(p.denormalize(raw))
        out[stage.name] = d
    return out
