"""Declarative effect-chain executor.

The reference applies a serial chain of C++ plugins per candidate
(reference: st_ito/style_transfer.py:45-115). Here a chain is a static spec
compiled into one pure function ``render(w, x)`` — jit/vmap/grad-safe — so an
entire CMA-ES population renders as a single XLA program.
"""

from st_ito_tpu.chain.params import ParamSpec, StageSpec, ChainSpec
from st_ito_tpu.chain.effects import (
    EFFECT_REGISTRY,
    basic_chain,
    chain_from_json,
    chain_preset,
    basic_multiband_compressor,
    basic_parametric_eq,
    basic_compressor,
    basic_distortion,
    basic_delay,
    basic_reverb,
    basic_chorus,
    basic_limiter,
    basic_noise_gate,
    basic_gain,
    basic_stereo_widener,
    basic_phaser,
)
from st_ito_tpu.chain.executor import build_render_fn, parameters_to_dict

__all__ = [
    "ParamSpec",
    "StageSpec",
    "ChainSpec",
    "EFFECT_REGISTRY",
    "basic_chain",
    "chain_from_json",
    "chain_preset",
    "basic_multiband_compressor",
    "basic_parametric_eq",
    "basic_compressor",
    "basic_distortion",
    "basic_delay",
    "basic_reverb",
    "basic_chorus",
    "basic_limiter",
    "basic_noise_gate",
    "basic_gain",
    "basic_stereo_widener",
    "basic_phaser",
    "build_render_fn",
    "parameters_to_dict",
]
