"""Chain/stage/parameter specs and the flat-vector codec.

Mirrors the reference's Parameter raw_value normalization
(reference: st_ito/effects.py:784-797) and the flat parameter-vector layout
of the chain executor including the leading ``our_bypass`` pseudo-parameter
per stage and fixed-parameter pinning
(reference: st_ito/style_transfer.py:17-42,76-92).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Mapping

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ParamSpec:
    """One normalized parameter with its physical range."""

    name: str
    min_value: float
    max_value: float
    default: float  # physical units

    @property
    def default_raw(self) -> float:
        return (self.default - self.min_value) / (self.max_value - self.min_value)

    def denormalize(self, raw):
        return raw * (self.max_value - self.min_value) + self.min_value

    def normalize(self, value):
        return (value - self.min_value) / (self.max_value - self.min_value)


@dataclasses.dataclass(frozen=True)
class StageSpec:
    """One effect in the chain.

    process_fn(x, params, sample_rate) -> y, where x is (C, T), params is a
    dict name -> denormalized scalar (traced), all pure jnp.
    num_channels: 1 = per-channel mono processing, 2 = true stereo.
    fixed_parameters: name -> raw [0,1] value pinned (still occupies a slot
    in the flat vector, like the reference executor).

    Population-renderer hooks (used by build_batched_render_fn):
    - response_fn(params_B, omega (F,), sr) -> ("scalar", H (B,F)) or
      ("matrix", H (B,2,2,F)) for LTI stages — consecutive LTI stages fuse
      into ONE FFT application per group.
    - batched_fn(x (B,C,T), params_B, sr, fast) for nonlinear stages.
    - pad: guard samples for the stage's impulse-response tail when fused
      (-1 = one full signal length, for feedback tails).
    """

    name: str
    effect: str
    params: tuple[ParamSpec, ...]
    process_fn: Callable
    num_channels: int = 2
    fixed_parameters: Mapping[str, float] = dataclasses.field(default_factory=dict)
    response_fn: Callable | None = None
    batched_fn: Callable | None = None
    pad: int = 8192
    # optional TPU fast path that beats the response_fn FFT application
    # (e.g. the Pallas biquad cascade); used when fast=True on TPU
    fast_batched_fn: Callable | None = None

    @property
    def param_names(self) -> tuple[str, ...]:
        return tuple(p.name for p in self.params)


@dataclasses.dataclass(frozen=True)
class ChainSpec:
    """A serial chain. with_bypass adds the reference's leading 'our_bypass'
    slot per stage (w > 0.5 skips the stage)."""

    stages: tuple[StageSpec, ...]
    with_bypass: bool = True

    @property
    def num_params(self) -> int:
        n = 0
        for s in self.stages:
            n += len(s.params) + (1 if self.with_bypass else 0)
        return n

    def init_params(self) -> jnp.ndarray:
        """Flat raw vector of stage defaults (bypass slots = 0: active)."""
        vals = []
        for s in self.stages:
            if self.with_bypass:
                vals.append(0.0)
            for p in s.params:
                if p.name in s.fixed_parameters:
                    vals.append(float(s.fixed_parameters[p.name]))
                else:
                    vals.append(p.default_raw)
        return jnp.asarray(vals, jnp.float32)

    def stage_slices(self) -> list[tuple[StageSpec, int, int]]:
        """(stage, start, end) index ranges into the flat vector."""
        out = []
        idx = 0
        for s in self.stages:
            width = len(s.params) + (1 if self.with_bypass else 0)
            out.append((s, idx, idx + width))
            idx += width
        return out
