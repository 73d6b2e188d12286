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

import math
from typing import Callable

import jax
import jax.numpy as jnp

from st_ito_tpu.chain.params import ChainSpec, StageSpec
from st_ito_tpu.ops.iir import next_pow2


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


def build_batched_render_fn(
    chain: ChainSpec,
    sample_rate: int,
    num_channels: int,
    fast: bool = True,
    peak_normalize_output: bool = True,
    fuse_lti: bool = True,
    fft_mode: str = "auto",
    fft_precision: str = "high",
    max_lti_pad: int | None = None,
    out_rows_hop: int | None = None,
):
    """The population renderer: render(W (B, P), x) -> (B, C_out, T), with
    x either (C, T) shared across candidates or (B, C, T) per-candidate.

    ``out_rows_hop``: when the chain ENDS in a fused-LTI group executed by
    the mega inverse kernel whose native row width n2 equals this hop,
    return the hop-blocked rows form (B, C_out, T // hop, hop) instead of
    flattening — the (B, C, T) retile (~10 ms/gen at pop 512 / T 2^18)
    exists only so a hop-framing consumer (Cnn14's STFT,
    frame_signal_rows) can split it back into the same rows. Callers must
    accept BOTH ranks: any shape/ordering mismatch falls back to the flat
    contract.

    TPU-native structure (this is where the reference's serial per-candidate
    C++ loop becomes one XLA program):
    - no outer vmap: stages are natively batched over the population, so the
      compressor ballistics run as ONE Pallas kernel with the population
      flattened across the VPU (when fast=True on TPU)
    - consecutive LTI stages (EQ, delay, reverb, gain, widener) fuse into a
      single rFFT -> response-product -> irFFT application per group; the
      delay+reverb pair costs one FFT instead of two
    - bypass slots blend the response toward identity (LTI stages) or select
      the dry signal (nonlinear stages)

    fast=False keeps everything differentiable (associative-scan ballistics).

    Fusion semantics note: a fused LTI group is "tail-continuous" — the
    delay's tail past the buffer end feeds the reverb, whereas per-stage
    processing (the reference's pedalboard loop, and this executor with
    fuse_lti=False) truncates to the buffer at each stage boundary. The
    fused result is the more physically faithful one; pass fuse_lti=False
    for exact per-stage parity with build_render_fn / the native engine.
    """
    slices = chain.stage_slices()
    bypass_off = 1 if chain.with_bypass else 0

    # Pallas fast paths (e.g. the exact biquad-cascade EQ) take precedence
    # over the FFT response path when fast inference is on and we're on TPU.
    use_pallas = fast and jax.default_backend() == "tpu"
    # fused-LTI FFT implementation: "mx" = packed-complex four-step MXU FFT
    # (ops/mxfft.py — XLA's TPU FFT is far off the roofline at 2^19),
    # "fused" (legacy alias "mx3") = the fused two-stage Pallas kernel
    # (ops/pallas/fused_fft.py), "mega" = the glue-free Pallas FFT pair
    # emitting/consuming the response kernel's half-grid arrays directly
    # (ops/pallas/mega_fft.py), "mega2" = mega with the LTI response
    # construction+apply fused into the forward kernel's epilogue; each
    # falls back to the four-step where shapes don't qualify. "xla" =
    # jnp.fft. "auto" picks mega2 on the TPU inference path (A/B measured
    # same session: mega2 1509.1 vs mega 1457.5 evals/s on the headline
    # bench, PERF_NOTES.md) with the four-step as its shape fallback.
    if fft_mode == "auto":
        fft_mode = ("mega2" if (fast and jax.default_backend() == "tpu")
                    else "xla")

    # static plan: group consecutive response-capable stages
    plan: list[tuple[str, list[int]]] = []
    for i, (stage, _, _) in enumerate(slices):
        if use_pallas and stage.fast_batched_fn is not None:
            plan.append(("fast", [i]))
        elif stage.response_fn is not None:
            if fuse_lti and plan and plan[-1][0] == "lti":
                plan[-1][1].append(i)
            else:
                plan.append(("lti", [i]))
        else:
            plan.append(("nl", [i]))

    # the basic chain opens with EQ -> compressor -> distortion: adjacent
    # Pallas scan / elementwise passes, each paying a (lead, T) <->
    # (T, G, 8, 128) relayout pair plus a full HBM round trip of the
    # population signal for the intermediate — fuse them into ONE kernel
    # (ops/pallas/scan.py eq_compressor_fused_pallas)
    if use_pallas:
        merged: list[tuple[str, list[int]]] = []
        for entry in plan:
            if (merged
                    and merged[-1][0] == "fast"
                    and entry[0] == "nl"
                    and slices[merged[-1][1][0]][0].effect == "parametric_eq"
                    and slices[entry[1][0]][0].effect == "compressor"):
                merged[-1] = ("eqcomp", merged[-1][1] + entry[1])
            elif (merged
                    and merged[-1][0] == "eqcomp"
                    and len(merged[-1][1]) == 2
                    and entry[0] == "nl"
                    and slices[entry[1][0]][0].effect == "distortion"):
                merged[-1] = ("eqcomp", merged[-1][1] + entry[1])
            else:
                merged.append(entry)
        plan = merged
        # kernel-arity contract: eq_compressor_fused_pallas handles exactly
        # EQ->compressor or EQ->compressor->distortion — keep the invariant
        # explicit so adding another absorbable stage can't silently break it
        for kind, idxs in plan:
            if kind == "eqcomp":
                kinds = [slices[i][0].effect for i in idxs]
                assert kinds in (
                    ["parametric_eq", "compressor"],
                    ["parametric_eq", "compressor", "distortion"],
                ), f"fused-head plan got unexpected stage kinds {kinds}"

    def stage_params(stage: StageSpec, W: jnp.ndarray, start: int):
        out = {}
        for j, p in enumerate(stage.params):
            raw = W[:, start + bypass_off + j]
            if p.name in stage.fixed_parameters:
                raw = jnp.full_like(raw, stage.fixed_parameters[p.name])
            out[p.name] = p.denormalize(raw)
        return out

    def render(W: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        B = W.shape[0]
        # a population-shared (C, T) input stays 2-D until the first stage
        # consumes it: the fused eqcomp head streams it WITHOUT ever
        # materializing the (B, C, T) broadcast (~2-3 GB of HBM traffic
        # per generation saved at pop 512 / T 262144)
        shared = x.ndim == 2
        if not shared:
            pass
        elif not (plan and plan[0][0] == "eqcomp"):
            x = jnp.broadcast_to(x[None], (B,) + x.shape)
            shared = False
        T = x.shape[-1]

        for plan_i, (kind, idxs) in enumerate(plan):
            is_last = plan_i == len(plan) - 1
            stages = [slices[i] for i in idxs]
            # static channel promotion before the first stereo stage
            ch_axis = 0 if shared else 1
            if (any(s.num_channels == 2 for s, _, _ in stages)
                    and x.shape[ch_axis] == 1):
                x = jnp.concatenate([x, x], axis=ch_axis)
            C = x.shape[ch_axis]

            if kind == "eqcomp":
                (eq_stage, eq_start, _), (c_stage, c_start, _) = stages[:2]
                p_eq = stage_params(eq_stage, W, eq_start)
                p_c = stage_params(c_stage, W, c_start)
                p_d = a_eq = a_c = a_d = None
                if len(stages) == 3:  # trailing distortion absorbed
                    d_stage, d_start, _ = stages[2]
                    p_d = stage_params(d_stage, W, d_start)
                if chain.with_bypass:
                    a_eq = (W[:, eq_start] <= 0.5).astype(jnp.float32)
                    a_c = (W[:, c_start] <= 0.5).astype(jnp.float32)
                    if p_d is not None:
                        a_d = (W[:, d_start] <= 0.5).astype(jnp.float32)
                from st_ito_tpu.chain.responses import eq_comp_fast_batched

                x = eq_comp_fast_batched(x, p_eq, p_c, sample_rate,
                                         active_eq=a_eq, active_comp=a_c,
                                         p_dist=p_d, active_dist=a_d,
                                         shared_B=B if shared else None)
                shared = False
                continue

            if kind in ("nl", "fast"):
                stage, start, _ = stages[0]
                params = stage_params(stage, W, start)
                fn = (stage.fast_batched_fn if kind == "fast"
                      else stage.batched_fn)
                if chain.with_bypass and getattr(fn, "supports_active",
                                                 False):
                    # blend inside the stage (Pallas kernels do it at
                    # write time) — the jnp.where select below is a full
                    # extra HBM round trip of the population signal
                    active = (W[:, start] <= 0.5).astype(jnp.float32)
                    x = fn(x, params, sample_rate, fast, active=active)
                    continue
                y = fn(x, params, sample_rate, fast)
                if chain.with_bypass:
                    active = (W[:, start] <= 0.5)[:, None, None]
                    y = jnp.where(active, y, x)
                x = y
                continue

            # ---- fused LTI group ----
            # pad guards the group's impulse-response tail against circular
            # wraparound; stage.pad < 0 requests a full-T guard. For long
            # inputs ``max_lti_pad`` caps it (run_es chunked mode passes
            # ~10 s: the worst-case freeverb RT60 — tail energy past the
            # cap wraps at <= -60 dB, far below fitness noise, while the
            # FFT grid next_pow2(T + pad) stays at half the size a full-T
            # guard would force on a 60 s input).
            pad = 0
            for stage, _, _ in stages:
                pad = max(pad, T if stage.pad < 0 else stage.pad)
            if max_lti_pad is not None:
                pad = min(pad, max_lti_pad)
            n = next_pow2(T + pad)

            # fully fused Pallas path: response construction + packed
            # application in ONE kernel (no (B, F) complex intermediates)
            from st_ito_tpu.chain.rp_responses import RP_BUNDLES

            if (use_pallas
                    and fft_mode in ("mx", "fused", "mx3", "mega", "mega2")
                    and C == 2
                    and all(s.effect in RP_BUNDLES for s, _, _ in stages)):
                from st_ito_tpu.ops.pallas.packed_response import (
                    packed_lti_apply_rp)

                rp_stages = []
                for stage, start, _ in stages:
                    params = stage_params(stage, W, start)
                    active = ((W[:, start] <= 0.5)
                              if chain.with_bypass else None)
                    rp_stages.append((stage.effect, params, active))
                from st_ito_tpu.ops.pallas import mega_fft

                # rows form only when nothing downstream needs (B, C, T):
                # this must be the chain's final group and the inverse
                # kernel's row width n2 must divide the consumer's hop
                rows = bool(out_rows_hop and is_last
                            and out_rows_hop % mega_fft._radix(n)[1] == 0
                            and T % out_rows_hop == 0)
                if (fft_mode == "mega2" and mega_fft.supported(n, T)
                        and B % 8 == 0):
                    x = mega_fft.packed_lti_apply_mega2(
                        x, rp_stages, n, sample_rate,
                        precision=fft_precision, rows=rows)
                elif (fft_mode == "mega" and mega_fft.supported(n, T)
                        and B % 8 == 0):
                    x = mega_fft.packed_lti_apply_mega(
                        x, rp_stages, n, sample_rate,
                        precision=fft_precision, rows=rows)
                else:
                    x = packed_lti_apply_rp(x, rp_stages, n, sample_rate,
                                            precision=fft_precision,
                                            fft_impl=("mx" if fft_mode in
                                                      ("mega", "mega2")
                                                      else fft_mode))
                continue

            omega = jnp.linspace(0.0, math.pi, n // 2 + 1, dtype=jnp.float32)

            from st_ito_tpu.chain.responses import (
                apply_response, bypass_blend, compose_responses)

            F = omega.shape[0]
            kind_H, H = "scalar", None
            for stage, start, _ in stages:
                params = stage_params(stage, W, start)
                k, Hs = stage.response_fn(params, omega, sample_rate, C)
                if chain.with_bypass:
                    active = W[:, start] <= 0.5
                    Hs = bypass_blend(k, Hs, active)
                kind_H, H = compose_responses(kind_H, H, k, Hs, F)

            if (fft_mode in ("mx", "fused", "mx3", "mega", "mega2")
                    and kind_H in ("scalar", "monomix")):
                from st_ito_tpu.ops.mxfft import packed_lti_apply

                x = packed_lti_apply(x, kind_H, H, n,
                                     precision=fft_precision)
            else:
                X = jnp.fft.rfft(x, n=n, axis=-1)  # (B, C, F)
                Y = apply_response(kind_H, H, X)
                x = jnp.fft.irfft(Y, n=n, axis=-1)[..., :T].astype(x.dtype)

        if peak_normalize_output:
            axes = (-3, -2, -1) if x.ndim == 4 else (-2, -1)
            peak = jnp.max(jnp.abs(x), axis=axes, keepdims=True)
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
