"""Pure-JAX DSP kernel library.

Every function here is a pure function of jnp arrays, safe under jit / vmap /
grad, with static shapes. Physical (denormalized) parameter units; the [0,1]
normalized-parameter layer lives in ``st_ito_tpu.proc`` and
``st_ito_tpu.chain``.

TPU design notes
----------------
LTI effects (EQ biquads, shelves, feedback delay, Freeverb, K-weighting) are
applied via *frequency sampling*: build the exact rational frequency response
H(e^{jw}) on an rFFT grid and multiply — one batched FFT instead of a serial
per-sample recurrence. This is both differentiable and MXU/VPU friendly, and
mirrors the strategy of the reference's differentiable path (dasp-pytorch)
while the reference's non-differentiable path used serial C++ plugins
(reference: st_ito/style_transfer.py:45-115).

Sequential recurrences that are genuinely time-varying (compressor gain
smoothing, phaser allpasses) are first-order *linear* recurrences and are
evaluated with jax.lax.associative_scan (parallel prefix) rather than a
per-sample lax.scan. Exact per-sample scan implementations are kept for
golden-value parity tests against scipy.
"""

from st_ito_tpu.ops.iir import (
    biquad_coeffs,
    freqz,
    fft_filt,
    apply_iir_fsm,
    biquad_scan,
    lfilter_scan,
    linear_recurrence,
    one_pole_smooth,
)

__all__ = [
    "biquad_coeffs",
    "freqz",
    "fft_filt",
    "apply_iir_fsm",
    "biquad_scan",
    "lfilter_scan",
    "linear_recurrence",
    "one_pole_smooth",
]
