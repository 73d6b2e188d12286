"""Multiband compressor + JSON chain specs."""

import numpy as np
import jax
import jax.numpy as jnp

from st_ito_tpu.chain import chain_from_json
from st_ito_tpu.chain.executor import build_batched_render_fn, build_render_fn
from st_ito_tpu.ops.multiband import multiband_compressor, split_bands

RNG = np.random.default_rng(20)
SR = 48000


def test_lr4_bands_reconstruct():
    """LR crossover bands sum back to ~the input (allpass-flat magnitude)."""
    x = jnp.asarray(RNG.standard_normal((1, 32768)).astype(np.float32))
    low, mid, high = split_bands(x, SR, 250.0, 4000.0)
    recon = np.asarray(low + mid + high)
    X = np.abs(np.fft.rfft(np.asarray(x)[0, 2000:-2000]))
    R = np.abs(np.fft.rfft(recon[0, 2000:-2000]))
    ratio = R[10:-10] / np.maximum(X[10:-10], 1e-6)
    assert 0.7 < np.median(ratio) < 1.4  # flat-ish magnitude reconstruction


def test_multiband_compresses_one_band():
    t = np.arange(SR) / SR
    low_tone = np.sin(2 * np.pi * 100 * t) * 0.9
    high_tone = np.sin(2 * np.pi * 8000 * t) * 0.05
    x = jnp.asarray((low_tone + high_tone).astype(np.float32))[None]
    y = np.asarray(multiband_compressor(
        x, SR, thresholds_db=(-30.0, 0.0, 0.0), ratios=(10.0, 1.0, 1.0)))
    Y = np.abs(np.fft.rfft(y[0]))
    X = np.abs(np.fft.rfft(np.asarray(x)[0]))
    f = np.fft.rfftfreq(SR, 1 / SR)
    low_gain = Y[np.argmin(np.abs(f - 100))] / X[np.argmin(np.abs(f - 100))]
    high_gain = Y[np.argmin(np.abs(f - 8000))] / X[np.argmin(np.abs(f - 8000))]
    assert low_gain < 0.5  # low band heavily compressed
    assert high_gain > 0.8  # high band nearly untouched


def test_chain_from_json(tmp_path):
    chain = chain_from_json("chains/eq+multiband-comp+limiter.json")
    assert [s.name for s in chain.stages] == [
        "ParametricEQ", "MultibandCompressor", "Limiter"]
    render = build_render_fn(chain, SR, 2)
    x = jnp.asarray(RNG.standard_normal((2, 16384)).astype(np.float32) * 0.4)
    w = jnp.asarray(RNG.uniform(0.2, 0.8, chain.num_params).astype(np.float32))
    w = w.at[jnp.asarray([s for _, s, _ in chain.stage_slices()])].set(0.0)
    y = render(w, x)
    assert y.shape == (2, 16384) and bool(jnp.isfinite(y).all())
    # batched path
    rb = build_batched_render_fn(chain, SR, 2, fast=False)
    W = jnp.asarray(RNG.uniform(0.2, 0.8, (3, chain.num_params)).astype(np.float32))
    Y = rb(W, x)
    assert Y.shape == (3, 2, 16384) and bool(jnp.isfinite(Y).all())


def test_chain_from_json_physical_fixed_values(tmp_path):
    """Reference parity: fixed_parameters in physical units (the reference's
    Basic*/class_path convention, Parameter.set_value) are normalized using
    the parameter range; raw [0,1] values pass through; explicit units win."""
    import json

    spec = {
        "Comp": {
            "effect": "compressor",
            "fixed_parameters": {"threshold_db": -24.0, "attack_ms": 0.5},
        },
        "CompRawRatio": {
            "effect": "compressor",
            "units": "physical",
            "fixed_parameters": {"ratio": 1.0},  # physical 1:1, raw would be 0
        },
    }
    path = tmp_path / "chain.json"
    path.write_text(json.dumps(spec))
    chain = chain_from_json(str(path))
    fixed0 = chain.stages[0].fixed_parameters
    assert abs(fixed0["threshold_db"] - (-24.0 + 80.0) / 80.0) < 1e-6
    assert abs(fixed0["attack_ms"] - 0.5) < 1e-6  # in [0,1] -> raw passthrough
    fixed1 = chain.stages[1].fixed_parameters
    assert abs(fixed1["ratio"] - 0.0) < 1e-6  # physical 1.0 -> raw 0.0

    bad = {"Comp": {"effect": "compressor",
                    "fixed_parameters": {"no_such": 0.5}}}
    path.write_text(json.dumps(bad))
    try:
        chain_from_json(str(path))
        raise AssertionError("expected ValueError for unknown parameter")
    except ValueError:
        pass
