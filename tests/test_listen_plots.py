"""Listening-correlation analysis + plot generation."""

import os

import numpy as np
import jax.numpy as jnp

from st_ito_tpu.eval.listen import evaluate_listening_correlation, pearson, spearman
from st_ito_tpu.eval.plots import plot_psm_results, plot_pst_results, plot_sweep_results
from st_ito_tpu.models.registry import (
    get_mfcc_feature_embeds,
    load_mfcc_feature_extractor,
)
from st_ito_tpu.ops import distortion

RNG = np.random.default_rng(18)
SR = 48000


def test_correlation_stats():
    a = np.asarray([1.0, 2.0, 3.0, 4.0])
    assert spearman(a, a * 2 + 1) == 1.0
    assert spearman(a, -a) == -1.0
    np.testing.assert_allclose(pearson(a, a * 3), 1.0)


def test_listening_correlation_tracks_distortion():
    """Pairs with more distortion difference should rate less similar; a
    sane metric correlates with the (synthetic) ratings."""
    t = np.arange(SR) / SR
    base = (np.sin(2 * np.pi * 220 * t) * np.exp(-((t % 0.25) / 0.1))).astype(np.float32)
    x = np.stack([base, base * 0.9]) * 0.6
    stimuli = []
    for drive in [0.0, 6.0, 12.0, 24.0, 36.0]:
        y = np.asarray(distortion(jnp.asarray(x), drive))
        # synthetic human rating: more drive = less similar
        stimuli.append({"a": x, "b": y, "rating": 1.0 - drive / 40.0})
    metrics = {"mfcc": (load_mfcc_feature_extractor(), get_mfcc_feature_embeds)}
    res = evaluate_listening_correlation(stimuli, metrics, SR)
    assert res["mfcc"]["spearman"] > 0.8


def test_plot_generation(tmp_path):
    psm = {
        "intra-effect": {
            "mfcc": {"accuracy_by_distractors": {1: 0.9, 2: 0.8, 3: 0.7}},
            "param": {"accuracy_by_distractors": {1: 0.95, 2: 0.9, 3: 0.85}},
        }
    }
    plot_psm_results(psm, str(tmp_path / "psm.png"))
    assert os.path.isfile(tmp_path / "psm.png")

    pst = {
        "ex0": {
            "input": {"mfcc_sim": 0.5, "time_elapsed": 0.0},
            "style-es": {"mfcc_sim": 0.9, "time_elapsed": 9.0},
        }
    }
    plot_pst_results(pst, str(tmp_path / "pst.png"))
    assert os.path.isfile(tmp_path / "pst.png")

    sweeps = {"drive": {"values": [0, 0.5, 1], "similarities": [1, 0.7, 0.4],
                        "monotonicity": 1.0}}
    plot_sweep_results(sweeps, str(tmp_path / "sweep.png"))
    assert os.path.isfile(tmp_path / "sweep.png")
