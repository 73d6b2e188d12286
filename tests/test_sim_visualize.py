"""Similarity dataset + embedding visualization + CLAP gate."""

import os

import numpy as np
import pytest

from st_ito_tpu.data.sim import SimilarityDataset
from st_ito_tpu.eval.visualize import plot_embeddings, project_embeddings

RNG = np.random.default_rng(16)


def _sources(n=2, T=65536):
    t = np.arange(T) / 48000
    return [
        np.stack([np.sin(2 * np.pi * 220 * (i + 1) * t)] * 2).astype(np.float32) * 0.5
        for i in range(n)
    ]


def test_similarity_dataset_quadruplets():
    ds = SimilarityDataset(_sources(), effect_names=["distortion", "gain"],
                           length=16384, batch_size=2, seed=0)
    it = iter(ds)
    batch = next(it)
    assert batch["a"].shape == (2, 2, 16384)
    assert batch["a_out"].shape == (2, 2, 16384)
    assert np.isfinite(batch["a_out"]).all()
    # same effect+params applied to both: processing a==b implies a_out==b_out
    ds2 = SimilarityDataset([_sources()[0]], effect_names=["distortion"],
                            length=16384, batch_size=1, seed=1)
    b2 = next(iter(ds2))
    assert b2["effect"] == "distortion"


def test_project_and_plot(tmp_path):
    E = np.concatenate([
        RNG.standard_normal((20, 32)) + 4.0,
        RNG.standard_normal((20, 32)) - 4.0,
    ])
    labels = np.asarray([0] * 20 + [1] * 20)
    P = project_embeddings(E, method="auto")
    assert P.shape == (40, 2)
    # separable clusters stay separated in the projection
    assert abs(P[:20, 0].mean() - P[20:, 0].mean()) > 1.0
    out = str(tmp_path / "viz.png")
    plot_embeddings(E, labels, ["a", "b"], out_path=out)
    assert os.path.isfile(out)


def test_clap_loader_gated():
    from st_ito_tpu.models.registry import load_clap_model

    with pytest.raises(FileNotFoundError):
        load_clap_model(model_id="laion/clap-htsat-unfused")
