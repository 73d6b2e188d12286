"""Paired random transforms: same key => same effect on both signals."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from st_ito_tpu.augment import ALL_TRANSFORMS, apply_paired

RNG = np.random.default_rng(15)


def _x():
    return jnp.asarray((RNG.standard_normal((2, 16384)) * 0.4).astype(np.float32))


@pytest.mark.parametrize("name", sorted(ALL_TRANSFORMS))
def test_transform_runs_and_pairs(name):
    t = ALL_TRANSFORMS[name]
    key = jax.random.PRNGKey(3)
    x = _x()
    y1 = t(key, x)
    y2 = t(key, x)
    assert y1.shape == x.shape
    assert bool(jnp.isfinite(y1).all())
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))  # deterministic


def test_different_keys_differ():
    x = _x()
    y1 = ALL_TRANSFORMS["parametric_eq"](jax.random.PRNGKey(0), x, p=1.0)
    y2 = ALL_TRANSFORMS["parametric_eq"](jax.random.PRNGKey(1), x, p=1.0)
    assert not np.allclose(np.asarray(y1), np.asarray(y2), atol=1e-4)


def test_apply_paired_consistency():
    """The pair receives identical parameter draws (the reference's
    seed-reset semantics): transforming the same signal twice through
    apply_paired yields identical outputs."""
    x = _x()
    key = jax.random.PRNGKey(7)
    a, b = apply_paired(key, x, x, transforms=["parametric_eq", "compressor",
                                               "reverb", "sox_reverb", "gain"])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sox_reverb_distinct_from_freeverb():
    """The two reverb flavors are genuinely different transforms
    (reference ships RandomSoxReverb AND RandomPedalboardReverb)."""
    x = _x()
    key = jax.random.PRNGKey(11)
    y_sox = ALL_TRANSFORMS["sox_reverb"](key, x, p=1.0)
    y_fv = ALL_TRANSFORMS["reverb"](key, x, p=1.0)
    assert not np.allclose(np.asarray(y_sox), np.asarray(y_fv), atol=1e-3)
    # pre-delay + wet tail must add energy beyond the dry signal's decay
    assert bool(jnp.isfinite(y_sox).all())


def test_apply_paired_jittable():
    x = _x()
    f = jax.jit(lambda k, a, b: apply_paired(k, a, b,
                                             transforms=["gain", "distortion"]))
    a, b = f(jax.random.PRNGKey(0), x, x * 0.5)
    assert bool(jnp.isfinite(a).all() and jnp.isfinite(b).all())
