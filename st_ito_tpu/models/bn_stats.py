"""Functional BatchNorm running-statistics collection.

The torch reference updates BatchNorm running stats in place on every
training forward. In the pure-functional JAX port, encoders record the
torch-convention update (running = (1-m)*running + m*batch, unbiased batch
variance) into a trace-scoped collector; the training step merges the
resulting partial pytree back into the params.

Cnn14 threads stats explicitly (models/cnn14.py); this module serves the
encoders whose BN calls are buried in deep call trees (DeepGCN, FXencoder)
without threading a stats argument through every helper. The collector is
keyed by the identity of the BN param sub-dict, which is stable within one
trace of ``apply``; ``stats_tree`` then rebuilds a partial tree that mirrors
the params structure so ``merge_bn_stats`` is encoder-agnostic.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

_BN_MOMENTUM = 0.1  # torch BatchNorm default

_ACTIVE: dict | None = None


@contextlib.contextmanager
def collect_bn_stats():
    """Context manager; yields the collector dict {id(bn_dict): new_stats}."""
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = {}
    try:
        yield _ACTIVE
    finally:
        _ACTIVE = prev


def record_bn(bn: dict, mean, var_biased, n: int,
              momentum: float = _BN_MOMENTUM) -> None:
    """Record a BN running-stat update if a collector is active.

    ``var_biased`` is the batch variance with 1/n normalization (jnp.var);
    the running update uses the unbiased estimate, matching torch.
    """
    if _ACTIVE is None:
        return
    var_unbiased = var_biased * (n / max(n - 1, 1))
    _ACTIVE[id(bn)] = {
        "running_mean": (1 - momentum) * bn["running_mean"] + momentum * mean,
        "running_var": (1 - momentum) * bn["running_var"]
        + momentum * var_unbiased,
    }


def stats_tree(params, collected: dict):
    """Partial pytree mirroring ``params`` with only the recorded BN stats.

    Lists keep their positions (empty dicts where nothing was recorded) so
    the merge can zip them with the params.
    """

    def walk(node):
        if isinstance(node, dict):
            if id(node) in collected:
                return collected[id(node)]
            out = {k: walk(v) for k, v in node.items()}
            return {k: v for k, v in out.items() if v}
        if isinstance(node, (list, tuple)):
            return [walk(v) for v in node]
        return {}

    tree = walk(params)
    if isinstance(tree, (list, tuple)) and not any(tree):
        return {}
    return tree


def merge_bn_stats(params, stats):
    """Merge a partial stats tree (as produced by ``stats_tree`` or the
    Cnn14 explicit path) into a params pytree, stop-gradient'ed."""
    if not stats:
        return params
    if isinstance(stats, dict):
        out = dict(params)
        for k, v in stats.items():
            if isinstance(v, (dict, list, tuple)):
                out[k] = merge_bn_stats(params[k], v)
            else:
                out[k] = jax.lax.stop_gradient(jnp.asarray(v))
        return out
    if isinstance(stats, (list, tuple)):
        return [merge_bn_stats(p, s) for p, s in zip(params, stats)]
    return params
