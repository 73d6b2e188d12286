"""Inference-time optimization engines.

CMA-ES ask/tell runs host-side in numpy (O(P^2) with P ~ 36-51 params —
negligible); fitness evaluation — render the whole population through the
effect chain and embed it — is one jitted XLA program vmapped over the
population and shardable over a device mesh
(replaces: st_ito/style_transfer.py:399-692 where candidates rendered
serially through C++ plugins on CPU).
"""

from st_ito_tpu.ito.cmaes import CMAES
from st_ito_tpu.ito.engine import (
    make_fitness_fn,
    run_autodiff,
    run_es,
    run_es_multitrack,
    run_input,
    run_learned_inference,
    run_random,
    run_rule_based,
    run_staged_es,
)

__all__ = [
    "CMAES",
    "make_fitness_fn",
    "run_es",
    "run_es_multitrack",
    "run_staged_es",
    "run_autodiff",
    "run_input",
    "run_learned_inference",
    "run_random",
    "run_rule_based",
]
