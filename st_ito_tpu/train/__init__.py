"""Training systems (optax/pjit), replacing the reference's PyTorch-Lightning
modules (reference: st_ito/methods/). Data parallelism is a 1-D "data" mesh
axis with XLA-inserted gradient reductions — the TPU equivalent of
Lightning's DDP/NCCL strategy (reference: scripts/main.py:13-17).
"""

from st_ito_tpu.train.param import (
    ParamEstimatorConfig,
    ParamTrainState,
    init_param_estimator,
    make_param_train_block,
    make_param_train_step,
)

__all__ = [
    "ParamEstimatorConfig",
    "ParamTrainState",
    "init_param_estimator",
    "make_param_train_block",
    "make_param_train_step",
]
