"""Representation models (encoders) and the embedding API.

The primary model is the AFx-Rep mid/side Cnn14
(reference: st_ito/models/panns.py:121-281), reimplemented in pure JAX with a
parameter pytree whose structure mirrors the PyTorch state_dict so that the
released afx-rep.ckpt converts 1:1.
"""

from st_ito_tpu.models.cnn14 import (
    Cnn14Config,
    cnn14_apply,
    init_cnn14_params,
)
from st_ito_tpu.models.registry import (
    ParamModel,
    get_mfcc_feature_embeds,
    get_param_embeds,
    load_mfcc_feature_extractor,
    load_param_model,
)

__all__ = [
    "Cnn14Config",
    "cnn14_apply",
    "init_cnn14_params",
    "ParamModel",
    "get_param_embeds",
    "load_param_model",
    "get_mfcc_feature_embeds",
    "load_mfcc_feature_extractor",
]
