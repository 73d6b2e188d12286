"""PyTorch AFx-Rep checkpoint -> JAX parameter pytree converter.

Mirrors the reference loader's state-dict surgery
(reference: st_ito/utils.py:511-551): strip the Lightning ``encoder.``
prefix, drop torchlibrosa STFT/mel buffers (the JAX front end is
functional), keep torch tensor layouts (OIHW convs, (out,in) linears) which
is what cnn14_apply expects.
"""

from __future__ import annotations

import os

import numpy as np

from st_ito_tpu.models.cnn14 import Cnn14Config

_SKIP_SUBSTRINGS = (
    "spectrogram_extractor",
    "logmel_extractor",
    "spec_augmenter",
    "num_batches_tracked",
)


def torch_state_dict_to_params(state_dict: dict) -> dict:
    """Flat torch state_dict (already encoder-prefix-stripped) -> nested
    jax-ready pytree of numpy arrays."""
    params: dict = {}
    for key, value in state_dict.items():
        if any(s in key for s in _SKIP_SUBSTRINGS):
            continue
        arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value,
                         dtype=np.float32)
        parts = key.split(".")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return params


def listify_numeric(node):
    """Recursively turn dicts whose keys are all decimal strings (torch
    ModuleList entries like ``layers.0``) into ordered lists, matching the
    init-time pytree structure of the JAX models."""
    if isinstance(node, dict):
        if node and all(k.isdigit() for k in node):
            return [listify_numeric(node[k])
                    for k in sorted(node, key=int)]
        return {k: listify_numeric(v) for k, v in node.items()}
    return node


def strip_prefix(state_dict: dict, prefix: str = "encoder.") -> dict:
    out = {}
    for k, v in state_dict.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
    return out


def load_torch_checkpoint(ckpt_path: str) -> tuple[dict, Cnn14Config]:
    """Load afx-rep.ckpt (+ sibling config.yaml if present) and return
    (params pytree, Cnn14Config)."""
    import torch
    import yaml

    checkpoint = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state_dict = checkpoint.get("state_dict", checkpoint)
    state_dict = strip_prefix(state_dict, "encoder.")
    params = torch_state_dict_to_params(state_dict)

    config = Cnn14Config()
    config_path = os.path.join(os.path.dirname(ckpt_path), "config.yaml")
    if os.path.isfile(config_path):
        with open(config_path) as f:
            cfg = yaml.safe_load(f)
        try:
            init_args = cfg["model"]["init_args"]["encoder"]["init_args"]
            config = Cnn14Config(**init_args)
        except (KeyError, TypeError):
            pass
    return params, config


def save_params_npz(params: dict, path: str) -> None:
    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            key = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, key)
            else:
                flat[key] = np.asarray(v)

    walk(params, "")
    np.savez(path, **flat)


def load_params_npz(path: str) -> dict:
    data = np.load(path)
    params: dict = {}
    for key in data.files:
        parts = key.split(".")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return params
