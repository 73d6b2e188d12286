"""Native CPU chain executor (C++ via ctypes).

The reference's CPU execution path was pedalboard (C++/JUCE). This module
binds ``csrc/stito_dsp.cpp`` — an exact time-domain implementation of the
Basic effect set with identical parameter semantics — serving as:
1. golden reference for the frequency-sampled JAX kernels,
2. accelerator-free serving executor,
3. fast host-side datagen backend.

The shared library is built on demand with g++ (cached next to the source).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

# must match kEffects order in csrc/stito_dsp.cpp
EFFECT_IDS = {
    "parametric_eq": 0,
    "compressor": 1,
    "distortion": 2,
    "delay": 3,
    "reverb": 4,
    "gain": 5,
    "limiter": 6,
}

_LIB = None


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_library(src: str, out: str) -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", out, src]
    subprocess.run(cmd, check=True, capture_output=True)


def load_library() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    src = os.path.join(_repo_root(), "csrc", "stito_dsp.cpp")
    lib_path = os.path.join(_repo_root(), "csrc", "libstito_dsp.so")
    if (not os.path.isfile(lib_path)
            or os.path.getmtime(lib_path) < os.path.getmtime(src)):
        _build_library(src, lib_path)
    lib = ctypes.CDLL(lib_path)
    lib.stito_process_chain.restype = ctypes.c_int
    lib.stito_process_chain.argtypes = [
        ctypes.POINTER(ctypes.c_float),  # audio
        ctypes.c_int, ctypes.c_int, ctypes.c_float,  # C, T, sr
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,  # effect_ids, n
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,  # w, n_params
        ctypes.c_int, ctypes.c_int,  # with_bypass, normalize
    ]
    lib.stito_num_params.restype = ctypes.c_int
    lib.stito_num_params.argtypes = [ctypes.c_int]
    _LIB = lib
    return lib


def native_available() -> bool:
    try:
        load_library()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


def native_render(chain, w, x: np.ndarray, sample_rate: int,
                  normalize_output: bool = True) -> np.ndarray:
    """Render x (C, T) through a ChainSpec with raw params w using the
    native engine. Mirrors build_render_fn semantics (bypass slots,
    mono->stereo promotion at the first stereo stage)."""
    lib = load_library()

    ids = []
    for stage in chain.stages:
        if stage.effect not in EFFECT_IDS:
            raise ValueError(f"effect not in native engine: {stage.effect}")
        ids.append(EFFECT_IDS[stage.effect])
        expected = lib.stito_num_params(ids[-1])
        if expected != len(stage.params):
            raise RuntimeError(
                f"param count mismatch for {stage.effect}: "
                f"native {expected} vs spec {len(stage.params)}"
            )

    x = np.ascontiguousarray(np.asarray(x, np.float32))
    if x.ndim == 1:
        x = x[None]
    if x.shape[0] == 1 and any(s.num_channels == 2 for s in chain.stages):
        x = np.repeat(x, 2, axis=0)
    C, T = x.shape

    # apply fixed-parameter pinning on the host side
    w = np.asarray(w, np.float32).copy()
    off = 1 if chain.with_bypass else 0
    for stage, start, end in chain.stage_slices():
        for i, p in enumerate(stage.params):
            if p.name in stage.fixed_parameters:
                w[start + off + i] = stage.fixed_parameters[p.name]

    ids_arr = np.asarray(ids, np.int32)
    buf = x.copy()
    ret = lib.stito_process_chain(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        C, T, float(sample_rate),
        ids_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(ids),
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(w),
        1 if chain.with_bypass else 0,
        1 if normalize_output else 0,
    )
    if ret != 0:
        raise RuntimeError(f"stito_process_chain failed with code {ret}")
    return buf
