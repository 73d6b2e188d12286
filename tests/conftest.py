"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host CPU devices (XLA_FLAGS=--xla_force_host_platform_device_count=8),
as recommended for JAX multi-device unit tests.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# A sitecustomize hook may have re-registered a hardware platform after the
# env var was read; force CPU regardless.
jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402

_CLEAR_EVERY = 40
_test_count = 0


@pytest.fixture(autouse=True)
def _bound_compiled_executable_accumulation():
    """Clear JAX's jit/compilation caches every N tests.

    The full suite compiles many hundreds of CPU executables in one
    process; letting them all stay live was observed to segfault the XLA
    CPU client late in the run (deterministically at ~85%, inside
    backend_compile_and_load for a fresh program — no single subset of
    the suite reproduces it). Dropping the caches periodically bounds
    JIT code accumulation; modules rarely share jitted functions, so the
    only cost is a few repeated intra-module compiles.
    """
    global _test_count
    yield
    _test_count += 1
    if _test_count % _CLEAR_EVERY == 0:
        jax.clear_caches()
