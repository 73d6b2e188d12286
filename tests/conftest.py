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
