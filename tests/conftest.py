"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment pins JAX at the TPU via a platform plugin that overrides
JAX_PLATFORMS, so the env var alone is not enough — we must flip
jax.config.jax_platforms before the backend initializes. This conftest runs
before any test module imports jax.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
