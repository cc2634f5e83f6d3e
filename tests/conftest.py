"""Test harness config: run all tests on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU plugin at interpreter
startup, so JAX_PLATFORMS in the environment is not enough — we must switch
the platform via jax.config after import (verified to work post-registration).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# float64 tree math is required for exact search parity with the reference's
# Python-float MCTS; framework code uses explicit dtypes so this only enables
# (not forces) wide types.
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "float32")

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8
