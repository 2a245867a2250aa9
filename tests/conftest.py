"""Test configuration: force an 8-device CPU backend before JAX initializes.

This is the JAX analogue of the reference's ``nompi4py.MPIDummy`` fake
backend (nompi4py.py:1-37): multi-device code paths run on virtual CPU
devices so swap/sharding logic is exercised without TPU hardware. The CI/TPU
environment pins JAX_PLATFORMS to the axon TPU plugin, so we must override it
both in the environment and through jax.config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
