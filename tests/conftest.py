"""Test environment: CPU backend with 8 virtual devices.

Multi-device sharding tests run on a fake 8-device CPU mesh — the TPU-native
analogue of a distributed "fake backend" (SURVEY.md §4). Pallas kernels are
exercised in interpret mode via ops.dispatch.force_pallas.
"""

import os

# Must be set before JAX initializes its backends.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
