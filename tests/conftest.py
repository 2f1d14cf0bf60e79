"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
multi-chip sharding tests run anywhere (SURVEY.md §4 test plan).

Note: this environment preloads jax at interpreter startup, so env vars
alone are too late — we update jax.config directly (backends initialize
lazily, so this still takes effect as long as no test touched a device
before conftest ran).
"""

import os

import jax

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
jax.config.update("jax_platforms", "cpu")
