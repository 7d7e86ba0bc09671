"""Test configuration: run JAX on CPU with 8 virtual devices so multi-chip
sharding tests work without TPU hardware (SURVEY.md §4).

The TPU environment pre-imports jax via sitecustomize (/root/.axon_site),
so env vars are already frozen into jax.config by the time pytest starts;
we must update the config directly (works as long as no backend has been
initialized yet, which sitecustomize does not do).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
