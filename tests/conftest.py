"""Test harness: force an 8-virtual-device CPU platform before jax init,
so multi-chip sharding logic is exercised without TPU hardware
(SURVEY.md §4 'implication for the new framework')."""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
