"""Test env: force CPU backend with 8 virtual devices so multi-chip sharding
tests run anywhere (the driver validates the real multi-chip path separately
via __graft_entry__.dryrun_multichip).

NOTE: this container's sitecustomize force-registers the axon TPU backend
and sets jax_platforms="axon,cpu" (overriding the JAX_PLATFORMS env var), so
we must override via jax.config AFTER importing jax.
"""
import os

# must happen before the jax backend initializes
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
