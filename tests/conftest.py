"""Test env: force CPU backend with 8 virtual devices so multi-chip sharding
tests run anywhere (the driver validates the real multi-chip path separately
via __graft_entry__.dryrun_multichip)."""
import os

# must happen before jax is imported anywhere
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
