"""Test config: force an 8-virtual-device CPU platform BEFORE jax import.

Multi-chip sharding paths are exercised on a host-platform mesh
(xla_force_host_platform_device_count=8); the driver separately validates
the same code via __graft_entry__.dryrun_multichip.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin (sitecustomize) sets jax_platforms programmatically,
# which beats the env var — override it back to CPU before first backend use.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
