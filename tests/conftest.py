import os

# Tests run on a virtual 8-device CPU mesh; env must be set before jax
# initializes a backend.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
# Strip any inherited device-count flag (a leftover =1 from another tool
# would silently shrink the documented 8-device mesh), then force 8.
_flags = " ".join(f for f in _flags.split()
                  if "xla_force_host_platform_device_count" not in f)
os.environ["XLA_FLAGS"] = (
    _flags + " --xla_force_host_platform_device_count=8"
).strip()

# The axon TPU plugin (tunneled single chip) overrides JAX_PLATFORMS; force
# the CPU backend explicitly or the whole suite silently runs on the remote
# TPU with 1 device and tunnel-latency compiles.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

# Distributed tests run on tiny tables that sit far below the sharded
# cluster phase's size gate; force the sharded path so its correctness
# (owned-component walks + DCN merge) is exercised everywhere.  The
# replicated path keeps its own explicit test
# (test_distributed_pipeline.test_replicated_cluster_path).
os.environ.setdefault("HUMID_TPU_CLUSTER_SHARDED", "1")
