"""Test configuration: force a virtual 8-device CPU mesh.

Must set the flags before jax initializes a backend — this is the standard
fake-mesh trick for exercising sharding without TPU hardware (SURVEY §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# the axon TPU plugin ignores the JAX_PLATFORMS env var — force CPU via config
# (tests must run on the virtual 8-device CPU mesh, not the single real chip)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_prng_impl", "threefry2x32")
# persistent compilation cache — single-core CPU compiles dominate test time
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
