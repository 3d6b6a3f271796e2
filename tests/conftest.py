"""Test configuration: force CPU backend with 8 virtual devices so sharded
(multi-chip) code paths are exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in flags:
    # The XLA:CPU backend at the default optimization level was observed
    # OOM-killing this box (111 GB RSS) while compiling the batched
    # prover's vmapped stage programs; level 1 keeps compile memory
    # bounded.  Only runtime speed of the test executables is affected —
    # results are bit-identical.
    flags = flags + " --xla_backend_optimization_level=1"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The environment may pre-register an accelerator platform; force CPU here
# (the env var alone is not authoritative in this image).
jax.config.update("jax_platforms", "cpu")

# This machine has very few cores and XLA compiles dominate test wall time;
# cache compiled executables across runs.
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
