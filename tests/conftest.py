"""Test harness: force the CPU backend with 8 virtual devices.

The environment pins jax_platforms to "axon,cpu" (TPU-over-tunnel first), and
the env var JAX_PLATFORMS is ignored by this build — only an explicit
config.update wins.  Tests must run on CPU: numerics are deterministic, jit
compiles are ~100x faster, and the 8 virtual devices emulate a multi-chip mesh
(the TPU-native analogue of multi-node tests without a cluster, SURVEY.md §4).
Set FP8TPU_TEST_PLATFORM=axon to run the suite on real TPU hardware instead.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("FP8TPU_TEST_PLATFORM", "cpu"))

# Persistent compilation cache: full-model CPU compiles dominate suite time
# (~20-60s each); cache hits cut repeat runs to seconds.
jax.config.update("jax_compilation_cache_dir", "/tmp/fp8tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
