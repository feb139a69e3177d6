"""Test configuration.

Device tests run on a virtual 8-device CPU mesh so sharding/collective code
paths are exercised without TPU hardware; set up BEFORE jax is imported
anywhere.
"""

import os

# Force CPU: the session env may carry JAX_PLATFORMS=axon (the real-TPU
# tunnel), but tests must run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Persistent compilation cache: the limb-arithmetic graphs are huge for XLA
# CPU and the first compile in a process is expensive; cache across runs.
# Set via jax.config (the env-var spellings are not reliably honored).
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/bn254_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
