"""Test configuration.

Device tests run on a virtual 8-device CPU mesh so sharding/collective code
paths are exercised without TPU hardware; set up BEFORE jax is imported
anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Force CPU via jax.config: the session env carries JAX_PLATFORMS=axon (the
# real-TPU tunnel) and the plugin overrides the env var, so only a config
# update reliably pins tests to the virtual 8-device CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the limb-arithmetic graphs are huge for XLA
# CPU and the first compile in a process is expensive; cache across runs.
# (env-var spellings for these knobs are likewise not reliably honored.)
#
# The cache dir is fingerprinted by this host's CPU flags: XLA:CPU AOT
# executables encode target-machine features, and loading an entry compiled
# on a different machine (e.g. by a remote AOT helper that shared the old
# fixed path) SIGILLs/segfaults mid-suite.  A per-machine path makes stale
# foreign entries unloadable by construction.
import hashlib

try:
    with open("/proc/cpuinfo") as fh:
        _flags = next(l for l in fh if l.startswith("flags"))
except (OSError, StopIteration):  # non-Linux fallback
    import platform

    _flags = platform.processor() or platform.machine()
_fp = hashlib.sha256(_flags.encode()).hexdigest()[:12]
if not os.environ.get("BN254_NO_PERSISTENT_CACHE"):
    # One cache dir per xdist worker: concurrent processes sharing a dir
    # can race reader-vs-writer.  BN254_CACHE_DIR overrides for ad-hoc
    # concurrent runs outside pytest-xdist.
    _worker = os.environ.get("PYTEST_XDIST_WORKER", "solo")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("BN254_CACHE_DIR",
                                     f"/tmp/bn254_jax_cache_cpu_{_fp}_{_worker}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


# The full suite in one process segfaults inside XLA:CPU's JIT loader once
# the accumulated compiled-executable footprint gets large (deterministic:
# the compile/cache-load AFTER the giant device-tower programs dies, both
# with and without the persistent cache).  Dropping executable references
# between modules keeps the loaded-code footprint bounded; the persistent
# cache makes per-module recompiles cheap.
import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
    gc.collect()
