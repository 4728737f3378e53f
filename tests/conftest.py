"""Test configuration: force CPU with 8 virtual devices so sharding tests
run without TPU hardware (SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms to "axon,cpu" (real TPU via
# tunnel) regardless of JAX_PLATFORMS; override it back to CPU for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# CPU compiles of the scanned decoder dominate suite time; cache them on disk
# so repeat runs (CI, driver) skip compilation.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# XLA:CPU crashes (SIGSEGV or abort) when loading yet another executable
# late in a long single-process session — observed around test ~190 of the
# fast tier in three distinct paths: backend_compile_and_load (fresh
# compile), put_executable_and_time (cache serialize), and
# get_executable_and_time (cache deserialize). The same programs
# compile/serialize/deserialize fine in a fresh process, host RAM is barely
# used, and /proc maps stay flat (~1.8k) — the common factor is the NUMBER
# of live loaded executables in the process. Mitigation: periodically drop
# every traced/compiled function with jax.clear_caches() so the live set
# stays bounded; re-runs of cleared programs re-load from the persistent
# cache (cheap) instead of recompiling.
_CLEAR_CACHES_EVERY = int(
    os.environ.get("DYNAMIC_LLAVA_CLEAR_CACHES_EVERY", "50")
)
_test_counter = {"n": 0}


def pytest_runtest_setup(item):
    _test_counter["n"] += 1
    if _CLEAR_CACHES_EVERY and _test_counter["n"] % _CLEAR_CACHES_EVERY == 0:
        import gc

        jax.clear_caches()
        gc.collect()
