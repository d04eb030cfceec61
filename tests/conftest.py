"""Test harness config: force CPU with 8 virtual devices so sharding tests
run anywhere (mirrors the driver's dryrun environment).

The axon TPU environment pins its platform from sitecustomize before conftest
runs, so this goes through force_cpu_devices (runtime backend re-selection)
rather than env vars. Set ALAYA_TEST_TPU=1 to run the suite against the real
chip instead (sharding tests will skip if fewer than 8 devices)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("ALAYA_TEST_TPU"):
    from alayalite_tpu.utils.platforms import force_cpu_devices

    force_cpu_devices(8)

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: beam-search programs are compile-heavy on the
# CPU backend; cache them across test runs.
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
