"""Test env: force CPU backend with 8 virtual devices so sharding tests run
anywhere (the TPU analogue of a fake backend; the reference has none —
SURVEY.md §4)."""

import os

# Force CPU even when the outer environment targets a real TPU
# (JAX_PLATFORMS=axon): tests must be hermetic and fast.  The axon plugin
# ignores the env var, so set it through jax.config before backends init.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the shard_map stages of the sharded GCPS
# pipeline cost minutes of CPU compile; cache them across test runs
jax.config.update("jax_compilation_cache_dir", "/tmp/alga_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


def random_dna(rng, n: int) -> str:
    return "".join("ACGT"[i] for i in rng.integers(0, 4, size=n))


@pytest.fixture
def make_dna(rng):
    def f(n):
        return random_dna(rng, n)
    return f
