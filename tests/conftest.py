"""Test configuration.

The suite is hermetic: it always runs on the CPU backend with 8 virtual
devices (so mesh/sharding tests exercise real multi-device partitioning
without TPU hardware) — the "CPU-backend run mode" the reference lacked
(its tests required a physical GPU; SURVEY §4).  Env vars must be set
before the first jax import, hence this happens at conftest import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Tests inject synthetic fused-compile failures; those toy signatures
# must never reach the cross-process disabled-signature store (ops/als
# _disabled_store_path) — a CLI test calling enable_compile_cache in the
# same process would otherwise turn persistence on mid-suite.
os.environ["CU2REC_NO_FUSED_PERSIST"] = "1"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import pytest

# Persistent XLA compilation cache: makes repeat test runs fast.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
import jax  # noqa: E402

# Some environments install a TPU platform plugin that overrides the
# JAX_PLATFORMS env var at import time; the config update below wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
assert jax.default_backend() == "cpu", "test suite must run on CPU backend"
assert len(jax.devices()) == 8

DATA_DIR = pathlib.Path(__file__).parent / "data"


@pytest.fixture
def data_dir() -> pathlib.Path:
    return DATA_DIR


@pytest.fixture
def toy_ratings(data_dir):
    """The 6-user × 5-item, 18-nonzero toy fixture (data/test/test_ratings.csv
    of the reference)."""
    from cu2rec_tpu.data import read_ratings_csv
    return read_ratings_csv(str(data_dir / "test_ratings.csv"))


@pytest.fixture
def toy_csr(toy_ratings):
    from cu2rec_tpu.data import build_csr
    return build_csr(toy_ratings)
