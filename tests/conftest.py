import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (the driver validates the real path
# separately).  The environment pins JAX_PLATFORMS=axon (the tunneled TPU), so
# both the env var and jax.config must be overridden here, before any test
# imports jax.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU AOT cache loads log a benign machine-feature banner per entry
# ("+prefer-no-scatter ... not supported" — tuning hints compared against
# CPUID); silence C++ logging so cached runs stay readable.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: this box has 1 CPU and the suite's wall
# time is dominated by XLA compiles, so reruns hit the disk cache instead of
# recompiling (measured ~2.4x on a warm suite).  Override the dir with
# VLN_JAX_CACHE_DIR; set it empty to disable.
_cache_dir = os.environ.get("VLN_JAX_CACHE_DIR",
                            "/tmp/vln_magic_tpu_jax_cache")
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # env-var forms so the subprocess tests (CLI end-to-end, dryrun
    # contract) inherit the cache too
    os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache_dir
    os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.3"
    os.environ["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "-1"

import numpy as np
import pytest


@pytest.fixture(scope="session")
def tiny_world():
    from vln_magic_tpu.env import make_synthetic_world

    return make_synthetic_world(num_scans=2, nodes_per_scan=20, feat_dim=32, seed=0)


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
