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

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def tiny_world():
    from vln_magic_tpu.env import make_synthetic_world

    return make_synthetic_world(num_scans=2, nodes_per_scan=20, feat_dim=32, seed=0)


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
