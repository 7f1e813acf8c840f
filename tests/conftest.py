import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (driver validates the real path separately).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def tiny_world():
    from vln_magic_tpu.env import make_synthetic_world

    return make_synthetic_world(num_scans=2, nodes_per_scan=20, feat_dim=32, seed=0)


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
