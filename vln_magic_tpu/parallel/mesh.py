"""Device mesh construction.

Replaces the reference's NCCL process-group / file-rendezvous machinery
(reference: map_nav_src/utils/distributed.py:21-88, fairseq/distributed_utils.py)
with a single ``jax.sharding.Mesh``: the data axis ('dp') shards episode
batches, the model axis ('mp') shards wide transformer weights
(the fairseq fork's Megatron column/row parallelism,
fairseq/model_parallel/modules/multihead_attention.py:16-24, expressed as
sharding annotations instead of explicit collectives — XLA inserts psum/
all-gather over ICI).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, mp: int = 1,
              axis_names=("dp", "mp")) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % mp != 0:
        raise ValueError(f"{n} devices not divisible by mp={mp}")
    dp = n // mp
    return Mesh(np.array(devs).reshape(dp, mp), axis_names)
