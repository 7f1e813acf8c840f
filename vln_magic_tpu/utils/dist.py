"""Multi-host coordination: result gathering and broadcast.

Replaces the reference's pickle-over-NCCL machinery (reference:
map_nav_src/utils/distributed.py:90-160 — all_gather of pickled prediction
lists, merge_dist_results; MetaLoader's task-id broadcast,
pretrain_src/data/loader.py:56-59) with ``jax.experimental.multihost_utils``
for array data and a seeded-generator convention for control decisions
(identical draws on every host need no broadcast at all).

Single-process runs (the common case on one chip) pass everything through
untouched.
"""

from __future__ import annotations

import jax
import numpy as np


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    return jax.process_index() == 0


def all_gather_arrays(x: np.ndarray) -> np.ndarray:
    """Gather a same-shape array from every process; [P, ...] result."""
    if jax.process_count() == 1:
        return np.asarray(x)[None]
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(np.asarray(x)))


def merge_dist_results(per_process_preds: list[list]) -> list:
    """Flatten per-process prediction lists, deduplicating by instr_id
    (reference merge_dist_results, utils/distributed.py:160)."""
    seen = set()
    out = []
    for preds in per_process_preds:
        for p in preds:
            key = p.get("instr_id") if isinstance(p, dict) else id(p)
            if key in seen:
                continue
            seen.add(key)
            out.append(p)
    return out


def gather_predictions(preds: list[dict]) -> list[dict]:
    """Multi-host prediction merge.  Object (non-array) payloads use a
    bytes-over-array gather, mirroring the reference's pickle+ByteTensor
    trick but over the JAX collective."""
    if jax.process_count() == 1:
        return preds
    import pickle

    from jax.experimental import multihost_utils

    blob = np.frombuffer(pickle.dumps(preds), dtype=np.uint8)
    sizes = all_gather_arrays(np.array([blob.size], np.int64))[:, 0]
    pad = int(sizes.max())
    padded = np.zeros(pad, np.uint8)
    padded[: blob.size] = blob
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    lists = [pickle.loads(gathered[p, : sizes[p]].tobytes())
             for p in range(gathered.shape[0])]
    return merge_dist_results(lists)


def shard_items(items: list, n_shards: int | None = None,
                shard_id: int | None = None) -> list:
    """Contiguous per-process eval slices (reference sel_data_idxs,
    env.py:126-134)."""
    n = n_shards or jax.process_count()
    i = shard_id if shard_id is not None else jax.process_index()
    per = len(items) // n
    start = per * i
    end = None if i == n - 1 else start + per
    return items[start:end]
