"""Sharding rules: parameter partition specs (Megatron-style column/row
splits) and batch sharding over the data axis.

The layout follows the standard tensor-parallel transformer recipe the
reference's fairseq fork hooks into (fairseq/model_parallel/modules/
multihead_attention.py: ColumnParallelLinear QKV, RowParallelLinear output):
  - attention query/key/value kernels, FFN up-projection: split output dim
    over 'mp' (column parallel)
  - attention output, FFN down-projection: split input dim over 'mp'
    (row parallel) — XLA inserts the psum
  - word embedding: vocab-parallel over 'mp'
  - everything else (biases, LayerNorms, small heads): replicated
Batches shard over 'dp'.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLUMN_PARALLEL = ("query", "key", "value", "intermediate", "z_proj")
ROW_PARALLEL = ("out", "output")


def param_spec(path, leaf) -> P:
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    if leaf.ndim < 2:
        return P()
    if "word_embeddings" in names and names[-1] == "embedding":
        return P("mp", None)
    if names[-1] == "kernel":
        parent = names[-2] if len(names) >= 2 else ""
        if parent in COLUMN_PARALLEL:
            return P(None, "mp")
        if parent in ROW_PARALLEL:
            return P("mp", None)
    return P()


def shard_params(params, mesh: Mesh):
    """Apply partition specs to a parameter pytree (skipping any leaf whose
    dims don't divide the mesh axis — tiny test models stay replicated)."""
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def place(path, leaf):
        spec = param_spec(path, leaf)
        ok = True
        for dim, ax in zip(leaf.shape, spec):
            if ax is not None and dim % axis_sizes[ax] != 0:
                ok = False
        if not ok:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def batch_spec(leaf) -> P:
    return P("dp", *([None] * (np.ndim(leaf) - 1))) if np.ndim(leaf) >= 1 else P()


def shard_batch(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, batch_spec(x)))


def shard_pytree_batch(tree, mesh: Mesh):
    """Shard every leaf of a batch-leading pytree (e.g. EpisodeBatch) on 'dp'."""
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(
            leaf, NamedSharding(mesh, batch_spec(leaf))), tree)


def replicate(tree, mesh: Mesh):
    """Replicate every leaf on the full mesh (world tables, small state)."""
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P())), tree)
