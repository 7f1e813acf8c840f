"""Block-Momentum Update Filtering (BMUF) — data parallelism by periodic
parameter averaging, the alternative DP strategy the reference vendors
(reference: map_nav_src/fairseq/optim/bmuf.py:12-230).

Instead of per-step gradient allreduce, each data-parallel worker trains its
own replica for ``sync_period`` steps; at each sync the replicas are averaged
and filtered through a block-momentum update with optional Nesterov lookahead
(fairseq bmuf.py:196-227: ``grad = prev_global - avg``,
``v = bm * v + (1 - bm) * lr_block * -grad``, workers restart from
``global + bm * v`` under Nesterov).

TPU-native shape: worker replicas are a leading ``W`` axis on every leaf
(shard it over 'dp' with ``jax.sharding``); the sync is a pure function you
call every ``sync_period`` steps — under ``jit`` XLA lowers the mean to an
all-reduce over the mesh axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bmuf_init(params):
    """State for :func:`bmuf_sync`: the global (averaged) model and the
    block-momentum smoothed delta."""
    return {
        "global": jax.tree_util.tree_map(jnp.asarray, params),
        "velocity": jax.tree_util.tree_map(jnp.zeros_like, params),
    }


def replicate_workers(params, num_workers: int):
    """Stack ``num_workers`` copies of a param tree along a new leading axis
    (shard that axis over 'dp' to place one replica per device group)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (num_workers,) + x.shape), params)


def bmuf_sync(worker_params, state, block_momentum: float = 0.875,
              block_lr: float = 1.0, use_nesterov: bool = True):
    """One BMUF synchronization.

    ``worker_params``: pytree with a leading worker axis [W, ...].
    Returns (new_worker_params, new_state): the averaged + momentum-filtered
    global model, re-broadcast to every worker (with the Nesterov lookahead
    ``global + bm * v`` as fairseq's ``_update_global_model`` does).
    """
    bm, lr = block_momentum, block_lr

    def sync(w, g, v):
        avg = w.mean(axis=0)
        delta = avg - g                       # -grad in fairseq's sign
        v2 = bm * v + (1.0 - bm) * lr * delta
        g2 = g + v2
        start = g2 + bm * v2 if use_nesterov else g2
        return jnp.broadcast_to(start[None], w.shape), g2, v2

    out = jax.tree_util.tree_map(sync, worker_params, state["global"],
                                 state["velocity"])
    new_workers = jax.tree_util.tree_map(lambda t: t[0], out,
                                         is_leaf=lambda t: isinstance(t, tuple))
    new_global = jax.tree_util.tree_map(lambda t: t[1], out,
                                        is_leaf=lambda t: isinstance(t, tuple))
    new_vel = jax.tree_util.tree_map(lambda t: t[2], out,
                                     is_leaf=lambda t: isinstance(t, tuple))
    return new_workers, {"global": new_global, "velocity": new_vel}
