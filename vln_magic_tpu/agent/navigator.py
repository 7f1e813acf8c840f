"""High-level navigation agent: the reference's GMapNavAgent equivalent
(reference: map_nav_src/r2r/agent.py:34) rebuilt around the device-resident
rollout.  Owns the world tables, the model(s), and jitted entry points for
greedy evaluation; training lives in agent/trainer.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MagicConfig
from ..env.world import World
from ..models import DualScaleVLNBert
from .evaluator import (Evaluator, build_trajectories,
                        build_trajectories_observed)
from .rollout import Rollout, Tables, init_episodes


def pad_instructions(items, max_len: int, pad_id: int = 1):
    """[B, L] token ids + mask from variable-length encodings (the
    reference's _language_variable, agent.py:63-90, minus the device copies).
    L is bucketed to multiples of 16 to bound jit recompilation."""
    b = len(items)
    L = min(max(len(it["instr_encoding"]) for it in items), max_len)
    L = min(((L + 15) // 16) * 16, max_len)
    ids = np.full((b, L), pad_id, dtype=np.int32)
    mask = np.zeros((b, L), dtype=bool)
    for i, it in enumerate(items):
        enc = np.asarray(it["instr_encoding"])[:L]
        ids[i, : len(enc)] = enc
        mask[i, : len(enc)] = True
    return ids, mask


def episodes_from_items(tables: Tables, world: World, items, model_dims,
                        max_gt_len: int = 24, observed_parity: bool = False,
                        aug: bool = False):
    """``aug=True`` marks the episodes as EnvEdit-augmented: the rollout
    reads the alternate feature table for them (reference env.py:39,78 —
    aug feature DBs cycled per episode)."""
    b = len(items)
    tg = max_gt_len  # fixed shape: TRAIN_MAX_STEP-scale bound (env.py:24)
    scan = np.array([it["scan_idx"] for it in items], np.int32)
    start = np.array([it["path_idx"][0] for it in items], np.int32)
    heading = np.array([it["heading"] for it in items], np.float32)
    gt_path = np.full((b, tg), -1, np.int32)
    gt_len = np.zeros((b,), np.int32)
    for i, it in enumerate(items):
        p = np.asarray(it["path_idx"])
        gt_path[i, : len(p)] = p
        gt_len[i] = len(p)
    return _init_episodes_jit(tables, scan, start, heading, gt_path, gt_len,
                              np.full((b,), bool(aug)),
                              tuple(sorted(model_dims.items())),
                              bool(observed_parity))


@partial(jax.jit, static_argnames=("model_dims_t", "observed_parity"))
def _init_episodes_jit(tables, scan, start, heading, gt_path, gt_len, aug,
                       model_dims_t, observed_parity):
    # eager init_episodes dispatches ~60 ops through the axon tunnel — at
    # parity shapes ([B, N, N] obs-APSP state) that measured 53 s host time
    # at 61 scans (each dispatch pays tunnel latency and queues behind the
    # async feature-table transfer); one jitted call makes it device-side
    # and per-chunk cheap (warm: 0.05 s)
    return init_episodes(tables, scan, start, heading, gt_path, gt_len,
                         dict(model_dims_t), aug=aug,
                         observed_parity=observed_parity)


class Navigator:
    """Greedy-decode navigation agent (the minimum end-to-end slice)."""

    def __init__(self, cfg: MagicConfig, world: World, params=None, rng=None):
        self.cfg = cfg
        self.world = world
        self.tables = Tables.from_world(
            world.tables,
            device_features=getattr(world, "device_features", None))
        self.model = DualScaleVLNBert(
            cfg.model, dtype=jnp.dtype(cfg.train.compute_dtype))
        self.rollout = Rollout(self.tables, cfg.env, self.model)
        if params is None:
            if rng is None:
                rng = jax.random.PRNGKey(cfg.train.seed)
            params = self.init_params(rng)
        self.params = params
        self._jit_cache = {}
        self.mesh = None

    def use_mesh(self, mesh):
        """Shard evaluation over a device mesh: episode batches split on
        'dp', params TP/replicated, tables replicated — the device-sharded
        eval the reference gets from per-rank env slices + all_gather
        (env.py:126-134, main_nav.py:606-607), here as one program over
        ICI."""
        from ..parallel import replicate, shard_params

        dp = mesh.shape.get("dp", 1)
        if self.cfg.train.batch_size % dp != 0:
            raise ValueError(
                f"eval batch_size {self.cfg.train.batch_size} not "
                f"divisible by dp={dp}")
        self.mesh = mesh
        self.params = shard_params(self.params, mesh)
        self.tables = replicate(self.tables, mesh)
        self.rollout.t = self.tables
        return self

    def init_params(self, rng):
        from ..models.vlnbert import dummy_step_batch

        c = self.cfg.model
        batch = dummy_step_batch(c, batch_size=1, txt_len=8,
                                 pano_len=self.tables.cand_ids.shape[2] + 36,
                                 gmap_len=self.cfg.env.max_gmap_len)
        return jax.jit(self.model.init)(rng, batch)

    def _run_fn(self, feedback: str, train_ml, deterministic: bool,
                ensemble_n: int = 1):
        key = (feedback, train_ml, deterministic, ensemble_n)
        if key not in self._jit_cache:
            # world tables enter as a jit ARGUMENT (device buffers), never a
            # closure constant — closed-over tables are baked into the XLA
            # program and the compile blows up with scan count
            # (rollout.run docstring)
            def fn(params, tables, state, txt_ids, txt_masks, rng, zdicts):
                return self.rollout.run(params, state, txt_ids, txt_masks,
                                        feedback, rng, train_ml, deterministic,
                                        zdicts=zdicts, ensemble_n=ensemble_n,
                                        tables=tables)
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def run_items(self, items, feedback="argmax", rng=None, zdicts=None,
                  ensemble_n=1):
        txt_ids, txt_masks = pad_instructions(items, self.cfg.env.max_instr_len)
        state = episodes_from_items(
            self.tables, self.world, items, self.rollout.model_dims,
            observed_parity=self.cfg.env.observed_graph_parity)
        fn = self._run_fn(feedback, None, True, ensemble_n)
        txt_ids, txt_masks = jnp.asarray(txt_ids), jnp.asarray(txt_masks)
        if self.mesh is not None:
            from ..parallel import shard_batch, shard_pytree_batch

            state = shard_pytree_batch(state, self.mesh)
            txt_ids = shard_batch(txt_ids, self.mesh)
            txt_masks = shard_batch(txt_masks, self.mesh)
            ctx = jax.set_mesh(self.mesh)
        else:
            import contextlib

            ctx = contextlib.nullcontext()
        with ctx:
            state, aux = fn(self.params, self.tables, state, txt_ids,
                            txt_masks,
                            rng if rng is not None else jax.random.PRNGKey(0),
                            zdicts or {})
        return state, aux

    def evaluate(self, items, feedback="argmax", batch_size=None,
                 zdicts=None, ensemble_n=1, detailed_output=False,
                 stream=None):
        """Greedy decode + metrics over an item list (the reference's
        valid() loop, main_nav.py:561-667, without the process boundary).

        ``stream``: continuous-batching decode (agent/streaming.py) — lanes
        refill from an episode queue inside the compiled scan instead of
        idling until the wave's slowest episode ends.  ``None`` (default)
        auto-enables it when eligible (argmax, full-table path, no ensemble/
        detailed output/mesh); per-episode decodes are pinned identical to
        the batch path (tests/test_streaming.py).  The default is measured,
        not assumed: at the TRAINED regime (600-iter IL recipe, live
        fraction 0.478) streaming beats waves 17.6k vs 17.4k steps/s on
        TPU, and wins more the lower the live fraction falls
        (scripts/measure_stream_gate.py; docs/PERF.md round 5)."""
        bs = batch_size or self.cfg.train.batch_size
        eligible = (feedback == "argmax" and ensemble_n == 1
                    and not detailed_output and self.mesh is None
                    and not self.cfg.env.observed_graph_parity)
        if stream is None:
            stream = eligible and len(items) > bs
        if stream:
            if not eligible:
                raise ValueError("stream=True needs argmax feedback, no "
                                 "ensemble/detailed_output/mesh, and the "
                                 "full-table (non-parity) path")
            return self._evaluate_stream(items, bs, zdicts)
        preds = []
        gmap_overflow = 0
        for i in range(0, len(items), bs):
            chunk = items[i : i + bs]
            n_real = len(chunk)
            if n_real < bs:   # pad the tail batch to keep shapes static
                chunk = chunk + [chunk[-1]] * (bs - n_real)
            state, aux = self.run_items(chunk, feedback, zdicts=zdicts,
                                        ensemble_n=ensemble_n)
            gmap_overflow += int(aux["gmap_overflow"])
            if self.cfg.env.observed_graph_parity:
                chunk_preds = build_trajectories_observed(
                    self.world, chunk, aux["actions"], aux["traj_nodes"],
                    aux["traj_len"], aux["stop_node"],
                    aux["final_cur"])[:n_real]
            else:
                chunk_preds = build_trajectories(
                    self.world, chunk, aux["actions"], aux["stop_node"],
                    aux["final_cur"])[:n_real]
            if detailed_output:
                # per-node stop probabilities (reference --detailed_output,
                # agent.py:1091-1095)
                scores = np.asarray(state.stop_scores)
                for b, p in enumerate(chunk_preds):
                    g = self.world.graphs[p["scan_idx"]]
                    p["details"] = {
                        g.node_ids[i]: {"stop_prob": float(scores[b, i])}
                        for i in np.flatnonzero(
                            scores[b, : g.num_nodes] > -1e8)}
            preds.extend(chunk_preds)
        ev = Evaluator(self.world, items)
        avg, per_item = ev.eval_metrics(preds)
        # episodes whose observed-node count exceeded max_gmap_len at any
        # step (tokens silently truncated — raise --max_gmap_len); padded
        # tail duplicates can overcount by a few, never undercount
        avg["gmap_overflow"] = float(gmap_overflow)
        return (avg, per_item), preds

    def stream_eval(self, batch_size=None):
        """The continuous-batching decoder, cached per lane width."""
        from .streaming import StreamEval

        bs = batch_size or self.cfg.train.batch_size
        key = ("stream", bs)
        if key not in self._jit_cache:
            self._jit_cache[key] = StreamEval(self.rollout, self.cfg.env, bs)
        return self._jit_cache[key]

    def _evaluate_stream(self, items, bs, zdicts):
        se = self.stream_eval(bs)
        out = se.run(self.params, self.tables, items,
                     self.cfg.env.max_instr_len, zdicts=zdicts)
        preds = build_trajectories(
            self.world, items, out["actions"].T, out["stop_node"],
            out["final_cur"])
        ev = Evaluator(self.world, items)
        avg, per_item = ev.eval_metrics(preds)
        avg["gmap_overflow"] = float(out["overflow"].sum())
        return (avg, per_item), preds
