"""Batched, fully device-resident navigation rollout as a ``lax.scan``.

TPU-first inversion of the reference rollout (reference:
map_nav_src/r2r/agent.py:722-1158), which interleaves per-sample Python graph
mutation, numpy feature assembly, MatterSim C++ calls and CUDA forwards per
step.  Here the episode state (current node, discretized orientation, the
topological gmap: visited/observed sets, observation order, per-node averaged
embeddings, stop scores) is a pytree of padded arrays, the step is one jitted
function of pure gathers + model forwards, and the time loop is ``lax.scan``
with ``ended`` masking instead of early exit.

Token layouts match the reference exactly so checkpoints/targets transfer:
  gmap tokens: [stop], [mem], visited (observation order), frontier (obs order)
               (agent.py:199-210); [mem] masked from attention and actions
               (agent.py:233).
  vp tokens:   [stop], [mem], candidates..., remaining views...
               (agent.py:290-328).

Graph-information modes: the DEFAULT mode uses the *full* connectivity
graph for pairwise gmap distances and backtrack paths (differs from the
reference only when the true shortest route between two observed nodes
crosses unobserved territory); ``env.observed_graph_parity`` switches to the
reference GraphMap's incremental FloydGraph model exactly — visited-pivot
all-pairs distances and visited-intermediate path walks — pinned
episode-for-episode against a host-side reimplementation of the reference
agent over the torch oracle (tests/test_episode_oracle.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import EnvConfig, ModelConfig
from ..env.world import WorldTables
from . import geometry_jax as gj

# numpy scalars, NOT jnp: a module-level jnp constant is a device array; every
# jitted program that closes over one embeds it as a constant, and MLIR
# lowering fetches its value with a device sync — which blocks behind any
# in-flight async transfer (the 2.2 GB 61-scan feature table takes ~3 min
# through the axon tunnel, measured as a 176 s "lower()" stall).
BIG = np.int32(1_000_000)     # obs-order offset separating frontier from visited
UNOBS = np.int32(2_000_000)   # obs-order value for unobserved nodes
NEG_INF = -1e9


@struct.dataclass
class Tables:
    """WorldTables as device arrays (closed over by the jitted step)."""

    node_mask: jnp.ndarray
    positions: jnp.ndarray
    dist: jnp.ndarray
    steps: jnp.ndarray
    next_hop: jnp.ndarray
    cand_ids: jnp.ndarray
    cand_dist: jnp.ndarray
    cand_view: jnp.ndarray
    cand_heading: jnp.ndarray
    cand_elevation: jnp.ndarray
    cand_mask: jnp.ndarray
    features: jnp.ndarray
    # EnvEdit-style alternate feature table (reference env.py:39,78: a list
    # of aug feature DBs cycled per episode); None when unused
    aug_features: jnp.ndarray | None = None

    @classmethod
    def from_world(cls, t: WorldTables, aug_features=None,
                   device_features=None) -> "Tables":
        """``device_features``: an already-in-flight device copy of
        ``t.features`` (World.__init__ starts the transfer early so the
        2 GB-scale table streams while the host finishes APSP/candidate
        work); passing it here avoids a second transfer."""
        fields = ("node_mask", "positions", "dist", "steps", "next_hop",
                  "cand_ids", "cand_dist", "cand_view", "cand_heading",
                  "cand_elevation", "cand_mask", "features")
        arrays = {f: jnp.asarray(getattr(t, f)) for f in fields
                  if f != "features"}
        arrays["features"] = (device_features if device_features is not None
                              else jnp.asarray(t.features))
        return cls(**arrays,
                   aug_features=None if aug_features is None
                   else jnp.asarray(aug_features))


@struct.dataclass
class EpisodeBatch:
    """Batched episode + topological-map state (the reference's GraphMap,
    SURVEY §2.6, as arrays).  N = max nodes/scan (+1 trash slot for masked
    scatters)."""

    scan: jnp.ndarray          # [B] i32
    cur: jnp.ndarray           # [B] i32
    heading: jnp.ndarray       # [B] f32
    elevation: jnp.ndarray     # [B] f32
    start: jnp.ndarray         # [B] i32
    goal: jnp.ndarray          # [B] i32
    gt_path: jnp.ndarray       # [B, TG] i32, -1 padded
    gt_len: jnp.ndarray        # [B] i32
    visited: jnp.ndarray       # [B, N+1] bool
    obs_order: jnp.ndarray     # [B, N+1] i32 (UNOBS if unobserved)
    obs_count: jnp.ndarray     # [B] i32
    step_ids: jnp.ndarray      # [B, N+1] i32
    stop_scores: jnp.ndarray   # [B, N+1] f32
    embed_sum: dict            # role -> [B, N+1, D]
    embed_cnt: dict            # role -> [B, N+1]
    mem: dict                  # role -> [B, D] ([MEM] recurrence, cls_embeds)
    aug: jnp.ndarray           # [B] bool — use the aug feature table
    traj_nodes: jnp.ndarray    # [B, TRAJ+1] i32 expanded trajectory (-1 pad)
    traj_len: jnp.ndarray     # [B] i32
    # observed-subgraph all-pairs distances/hops (GraphMap parity mode);
    # [B, 1, 1] dummies when the mode is off
    obs_dist: jnp.ndarray      # [B, N, N] f32
    obs_steps: jnp.ndarray     # [B, N, N] f32
    ended: jnp.ndarray         # [B] bool

    @property
    def batch_size(self):
        return self.scan.shape[0]


MAX_TRAJ = 96   # expanded-trajectory buffer (bounded by steps x jump hops)
WALK_HOPS = 32  # next-hop walk bound (>= any scan diameter)
INF_DIST = 1e9


def _iota_like(anchor, n: int) -> jnp.ndarray:
    """[n] i32 0..n-1 derived from ``anchor`` so it stays TRACED under jit.

    ``jnp.arange``/``jnp.eye``/``jnp.zeros`` with concrete shapes execute
    EAGERLY during tracing: each is a device dispatch, and through the axon
    TPU tunnel every dispatch both pays tunnel latency and QUEUES BEHIND any
    in-flight async transfer (the 61-scan feature table streams for ~3 min).
    ~60 such creation ops made "tracing" init_episodes at parity shapes
    appear to take 152 s.  Anchoring creation ops on a traced input keeps
    them inside the program: tracing is pure Python (0.1 s) and nothing
    syncs before the single compiled call executes."""
    return jnp.cumsum(jnp.ones_like(anchor, jnp.int32, shape=(n,))) - 1


def relax_observed(state: EpisodeBatch, tables: Tables, v, live):
    """Incremental observed-subgraph all-pairs update (GraphMap parity).

    Mirrors the reference GraphMap's FloydGraph EXACTLY (SURVEY §2.6: edges
    enter via add_edge when a node's candidates are seen; ``update(k)``
    pivots through k on arrival — only VISITED nodes ever pivot).  The
    distance model is therefore "shortest path whose intermediate nodes are
    all visited": a route through a frontier node does NOT exist, even when
    both of its edges have been observed (round-4 episode oracle caught the
    earlier refresh-through-candidates formulation finding such routes —
    shorter, but not what the reference computes).

    On arrival at ``v``: (1) add_edge — d(v, c) improves to the direct edge
    weight for each candidate c (strict <, FloydGraph.add_edge semantics);
    (2) pivot — d(i, j) = min(d(i, j), d(i, v) + d(v, j)).  d(v, .) is
    exact at pivot time within the model: a path from v can only leave
    through an edge whose far end is visited (frontier candidates cannot be
    intermediates), and those were relaxed when that endpoint pivoted."""
    t = tables
    b = state.batch_size
    n = t.node_mask.shape[1]
    D, S = state.obs_dist, state.obs_steps

    cand = t.cand_ids[state.scan, v]                        # [B, C]
    cmask = t.cand_mask[state.scan, v] & live[:, None]
    w = t.dist[state.scan[:, None], v[:, None], jnp.maximum(cand, 0)]
    onehot_c = jax.nn.one_hot(jnp.where(cmask, cand, -1), n,
                              dtype=jnp.float32)            # [B, C, N]
    big = jnp.float32(INF_DIST)

    onehot_v = jax.nn.one_hot(v, n, dtype=jnp.float32)      # [B, N]
    row_v_d = jnp.einsum("bn,bnm->bm", onehot_v, D,
                         preferred_element_type=jnp.float32)
    row_v_s = jnp.einsum("bn,bnm->bm", onehot_v, S,
                         preferred_element_type=jnp.float32)
    # add_edge: direct weights scattered onto v's row (min over candidate
    # slots resolves duplicate candidates; strict < keeps FloydGraph's
    # keep-old-on-tie behavior)
    direct_d = jnp.min(
        jnp.where((onehot_c > 0.5) & cmask[..., None], w[..., None], big),
        axis=1)                                             # [B, N]
    use_direct = direct_d < row_v_d
    row_d = jnp.where(use_direct, direct_d, row_v_d)
    row_s = jnp.where(use_direct, 1.0, row_v_s)
    row_d = row_d * (1.0 - onehot_v)                        # d(v, v) = 0
    row_s = row_s * (1.0 - onehot_v)

    new_d = row_d[:, :, None] + row_d[:, None, :]
    new_s = row_s[:, :, None] + row_s[:, None, :]
    better = (new_d < D) & live[:, None, None]
    D2 = jnp.where(better, new_d, D)
    S2 = jnp.where(better, new_s, S)
    return state.replace(obs_dist=D2, obs_steps=S2)


def init_episodes(tables: Tables, scan_idx, start, heading, gt_path, gt_len,
                  model_dims: dict[str, int], aug=None,
                  observed_parity: bool = False) -> EpisodeBatch:
    """Start episodes: agent at gt_path[0] with the item's heading, elevation 0
    (reference env.py:394-405), start node + its candidates observed."""
    scan_idx = jnp.asarray(scan_idx, jnp.int32)
    start = jnp.asarray(start, jnp.int32)
    b = scan_idx.shape[0]
    n1 = tables.node_mask.shape[1] + 1
    gt_path = jnp.asarray(gt_path, jnp.int32)
    gt_len = jnp.asarray(gt_len, jnp.int32)
    goal = jnp.take_along_axis(gt_path, (gt_len - 1)[:, None], axis=1)[:, 0]

    # All creation ops are *_like-anchored on the traced inputs (see
    # _iota_like): plain jnp.zeros/full/eye here run EAGERLY during tracing,
    # and each eager dispatch queues behind in-flight transfers through the
    # axon tunnel (measured 152 s of apparent trace time at parity
    # [256, 320, 320] shapes while the feature table streamed).
    ai, af = scan_idx, jnp.asarray(heading, jnp.float32)   # i32 / f32 anchors
    bi = _iota_like(ai, b)
    if observed_parity:
        n = n1 - 1
        r = _iota_like(ai, n)
        offdiag = r[:, None] != r[None, :]
        apsp0 = jnp.broadcast_to(
            jnp.where(offdiag, jnp.float32(INF_DIST), jnp.float32(0.0)),
            (b, n, n))
    else:
        apsp0 = jnp.zeros_like(af, shape=(b, 1, 1))

    state = EpisodeBatch(
        scan=scan_idx, cur=start,
        heading=af,
        elevation=jnp.zeros_like(af, shape=(b,)),
        start=start, goal=goal, gt_path=gt_path, gt_len=gt_len,
        visited=jnp.zeros_like(ai, dtype=bool, shape=(b, n1)),
        obs_order=jnp.full_like(ai, UNOBS, shape=(b, n1)),
        obs_count=jnp.zeros_like(ai, shape=(b,)),
        # the start node carries step id 1 from the outset (the rollout
        # re-stamps cur=t_step+1 at the top of every step; stamping here too
        # keeps states assembled outside the scan consistent)
        step_ids=jnp.zeros_like(ai, shape=(b, n1)).at[bi, start].set(1),
        stop_scores=jnp.full_like(af, NEG_INF, shape=(b, n1)),
        embed_sum={r: jnp.zeros_like(af, shape=(b, n1, d))
                   for r, d in model_dims.items()},
        embed_cnt={r: jnp.zeros_like(af, shape=(b, n1))
                   for r in model_dims},
        mem={r: jnp.zeros_like(af, shape=(b, d))
             for r, d in model_dims.items()},
        aug=(jnp.zeros_like(ai, dtype=bool, shape=(b,)) if aug is None
             else jnp.asarray(aug, bool)),
        traj_nodes=jnp.full_like(ai, -1, shape=(b, MAX_TRAJ + 1))
            .at[:, 0].set(start),
        traj_len=jnp.ones_like(ai, shape=(b,)),
        obs_dist=apsp0,
        obs_steps=apsp0,
        ended=jnp.zeros_like(ai, dtype=bool, shape=(b,)),
    )
    # the start node is immediately "visited" (GraphMap.update_graph marks the
    # current viewpoint visited on arrival)
    state = state.replace(visited=state.visited.at[bi, start].set(True))
    if observed_parity:
        state = relax_observed(state, tables, start,
                               jnp.ones_like(ai, dtype=bool, shape=(b,)))
    return _observe(state, tables)


def _observe(state: EpisodeBatch, tables: Tables) -> EpisodeBatch:
    """Register the current node and its candidates in the gmap, preserving
    first-observation order (the reference's dict-insertion order,
    agent.py:185-205 via GraphMap.update_graph)."""
    b = state.batch_size
    bi = _iota_like(state.cur, b)
    trash = tables.node_mask.shape[1]

    def add(obs_order, obs_count, idx, valid):
        # idx: [B] node to observe (current), or [B, C] candidates.
        # New nodes get increasing observation orders in slot order; .min is a
        # safe combiner because assigned orders only ever grow.
        if idx.ndim == 1:
            new = valid & (obs_order[bi, idx] == UNOBS)
            tgt = jnp.where(new, idx, trash)
            obs_order = obs_order.at[bi, tgt].min(obs_count)
            return obs_order, obs_count + new.astype(jnp.int32)
        # one-hot row-sum instead of take_along_axis: per-lane-varying
        # gather indices scalarize on TPU (docs/PERF.md round 3).
        # precision=HIGHEST is REQUIRED for exactness of the picked VALUES:
        # the default TPU matmul precision rounds f32 operands through bf16
        # passes, and bf16(UNOBS=2e6) != 2e6 — the == comparison below
        # silently broke observation dedup before this was pinned
        oh = jax.nn.one_hot(idx, obs_order.shape[1], dtype=jnp.float32)
        picked = jnp.einsum("bcn,bn->bc", oh, obs_order.astype(jnp.float32),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        new = valid & (picked == np.float32(UNOBS))
        rank = jnp.cumsum(new.astype(jnp.int32), axis=1) - new.astype(jnp.int32)
        order = obs_count[:, None] + rank
        tgt = jnp.where(new, idx, trash)
        obs_order = obs_order.at[bi[:, None], tgt].min(
            jnp.where(new, order, UNOBS))
        return obs_order, obs_count + new.sum(axis=1, dtype=jnp.int32)

    live = ~state.ended
    obs_order, obs_count = add(state.obs_order, state.obs_count, state.cur, live)
    cand = tables.cand_ids[state.scan, state.cur]
    cand_valid = tables.cand_mask[state.scan, state.cur] & live[:, None]
    obs_order, obs_count = add(obs_order, obs_count,
                               jnp.maximum(cand, 0), cand_valid & (cand >= 0))
    return state.replace(obs_order=obs_order, obs_count=obs_count)


class Rollout:
    """Configured rollout: binds world tables, env config, and the model
    apply functions.  The heavy entry points are plain methods you wrap in
    ``jax.jit`` once (see agent/evaluator.py and agent/trainer.py)."""

    def __init__(self, tables: Tables, env_cfg: EnvConfig, model,
                 teacher_model=None):
        self.t = tables
        self.env = env_cfg
        self.model = model
        self.cfg: ModelConfig = model.cfg
        self.teacher_model = teacher_model
        self.t_cfg: ModelConfig | None = teacher_model.cfg if teacher_model else None
        self.model_dims = {"student": self.cfg.hidden_size}
        if teacher_model is not None:
            self.model_dims["teacher"] = self.t_cfg.hidden_size

    # ------------------------------------------------------------------
    # step-input assembly (the reference's _panorama_feature_variable /
    # _nav_gmap_variable / _nav_vp_variable_mem, as gathers)
    # ------------------------------------------------------------------

    def assemble_pano(self, state: EpisodeBatch):
        t = self.t
        b = state.batch_size
        scan, cur = state.scan, state.cur
        cand_ids = t.cand_ids[scan, cur]                     # [B, C]
        cand_mask = t.cand_mask[scan, cur]
        cand_view = t.cand_view[scan, cur]
        feats36 = t.features[scan, cur].astype(jnp.float32)  # [B, 36, D]
        if t.aug_features is not None:
            aug36 = t.aug_features[scan, cur].astype(jnp.float32)
            feats36 = jnp.where(state.aug[:, None, None], aug36, feats36)

        cand_onehot = jax.nn.one_hot(cand_view, 36, dtype=jnp.float32)
        cand_feat = jnp.einsum("bcv,bvd->bcd", cand_onehot, feats36,
                               preferred_element_type=jnp.float32)
        cand_ang = gj.angle_feature(
            t.cand_heading[scan, cur] - state.heading[:, None],
            t.cand_elevation[scan, cur] - state.elevation[:, None],
            self.cfg.angle_feat_size)
        view_rel = gj.view_angles_relative(state.heading, state.elevation)
        view_ang = gj.angle_feature(view_rel[..., 0], view_rel[..., 1],
                                    self.cfg.angle_feat_size)
        used = ((cand_view[:, :, None] == jnp.arange(36)[None, None, :])
                & cand_mask[:, :, None]).any(axis=1)          # [B, 36]

        view_img_fts = jnp.concatenate([cand_feat, feats36], axis=1)
        ang = jnp.concatenate([cand_ang, view_ang], axis=1)
        box = jnp.ones(ang.shape[:-1] + (3,), jnp.float32)
        loc_fts = jnp.concatenate([ang, box], axis=-1)
        pano_masks = jnp.concatenate([cand_mask, ~used], axis=1)
        nav_types = jnp.concatenate(
            [cand_mask.astype(jnp.int32),
             jnp.zeros((b, 36), jnp.int32)], axis=1)
        return {
            "view_img_fts": view_img_fts, "loc_fts": loc_fts,
            "nav_types": nav_types, "pano_masks": pano_masks,
            "cand_ids": cand_ids, "cand_mask": cand_mask,
        }

    def update_node_embeds(self, state: EpisodeBatch, role: str,
                           pano_embeds, pano_fused, cand_ids, cand_mask):
        """Rewrite the current node with the fused pano embedding; accumulate
        candidate-view embeddings into unvisited nodes (averaged on read),
        matching GraphMap.update_node_embed semantics (agent.py:905-924)."""
        b = state.batch_size
        bi = jnp.arange(b)
        trash = self.t.node_mask.shape[1]
        live = ~state.ended

        es = state.embed_sum[role]
        ec = state.embed_cnt[role]
        cur_t = jnp.where(live, state.cur, trash)
        es = es.at[bi, cur_t].set(pano_fused)   # trash slot absorbs ended rows
        ec = ec.at[bi, cur_t].set(1.0)

        # candidate visited flags via the one-hot the scatter-add needs
        # anyway (take_along_axis scalarizes, docs/PERF.md round 3)
        oh0 = jax.nn.one_hot(jnp.maximum(cand_ids, 0), es.shape[1],
                             dtype=jnp.float32)                  # [B, C, N+1]
        cand_visited = jnp.einsum(
            "bcn,bn->bc", oh0, state.visited.astype(jnp.float32),
            preferred_element_type=jnp.float32) > 0.5
        upd = cand_mask & ~cand_visited & live[:, None]
        # scatter-add as a one-hot matmul (MXU) — C-row scatters serialize
        cand_emb = pano_embeds[:, : cand_ids.shape[1]]
        onehot = oh0 * upd[..., None].astype(jnp.float32)
        es = es + jnp.einsum("bcn,bcd->bnd", onehot, cand_emb,
                             preferred_element_type=jnp.float32)
        ec = ec + onehot.sum(axis=1)
        return state.replace(
            embed_sum={**state.embed_sum, role: es},
            embed_cnt={**state.embed_cnt, role: ec})

    def assemble_gmap(self, state: EpisodeBatch, role: str, base=None):
        """Role view of the gmap: shared token structure (``base``,
        computed once per step even with two models) + this role's node
        embeddings and [MEM] recurrence."""
        base = base or self.assemble_gmap_base(state)
        b = state.batch_size
        n = self.t.node_mask.shape[1]
        onehot = base["token_onehot"]
        emb = state.embed_sum[role][:, :n]
        cnt = jnp.maximum(state.embed_cnt[role][:, :n], 1.0)
        node_embed = emb / cnt[..., None]
        tok_embed = jnp.einsum("bgn,bnd->bgd", onehot, node_embed,
                               preferred_element_type=jnp.float32)
        mem_embed = state.mem[role]
        d = tok_embed.shape[-1]
        img_embeds = jnp.concatenate(
            [jnp.zeros((b, 1, d)), mem_embed[:, None, :], tok_embed], axis=1)
        return {**base, "gmap_img_embeds": img_embeds}

    def assemble_gmap_base(self, state: EpisodeBatch, ep=None):
        """``ep``: per-episode world-table slices hoisted out of the scan by
        ``run()`` (the [B, N, N] gathers on ``state.scan`` are episode
        constants; gathering them per step cost ~2.5% of eval device time)."""
        t = self.t
        env = self.env
        b = state.batch_size
        g = env.max_gmap_len
        n = t.node_mask.shape[1]
        bi = jnp.arange(b)[:, None]

        observed = state.obs_order[:, :n] < UNOBS
        # token visited-classification: normally the true visit history; with
        # act_visited_nodes only the current viewpoint counts, so earlier
        # nodes stay selectable actions (agent.py:186-195)
        if env.act_visited_nodes:
            eff_visited = (jnp.arange(n)[None, :] == state.cur[:, None])
        else:
            eff_visited = state.visited[:, :n]
        # visited first (observation order), then frontier (observation order)
        key = state.obs_order[:, :n] + jnp.where(eff_visited, 0, BIG)
        k = min(g - 2, n)
        token_node = jnp.argsort(key, axis=1)[:, :k].astype(jnp.int32)
        # ALL per-token row lookups ride one one-hot contraction (MXU): a
        # take_along_axis with per-lane-varying indices scalarizes — the
        # three gathers that used to live here (token_valid, visited_tok,
        # step_ids) measured 23% of eval device time (x/profile round 3:
        # pred[256,126]+s32[256,126] custom fusions at ~0.33 ms/step each).
        # One-hot row sums select exactly one element, so the values are
        # bit-identical to the gathers.
        onehot_tok = jax.nn.one_hot(token_node, n, dtype=jnp.float32)
        tokrow = lambda x: jnp.einsum("bgn,bn->bg", onehot_tok, x,
                                      preferred_element_type=jnp.float32)
        token_valid = tokrow(observed.astype(jnp.float32)) > 0.5
        visited_tok = tokrow(eff_visited.astype(jnp.float32)) > 0.5
        # step ids are small ints (<= max_action_len + 1): exact in f32
        step_tok = tokrow(state.step_ids[:, :n].astype(jnp.float32)) \
            .astype(jnp.int32)
        if k < g - 2:   # gmap budget exceeds scan size: pad with dead slots
            pad = g - 2 - k
            token_node = jnp.concatenate(
                [token_node, jnp.zeros((b, pad), jnp.int32)], axis=1)
            token_valid = jnp.concatenate(
                [token_valid, jnp.zeros((b, pad), bool)], axis=1)
            visited_tok = jnp.concatenate(
                [visited_tok, jnp.zeros((b, pad), bool)], axis=1)
            step_tok = jnp.concatenate(
                [step_tok, jnp.zeros((b, pad), jnp.int32)], axis=1)
            onehot_tok = jnp.concatenate(
                [onehot_tok, jnp.zeros((b, pad, n), jnp.float32)], axis=1)

        gmap_masks = jnp.concatenate(
            [jnp.ones((b, 1), bool), jnp.zeros((b, 1), bool),  # [stop], [mem]
             token_valid], axis=1)
        gmap_visited = jnp.concatenate(
            [jnp.zeros((b, 1), bool), jnp.ones((b, 1), bool),
             visited_tok & token_valid], axis=1)
        step_ids = jnp.concatenate(
            [jnp.zeros((b, 2), jnp.int32), step_tok], axis=1)

        # invalid tokens zeroed for every downstream embedding/geometry
        # contraction (was a second one_hot over where(valid, node, -1))
        onehot = onehot_tok * token_valid[..., None].astype(jnp.float32)

        pos_b = ep["pos"] if ep is not None else t.positions[state.scan]
        parity = self.env.observed_graph_parity
        onehot_cur = jax.nn.one_hot(state.cur, n, dtype=jnp.float32)
        cur_pos = jnp.einsum("bn,bnd->bd", onehot_cur, pos_b,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)  # [B, 3]
        tok_pos = jnp.einsum("bgn,bnd->bgd", onehot, pos_b,
                             preferred_element_type=jnp.float32)
        if parity:
            dist_row = jnp.einsum("bn,bnm->bm", onehot_cur, state.obs_dist,
                                  preferred_element_type=jnp.float32)
            steps_row = jnp.einsum("bn,bnm->bm", onehot_cur, state.obs_steps,
                                   preferred_element_type=jnp.float32)
        else:
            dist_row = t.dist[state.scan, state.cur]          # [B, N]
            steps_row = t.steps[state.scan, state.cur].astype(jnp.float32)
        gdist = jnp.einsum("bgn,bn->bg", onehot, dist_row,
                           preferred_element_type=jnp.float32)
        gsteps = jnp.einsum("bgn,bn->bg", onehot, steps_row,
                            preferred_element_type=jnp.float32)
        pos7 = gj.pos_features_7(cur_pos[:, None, :], tok_pos, gdist, gsteps,
                                 state.heading, state.elevation,
                                 self.cfg.angle_feat_size)
        # [stop]/[mem] slots: angle features of (0, 0) + zero distances
        # (reference env.py:218-219: rel_angles [0,0] -> [0,1,0,1])
        null7 = jnp.concatenate(
            [gj.angle_feature(jnp.zeros(()), jnp.zeros(()),
                              self.cfg.angle_feat_size),
             jnp.zeros((3,))])[None, None, :]
        pos_fts = jnp.concatenate(
            [jnp.broadcast_to(null7, (b, 2, null7.shape[-1])), pos7], axis=1)

        # pairwise graph distances for the sprel bias (slots >= 2).
        # TPU point/row gathers of short rows serialize and dominated the
        # whole rollout (2.2x); the one-hot matmul formulation keeps the
        # lookup on the MXU: onehot(tok) @ dist[scan] @ onehot(tok)^T.
        if parity:
            dist_b = state.obs_dist
        elif ep is not None:
            dist_b = ep["dist_f"]
        else:
            dist_b = t.dist[state.scan]
        rows = jnp.einsum("bgn,bnm->bgm", onehot, dist_b,
                          preferred_element_type=jnp.float32)
        pair = jnp.einsum("bgm,bhm->bgh", rows, onehot,
                          preferred_element_type=jnp.float32)
        pair_dists = jnp.zeros((b, g, g), jnp.float32)
        pair_dists = pair_dists.at[:, 2:, 2:].set(pair)

        no_vp_left = ~((observed & ~eff_visited).any(axis=1))
        return {
            "gmap_step_ids": step_ids,
            "gmap_pos_fts": pos_fts, "gmap_masks": gmap_masks,
            "gmap_visited_masks": gmap_visited, "gmap_pair_dists": pair_dists,
            "token_node": token_node, "token_valid": token_valid,
            "token_onehot": onehot, "no_vp_left": no_vp_left,
        }

    def assemble_vp(self, state: EpisodeBatch, role: str, pano,
                    pano_embeds, gmap, base=None):
        b = state.batch_size
        d = pano_embeds.shape[-1]
        mem_embed = state.mem[role]
        vp_img_embeds = jnp.concatenate(
            [jnp.zeros((b, 1, d)), mem_embed[:, None, :], pano_embeds], axis=1)
        base = base or self.assemble_vp_base(state, pano, gmap)
        return {**base, "vp_img_embeds": vp_img_embeds}

    def assemble_vp_base(self, state: EpisodeBatch, pano, gmap, ep=None):
        t = self.t
        b = state.batch_size
        n = t.node_mask.shape[1]
        cand_ids, cand_mask = pano["cand_ids"], pano["cand_mask"]

        # all node lookups as one-hot contractions (take_along_axis and
        # point gathers scalarize, docs/PERF.md round 3); positions ride the
        # hoisted per-episode table when run() provides it.
        # precision=HIGHEST keeps the selected VALUES exactly f32 — the
        # default TPU matmul precision rounds operands through bf16, which
        # would perturb geometry that the original gathers fetched exactly
        hi = jax.lax.Precision.HIGHEST
        pos_b = ep["pos"] if ep is not None else t.positions[state.scan]
        oh_cur = jax.nn.one_hot(state.cur, n, dtype=jnp.float32)
        oh_start = jax.nn.one_hot(state.start, n, dtype=jnp.float32)
        row3 = lambda oh: jnp.einsum("bn,bnd->bd", oh, pos_b,
                                     preferred_element_type=jnp.float32,
                                     precision=hi)
        cur_pos = row3(oh_cur)
        start_pos = row3(oh_start)
        if self.env.observed_graph_parity:
            dist_row = jnp.einsum("bn,bnm->bm", oh_cur, state.obs_dist,
                                  preferred_element_type=jnp.float32)
            steps_row = jnp.einsum("bn,bnm->bm", oh_cur, state.obs_steps,
                                   preferred_element_type=jnp.float32)
        else:
            dist_row = t.dist[state.scan, state.cur]
            steps_row = t.steps[state.scan, state.cur].astype(jnp.float32)
        pick = lambda row, oh: jnp.einsum("bn,bn->b", oh, row,
                                          preferred_element_type=jnp.float32,
                                          precision=hi)
        start7 = gj.pos_features_7(
            cur_pos[:, None, :], start_pos[:, None, :],
            pick(dist_row, oh_start)[:, None],
            pick(steps_row, oh_start)[:, None],
            state.heading, state.elevation, self.cfg.angle_feat_size)[:, 0]

        cand_safe = jnp.maximum(cand_ids, 0)
        oh_cand = jax.nn.one_hot(cand_safe, n, dtype=jnp.float32)  # [B, C, N]
        crow = lambda row: jnp.einsum("bcn,bn->bc", oh_cand, row,
                                      preferred_element_type=jnp.float32,
                                      precision=hi)
        cand_pos = jnp.einsum("bcn,bnd->bcd", oh_cand, pos_b,
                              preferred_element_type=jnp.float32,
                              precision=hi)
        cdist = crow(dist_row)
        csteps = crow(steps_row)
        cand7 = gj.pos_features_7(cur_pos[:, None, :], cand_pos, cdist, csteps,
                                  state.heading, state.elevation,
                                  self.cfg.angle_feat_size)

        p2 = pano["pano_masks"].shape[1] + 2
        vp_pos_fts = jnp.zeros((b, p2, 14), jnp.float32)
        vp_pos_fts = vp_pos_fts.at[:, :, :7].set(start7[:, None, :])
        vp_pos_fts = vp_pos_fts.at[:, 2:2 + cand7.shape[1], 7:].set(
            cand7 * cand_mask[..., None])

        vp_masks = jnp.concatenate(
            [jnp.ones((b, 2), bool), pano["pano_masks"]], axis=1)
        vp_nav_masks = jnp.concatenate(
            [jnp.ones((b, 1), bool), jnp.zeros((b, 1), bool),
             pano["nav_types"] == 1], axis=1)

        # gmap token -> vp candidate slot (for dynamic fusion)
        token_node = gmap["token_node"]
        eq = (token_node[:, :, None] == cand_ids[:, None, :]) & \
             cand_mask[:, None, :] & gmap["token_valid"][:, :, None]
        slot = jnp.where(eq.any(-1), 2 + eq.argmax(-1).astype(jnp.int32), -1)
        gmap_local_slot = jnp.concatenate(
            [jnp.full((b, 2), -1, jnp.int32), slot], axis=1)

        cand_visited = (crow(state.visited[:, :n].astype(jnp.float32)) > 0.5) \
            & cand_mask
        vp_cand_visited = jnp.concatenate(
            [jnp.zeros((b, 2)), cand_visited.astype(jnp.float32),
             jnp.zeros((b, 36))], axis=1)

        return {
            "vp_pos_fts": vp_pos_fts,
            "vp_masks": vp_masks, "vp_nav_masks": vp_nav_masks,
            "gmap_local_slot": gmap_local_slot,
            "vp_cand_visited": vp_cand_visited,
        }

    # ------------------------------------------------------------------
    # supervision (the reference's _teacher_action, agent.py:330-373)
    # ------------------------------------------------------------------

    def teacher_action_local(self, state: EpisodeBatch, pano, t_step: int,
                             imitation, ep=None):
        """Supervision in the LOCAL (viewpoint-branch) action space for
        ``fusion='local'``: slots are [stop],[mem],candidates... — the gt
        next hop / spl-expert candidate index instead of a gmap token
        (reference fusion==local call sites, agent.py:1003,1044).
        ``imitation``: python bool or [B] bool array (fused dual rollout)."""
        env = self.env
        b = state.batch_size
        cand_ids, cand_mask = pano["cand_ids"], pano["cand_mask"]

        def imit():
            tt = jnp.minimum(jnp.full((b,), t_step + 1), state.gt_len - 1)
            goal_vp = jnp.take_along_axis(state.gt_path, tt[:, None], 1)[:, 0]
            stop = t_step >= (state.gt_len - 1)
            eq = (cand_ids == goal_vp[:, None]) & cand_mask
            idx = 2 + eq.argmax(axis=1).astype(jnp.int32)
            return jnp.where(stop, 0,
                             jnp.where(eq.any(axis=1), idx, env.ignore_id))

        def expert():
            dists = ep["dist_f"] if ep is not None else self.t.dist[state.scan]
            safe = jnp.maximum(cand_ids, 0)
            d_cur = jnp.take_along_axis(dists[jnp.arange(b), state.cur],
                                        safe, 1)
            d_goal = dists[jnp.arange(b)[:, None], safe, state.goal[:, None]]
            cost = jnp.where(cand_mask, d_cur + d_goal, jnp.inf)
            best = 2 + jnp.argmin(cost, axis=1).astype(jnp.int32)
            return jnp.where(state.cur == state.goal, 0, best)

        if isinstance(imitation, bool):
            a = imit() if imitation else expert()
        else:
            a = jnp.where(imitation, imit(), expert())
        return jnp.where(state.ended, env.ignore_id, a)

    def _teacher_action_imitation(self, state: EpisodeBatch, gmap,
                                  t_step: int):
        """Ground-truth next hop at step t (teacher forcing keeps the agent
        on gt_path, agent.py:339-347)."""
        b = state.batch_size
        token_node = gmap["token_node"]
        tt = jnp.minimum(jnp.full((b,), t_step + 1), state.gt_len - 1)
        goal_vp = jnp.take_along_axis(state.gt_path, tt[:, None], axis=1)[:, 0]
        stop = t_step >= (state.gt_len - 1)
        eq = (token_node == goal_vp[:, None]) & gmap["token_valid"]
        idx = 2 + eq.argmax(axis=1).astype(jnp.int32)
        # gt next hop absent from the token set (gmap budget overflow
        # truncated it away) -> ignore_id, NOT stop: emitting 0 would both
        # corrupt the IL target and end the teacher-forced episode.  The
        # reference never truncates (it pads to the batch max); overflow
        # is surfaced via aux["gmap_overflow"] in run().
        return jnp.where(stop, 0,
                         jnp.where(eq.any(axis=1), idx, self.env.ignore_id))

    def _teacher_action_expert(self, state: EpisodeBatch, gmap, ep=None):
        """DAgger expert action in the gmap action space (agent.py:350-366)."""
        env = self.env
        b = state.batch_size
        token_node = gmap["token_node"]
        visited_tok = jnp.take_along_axis(
            state.visited[:, : self.t.node_mask.shape[1]], token_node, 1)
        eligible = gmap["token_valid"] & ~visited_tok
        if env.expert_policy == "ndtw":
            # expert: max nDTW of (trajectory-so-far + shortest path to
            # the candidate) against the gt path (agent.py:357-363)
            ndtw = self._ndtw_scores(state, gmap, ep=ep)
            cost = jnp.where(eligible, -ndtw, jnp.inf)
        else:
            # spl expert: min dist(cur -> node) + dist(node -> goal)
            # (agent.py:364-366)
            dists = ep["dist_f"] if ep is not None else self.t.dist[state.scan]
            d_cur = jnp.take_along_axis(dists[jnp.arange(b), state.cur],
                                        token_node, 1)
            d_goal = dists[jnp.arange(b)[:, None], token_node,
                           state.goal[:, None]]
            cost = jnp.where(eligible, d_cur + d_goal, jnp.inf)
        best = 2 + jnp.argmin(cost, axis=1).astype(jnp.int32)
        stop = state.cur == state.goal
        return jnp.where(stop, 0, best)

    def teacher_action(self, state: EpisodeBatch, gmap, t_step: int,
                       imitation, ep=None):
        """``imitation``: python bool (whole batch) or a [B] bool array —
        the fused dual-rollout step supervises the teacher-forced half with
        gt next hops and the DAgger half with the expert in ONE call."""
        env = self.env
        if isinstance(imitation, bool):
            a = (self._teacher_action_imitation(state, gmap, t_step)
                 if imitation else self._teacher_action_expert(state, gmap, ep))
        else:
            a = jnp.where(imitation,
                          self._teacher_action_imitation(state, gmap, t_step),
                          self._teacher_action_expert(state, gmap, ep))
        return jnp.where(state.ended, env.ignore_id, a)

    def _ndtw_scores(self, state: EpisodeBatch, gmap, k_ext: int = 16,
                     lp: int = 48, ep=None):
        """Vectorized on-device nDTW of each candidate's hypothetical
        trajectory (executed trajectory + shortest-path extension to the
        candidate) against the gt path — the reference computes this per
        sample per candidate on the host with numpy (eval_utils.py:6-26 via
        agent.py:357-363)."""
        t = self.t
        b = state.batch_size
        bi = jnp.arange(b)
        token_node = gmap["token_node"]
        g = token_node.shape[1]
        nh = t.next_hop[state.scan]

        # shortest-path extension cur -> candidate (bounded walk)
        p = jnp.broadcast_to(state.cur[:, None], (b, g))
        ext, ext_valid = [], []
        for _ in range(k_ext):
            nxt = nh[bi[:, None], p, token_node]
            step_valid = (p != token_node) & (nxt >= 0)
            ext.append(jnp.where(step_valid, nxt, 0))
            ext_valid.append(step_valid)
            p = jnp.where(step_valid, nxt, p)
        ext = jnp.stack(ext, 2)
        ext_valid = jnp.stack(ext_valid, 2)

        traj = jnp.maximum(state.traj_nodes[:, :lp], 0)
        traj_valid = (jnp.arange(lp)[None, :]
                      < jnp.minimum(state.traj_len, lp)[:, None]) \
            & (state.traj_nodes[:, :lp] >= 0)
        pred = jnp.concatenate(
            [jnp.broadcast_to(traj[:, None, :], (b, g, lp)), ext], axis=2)
        pred_valid = jnp.concatenate(
            [jnp.broadcast_to(traj_valid[:, None, :], (b, g, lp)), ext_valid],
            axis=2)

        gt = jnp.maximum(state.gt_path, 0)
        tg = gt.shape[1]
        dist = ep["dist_f"] if ep is not None else t.dist[state.scan]
        cost = dist[bi[:, None, None, None], pred[..., None],
                    gt[:, None, None, :]]                  # [B, G, L, TG]

        big = jnp.float32(1e9)
        row = jnp.full((b, g, tg + 1), big).at[..., 0].set(0.0)

        def outer(row, i):
            ci = cost[:, :, i, :]
            vi = pred_valid[:, :, i]

            def inner(nr_prev, j):
                val = ci[:, :, j - 1] + jnp.minimum(
                    jnp.minimum(row[..., j], nr_prev), row[..., j - 1])
                return val, val

            _, vals = jax.lax.scan(inner, jnp.full((b, g), big),
                                   jnp.arange(1, tg + 1))
            new_row = jnp.concatenate(
                [jnp.full((b, g, 1), big),
                 jnp.moveaxis(vals, 0, -1)], axis=-1)
            # invalid prediction positions carry the previous row forward
            return jnp.where(vi[..., None], new_row, row), None

        row, _ = jax.lax.scan(outer, row, jnp.arange(pred.shape[2]))
        dtw = jnp.take_along_axis(
            row, state.gt_len[:, None, None] * jnp.ones((1, g, 1), jnp.int32),
            axis=-1)[..., 0]
        return jnp.exp(-dtw / (3.0 * state.gt_len[:, None]))

    # ------------------------------------------------------------------
    # transition (make_equiv_action, agent.py:375-404)
    # ------------------------------------------------------------------

    def transition(self, state: EpisodeBatch, gmap, action, stop_prob,
                   t_step: int, feedback: str, pano=None,
                   local_actions: bool = False, is_tf=None, ep=None,
                   defer_observe: bool = False):
        """``defer_observe``: skip the trailing relax/observe of the arrival
        node — the online serving session (agent/serving.py) runs them at the
        START of the next step instead, once the client has reported the
        arrival node's candidates (offline, the world tables are complete up
        front so the order is immaterial — nothing reads the registration
        between the end of step t and the top of step t+1)."""
        t = self.t
        env = self.env
        b = state.batch_size
        bi = jnp.arange(b)
        n = t.node_mask.shape[1]
        trash = n
        live = ~state.ended

        # record this step's stop probability on the current node
        # (node_stop_scores, agent.py:986-996)
        cur_t = jnp.where(live, state.cur, trash)
        stop_scores = state.stop_scores.at[bi, cur_t].set(
            jnp.where(live, stop_prob, state.stop_scores[bi, cur_t]))

        # stop determination (agent.py:1056-1076)
        if "+" in feedback:
            # fused dual rollout: teacher-forced rows stop at the goal, the
            # DAgger rows follow their own mode's rule
            dagger = feedback.split("+", 1)[1]
            goal_stop = is_tf | (dagger == "sample")
            wants_stop = jnp.where(goal_stop, state.cur == state.goal,
                                   action == 0)
        elif feedback in ("teacher", "sample"):
            wants_stop = state.cur == state.goal
        else:
            wants_stop = action == 0
        wants_stop = wants_stop | (action == 0)
        just_ended = live & (wants_stop | gmap["no_vp_left"]
                             | (t_step == env.max_action_len - 1))
        moving = live & ~just_ended

        if local_actions:
            # local (viewpoint-branch) actions: slot -> the current node's
            # candidate (fusion='local'; actions can revisit neighbors)
            slot = jnp.maximum(action - 2, 0)[:, None]
            target = jnp.take_along_axis(pano["cand_ids"], slot, 1)[:, 0]
            valid = (action >= 2) & \
                jnp.take_along_axis(pano["cand_mask"], slot, 1)[:, 0]
            moving = moving & valid
            target = jnp.where(moving, target, state.cur)
        else:
            target = jnp.take_along_axis(
                gmap["token_node"], jnp.maximum(action - 2, 0)[:, None], 1)[:, 0]
            target = jnp.where(moving, target, state.cur)

        # one bounded next-hop walk serves both needs: the last-but-one node
        # (to face the final edge — the reference reads the candidate view
        # from the previous node, agent.py:387-393) and, when the nDTW expert
        # needs it, the expanded trajectory record.  The walk is the only
        # sequential-gather chain left in the step, so it is merged and
        # trajectory writes are gated statically.
        parity = self.env.observed_graph_parity
        record_traj = parity or self.env.expert_policy == "ndtw"
        # extract the next-hop column toward each episode's target once
        # (one-hot contraction, MXU); the walk then reads a [B, N] table with
        # a VPU reduce instead of chained point gathers.
        # (A closed-form penultimate node — argmin over target's neighbors of
        # dist(cur, n) + w(n, target) — was measured and LOST: the [B, C, N]
        # one-hot lookups cost more than this bounded walk both in eval,
        # 21.9k vs 22.2k steps/s, and in training, 1381 vs 1261 ms/step.)
        onehot_tgt = jax.nn.one_hot(target, n, dtype=jnp.float32)
        if parity:
            # greedy next over OBSERVED edges: argmin_c w(p, c) + d_obs(c, t)
            # — walks an exact observed-subgraph shortest path (the
            # reference's GraphMap.path)
            # obs_dist is symmetric (undirected edges; the outer-sum relax
            # preserves symmetry), so contract the SAME axis as every other
            # consumer: contracting the minor axis here made XLA keep a
            # second, transposed layout of both [B,N,N] carries and insert
            # 105 MB layout-change copies every step
            dcol = jnp.einsum("bn,bnm->bm", onehot_tgt, state.obs_dist,
                              preferred_element_type=jnp.float32)
            wt = self._observed_walk_tables(state)
        else:
            nh_b = (ep["nh_f"] if ep is not None and "nh_f" in ep
                    else t.next_hop[state.scan].astype(jnp.float32))  # [B,N,N]
            col = jnp.einsum("bnm,bm->bn", nh_b, onehot_tgt,
                             preferred_element_type=jnp.float32)

        def walk(_, carry):
            p, prev, nodes, ln = carry
            if parity:
                nxt, ok = self._observed_next(state, wt, p, dcol, target)
                nxt = jnp.where(ok, nxt, -1)
            else:
                nxt = jnp.einsum(
                    "bn,bn->b", col, jax.nn.one_hot(p, n, dtype=jnp.float32),
                    preferred_element_type=jnp.float32).astype(jnp.int32)
            stepping = moving & (p != target) & (nxt >= 0)
            prev = jnp.where(stepping & (nxt == target), p, prev)
            if record_traj:
                wi = jnp.where(stepping, jnp.minimum(ln, MAX_TRAJ),
                               jnp.full_like(ln, MAX_TRAJ))
                nodes = nodes.at[bi, wi].set(
                    jnp.where(stepping, nxt, nodes[bi, wi]))
                ln = ln + stepping.astype(jnp.int32)
            p = jnp.where(stepping, nxt, p)
            return p, prev, nodes, ln

        # tight hop bound: every jump target is an OBSERVED node, and any
        # observed node is reachable in <= max_action_len + 1 hops (walk the
        # executed trajectory back to where it was observed, plus one
        # frontier edge) — the shortest path the walk follows can only be
        # shorter.  Halves the sequential chain vs the static WALK_HOPS
        # bound at R2R's T=15.
        hops = max(2, min(WALK_HOPS, self.env.max_action_len + 1))
        _, prev, traj_nodes, traj_len = jax.lax.fori_loop(
            0, hops, walk,
            (state.cur, state.cur, state.traj_nodes, state.traj_len))

        cand_ids_prev = t.cand_ids[state.scan, prev]
        eq = cand_ids_prev == target[:, None]
        # first matching candidate's view without an argmax+gather (per-lane
        # indices scalarize): first-True mask + masked sum, identical
        # tie-breaking (argmax returns the first maximal element)
        first = eq & (jnp.cumsum(eq.astype(jnp.int32), axis=1) == 1)
        view_row = t.cand_view[state.scan, prev]
        view = jnp.sum(jnp.where(first, view_row, 0), axis=1)
        has_edge = eq.any(axis=1)
        # no match: argmax picked slot 0 — reproduce that value exactly
        # (it is unused downstream: has_edge gates the heading update)
        view = jnp.where(has_edge, view, view_row[:, 0])
        new_heading = jnp.where(
            moving & has_edge, (view % 12) * (jnp.pi / 6), state.heading)
        new_elevation = jnp.where(
            moving & has_edge, (view // 12 - 1) * (jnp.pi / 6), state.elevation)

        new_cur = jnp.where(moving, target, state.cur)
        visited = state.visited.at[bi, jnp.where(moving, new_cur, trash)].set(True)

        state = state.replace(
            cur=new_cur, heading=new_heading, elevation=new_elevation,
            visited=visited, stop_scores=stop_scores,
            traj_nodes=traj_nodes, traj_len=traj_len,
            ended=state.ended | just_ended)
        if not defer_observe:
            if parity:
                state = relax_observed(state, self.t, new_cur, moving)
            state = _observe(state, self.t)
        chosen = jnp.where(moving, target, -1)
        return state, chosen, just_ended

    # ------------------------------------------------------------------
    # the scan driver (rollout, agent.py:722-1158)
    # ------------------------------------------------------------------

    @staticmethod
    def _apply_mc(model, params, rng, deterministic, ensemble_n, method,
                  *args, **kwargs):
        """Apply a model mode; with ensemble_n > 1 run it under MC dropout
        and average the outputs (the missing ``ensemble_rollout``
        reconstruction, agent_base.py:197-207, --ensemble_n parser.py:161)."""
        if ensemble_n <= 1:
            rngs = None if deterministic else {"dropout": rng}
            return model.apply(params, *args, deterministic=deterministic,
                               rngs=rngs, method=method, **kwargs)
        keys = jax.random.split(rng, ensemble_n)
        outs = jax.vmap(lambda k: model.apply(
            params, *args, deterministic=False, rngs={"dropout": k},
            method=method, **kwargs))(keys)
        return jax.tree_util.tree_map(lambda x: x.mean(0), outs)

    def _model_step(self, model, params, role, state, txt_embeds, txt_masks,
                    rng, deterministic, zd=None, ensemble_n=1, shared=None,
                    txt_kv=None):
        """One model's per-step pipeline: pano forward -> gmap update ->
        input assembly -> navigation forward.  ``zd``: this role's
        intervention dictionaries (img backdoor + frontdoor features).
        ``shared``: (pano_inputs, gmap_base, vp_base) computed once per step
        — the token structure is model-independent, so the dual-model
        (teacher+student) step assembles it a single time."""
        zd = zd or {}
        pano = shared[0] if shared else self.assemble_pano(state)
        rngs = None if deterministic else {"dropout": rng}
        pano_embeds, pano_fused, img_attns = self._apply_mc(
            model, params, rng, deterministic, ensemble_n,
            type(model).panorama,
            pano["view_img_fts"], pano["loc_fts"], pano["nav_types"],
            pano["pano_masks"], z_img_feats=zd.get("z_img_feats"),
            z_img_pzs=zd.get("z_img_pzs"))
        # episode state stays f32 regardless of the model compute dtype
        state = self.update_node_embeds(
            state, role, pano_embeds.astype(jnp.float32),
            pano_fused.astype(jnp.float32), pano["cand_ids"],
            pano["cand_mask"])
        gmap = self.assemble_gmap(state, role,
                                  shared[1] if shared else None)
        vp = self.assemble_vp(state, role, pano, pano_embeds, gmap,
                              shared[2] if shared else None)
        outs = self._apply_mc(
            model, params, rng, deterministic, ensemble_n,
            type(model).navigation, txt_embeds, txt_masks,
            gmap["gmap_img_embeds"], gmap["gmap_step_ids"], gmap["gmap_pos_fts"],
            gmap["gmap_masks"], gmap["gmap_visited_masks"],
            gmap["gmap_pair_dists"], vp["vp_img_embeds"], vp["vp_pos_fts"],
            vp["vp_masks"], vp["vp_nav_masks"], vp["gmap_local_slot"],
            vp["vp_cand_visited"], front_vp_feats=zd.get("front_vp_feats"),
            front_gmap_feats=zd.get("front_gmap_feats"),
            txt_cross_kvs=txt_kv)
        outs.update({"pano_embeds": pano_embeds, "pano_fused_embeds": pano_fused,
                     "img_attns": img_attns})
        state = state.replace(mem={
            **state.mem, role: outs["cls_embeds"].astype(jnp.float32)})
        return state, gmap, outs

    def select_action(self, logits, feedback, rng, nav_targets, gmap, state,
                      explore_mask=None, is_tf=None):
        """Action choice per feedback mode (agent.py:1028-1054).
        ``explore_mask`` overrides the expl_sample random-action support
        (fusion='local' explores over the viewpoint branch, agent.py:1044).
        ``feedback='teacher+<mode>'`` with ``is_tf`` [B] bool: the fused
        dual-rollout step — teacher-forced rows take the gt target, the
        rest follow ``<mode>``."""
        if "+" in feedback:
            dagger = feedback.split("+", 1)[1]
            a_tf = jnp.maximum(nav_targets, 0)
            a_dg = self.select_action(logits, dagger, rng, nav_targets, gmap,
                                      state, explore_mask)
            return jnp.where(is_tf, a_tf, a_dg)
        if feedback == "teacher":
            a = jnp.maximum(nav_targets, 0)   # ignore_id rows are ended anyway
        elif feedback == "argmax":
            a = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        elif feedback == "sample":
            a = jax.random.categorical(rng, logits).astype(jnp.int32)
        elif feedback == "expl_sample":
            a = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            k1, k2 = jax.random.split(rng)
            explore = jax.random.uniform(k1, a.shape) > self.env.expl_max_ratio
            mask = explore_mask if explore_mask is not None else \
                gmap["gmap_masks"] & ~gmap["gmap_visited_masks"]
            r = jax.random.uniform(k2, mask.shape)
            rand_a = jnp.argmax(jnp.where(mask, r, -1.0), axis=-1).astype(jnp.int32)
            a = jnp.where(explore, rand_a, a)
        else:
            raise ValueError(f"invalid feedback {feedback}")
        return a

    def run(self, params, state: EpisodeBatch, txt_ids, txt_masks,
            feedback: str, rng=None, train_ml: float | None = None,
            deterministic: bool = True, teacher_params=None,
            distill=None, ability_grads=None, use_teacher_policy=False,
            zdicts=None, ensemble_n: int = 1, train_rl: bool = False,
            critic=None, critic_params=None, gamma: float = 0.9,
            remat: bool = False, tables: "Tables | None" = None,
            fused_split: int | None = None):
        """Full episode rollout under ``lax.scan``.

        ``fused_split``: fused dual-rollout mode — ``feedback`` must be
        ``'teacher+<mode>'``; rows [0, fused_split) run teacher-forced and
        the rest run DAgger ``<mode>``, in ONE scan at double width.  The
        per-step pipeline is dispatch-latency bound (docs/PERF.md), so one
        wide scan beats the reference's two sequential rollouts
        (agent_base.py:236-259 runs them back to back).  Per-half losses are
        kept exactly separate (MKTD normalization, MKRW draws, and loss
        reductions all stay within their half) so the math equals the two
        independent rollouts; see aux keys ``ml_loss_vec``/``kd_losses_tf``/
        ``kd_losses_dg``.

        ``tables``: pass the world :class:`Tables` as a TRACED argument when
        calling from inside jit.  Closed-over tables become XLA compile-time
        constants — at Matterport scale (61 scans, 2.2 GB features) the
        compile never finishes (measured >40 min, killed); as arguments they
        are plain device buffers and compile time is scan-count independent.

        Single-model greedy/IL rollout, or — when ``teacher_params`` and the
        :class:`DistillConfig` ``distill`` are given — the fused dual-model
        MAKD rollout: teacher and student run in the same jitted step, KD
        losses accumulate across steps, and gradient flow is controlled purely
        by ``stop_gradient`` placement (the reference's
        detach/retain_graph choreography, agent.py:794-1026,
        agent_base.py:260-276, collapses into one combined loss).

        Returns (final_state, aux): per-step chosen target nodes ([T, B], -1
        when not moving), summed IL losses, accumulated KD loss dicts, and the
        backtrack stop node.
        """
        if tables is not None:
            prev_t = self.t
            self.t = tables
            try:
                return self.run(params, state, txt_ids, txt_masks, feedback,
                                rng, train_ml, deterministic, teacher_params,
                                distill, ability_grads, use_teacher_policy,
                                zdicts, ensemble_n, train_rl, critic,
                                critic_params, gamma, remat,
                                fused_split=fused_split)
            finally:
                self.t = prev_t

        from . import distill as D

        model = self.model
        kdl = distill is not None and self.teacher_model is not None
        icod = kdl and distill.train_teacher
        mktd = kdl and distill.teacher_sample_hard_mining
        # --fusion action-score selection (parser.py:16); 'local' switches
        # the action space to viewpoint-candidate slots
        policy_logit_key = {"dynamic": "fused_logits", "avg": "fused_logits",
                            "global": "global_logits",
                            "local": "local_logits"}[self.cfg.fusion]
        local_acts = self.cfg.fusion == "local"
        fused = fused_split is not None
        if fused and "+" not in feedback:
            raise ValueError("fused_split requires feedback='teacher+<mode>'")
        # numpy constant: embeds into the program without a device round-trip
        is_tf = (np.arange(state.batch_size) < fused_split) if fused else None
        if rng is None:
            rng = jax.random.PRNGKey(0)
        rngs = None if deterministic else {"dropout": rng}
        # per-role intervention dictionaries, broadcast over the batch
        # (get_front_variable / _language_variable z plumbing,
        # agent.py:43-90, 767-791)
        b = state.batch_size
        zdicts = zdicts or {}

        def zd_for(role):
            z = zdicts.get(role) or {}
            out = {}
            for k, v in z.items():
                if v is None:
                    continue
                if isinstance(v, dict):
                    out[k] = {k2: jnp.broadcast_to(
                        jnp.asarray(v2), (b,) + jnp.asarray(v2).shape)
                        for k2, v2 in v.items()}
                else:
                    v = jnp.asarray(v)
                    out[k] = jnp.broadcast_to(v, (b,) + v.shape)
            return out

        s_zd = zd_for("student")
        txt_embeds, txt_attns = model.apply(
            params, txt_ids, txt_masks,
            instr_zdict=s_zd.get("instr_zdict"),
            front_txt_feats=s_zd.get("front_txt_feats"),
            deterministic=deterministic, rngs=rngs,
            method=type(model).language)
        # loop-invariant instruction K/V hoisted out of the scan (layer-0
        # cross attention; all layers when lang2visn is off) — the same
        # Dense math, computed once per episode instead of once per step
        # (ModelConfig.hoist_text_kv; docs/PERF.md lever #1's txt slice)
        s_txt_kv = t_txt_kv = None
        if self.cfg.hoist_text_kv and not self.cfg.fuse_branches:
            s_txt_kv = model.apply(params, txt_embeds,
                                   method=type(model).text_cross_kv)
        if kdl:
            t_zd = zd_for("teacher")
            t_txt_embeds, t_txt_attns = self.teacher_model.apply(
                teacher_params, txt_ids, txt_masks,
                instr_zdict=t_zd.get("instr_zdict"),
                front_txt_feats=t_zd.get("front_txt_feats"),
                deterministic=deterministic, rngs=rngs,
                method=type(self.teacher_model).language)
            if self.t_cfg.hoist_text_kv and not self.t_cfg.fuse_branches:
                t_txt_kv = self.teacher_model.apply(
                    teacher_params, t_txt_embeds,
                    method=type(self.teacher_model).text_cross_kv)

            def s_project(name, x):
                return model.apply(params, name, x,
                                   method=type(model).kd_project)

            s_learned = t_learned = None
            ab_w_static = None
            if distill.adaptive_ability_weight:
                awt = distill.adaptive_ability_weight_type
                if awt == "learned_weight":
                    s_learned = model.apply(
                        params, method=type(model).kd_ability_weights)
                    if icod:
                        t_learned = self.teacher_model.apply(
                            teacher_params,
                            method=type(self.teacher_model).kd_ability_weights)
                elif awt == "grad" and ability_grads is not None:
                    from .losses import grad_softmax_weights
                    ab_w_static = grad_softmax_weights(
                        jnp.asarray(ability_grads), distill.rw_temp)

        # per-episode world-table slices hoisted out of the scan: gathers on
        # ``state.scan`` are episode constants, and leaving them in the step
        # re-gathers [B, N, N] tables every iteration (the next_hop gather
        # alone measured 46 ms / 16-iter eval run, x/profile round 3)
        ep = {"dist_f": self.t.dist[state.scan],
              "pos": self.t.positions[state.scan]}
        if not self.env.observed_graph_parity:
            ep["nh_f"] = self.t.next_hop[state.scan].astype(jnp.float32)

        def step_fn(carry, t_step):
            state, rng, ml_loss, t_ml_loss, kd_acc, t_kd_acc = carry
            rng, k_drop, k_act, k_rw = jax.random.split(rng, 4)
            # stamp the current node's step id at the TOP of step t, before
            # any forward (agent.py:873-875 sets node_step_ids[cur]=t+1 ahead
            # of the navigation forward; the pretrain builder counts the
            # current node the same way, pretrain/tasks.py)
            bi_ = jnp.arange(state.batch_size)
            live0 = ~state.ended
            trash0 = self.t.node_mask.shape[1]
            state = state.replace(step_ids=state.step_ids.at[
                bi_, jnp.where(live0, state.cur, trash0)].set(
                jnp.where(live0, t_step + 1,
                          state.step_ids[bi_, trash0])))
            pano_shared = self.assemble_pano(state)
            gmap_base = self.assemble_gmap_base(state, ep)
            vp_base = self.assemble_vp_base(state, pano_shared, gmap_base, ep)
            shared = (pano_shared, gmap_base, vp_base)
            state, gmap, outs = self._model_step(
                model, params, "student", state, txt_embeds, txt_masks,
                k_drop, deterministic, s_zd, ensemble_n, shared,
                txt_kv=s_txt_kv)
            outs["txt_embeds"], outs["txt_attns"] = txt_embeds, txt_attns
            # policy logits per --fusion (parser.py:16): dynamic/avg use the
            # fused scores, global/local a single branch; 'local' switches
            # the whole action space to viewpoint-candidate slots
            logits = outs[policy_logit_key]
            probs = jax.nn.softmax(logits, axis=-1)

            if kdl:
                state, t_gmap, t_outs = self._model_step(
                    self.teacher_model, teacher_params, "teacher", state,
                    t_txt_embeds, txt_masks, k_drop, deterministic, t_zd,
                    1, shared, txt_kv=t_txt_kv)
                t_outs["txt_embeds"] = t_txt_embeds
                t_outs["txt_attns"] = t_txt_attns
                t_logits = t_outs[policy_logit_key]

            nav_targets = None
            step_ce = jnp.zeros((state.batch_size,))
            if train_ml is not None or feedback == "teacher":
                imitation = (jnp.asarray(is_tf) if fused
                             else feedback == "teacher")
                if local_acts:
                    nav_targets = self.teacher_action_local(
                        state, pano_shared, t_step, imitation=imitation,
                        ep=ep)
                else:
                    nav_targets = self.teacher_action(
                        state, gmap, t_step, imitation=imitation, ep=ep)
                valid = nav_targets != self.env.ignore_id
                logp = jax.nn.log_softmax(logits, axis=-1)
                tgt = jnp.maximum(nav_targets, 0)
                step_ce = -jnp.take_along_axis(logp, tgt[:, None], 1)[:, 0] * valid
                if fused:
                    # per-half CE sums (the trainer weights them separately)
                    ml_loss = ml_loss + jnp.stack(
                        [step_ce[:fused_split].sum(),
                         step_ce[fused_split:].sum()])
                else:
                    ml_loss = ml_loss + step_ce.sum()

            if kdl and train_ml is not None:
                # teacher per-sample CE -> MKTD weights + ICoD teacher IL loss
                t_logp = jax.nn.log_softmax(t_logits, axis=-1)
                tgt = jnp.maximum(nav_targets, 0)
                valid = nav_targets != self.env.ignore_id
                t_ce = -jnp.take_along_axis(t_logp, tgt[:, None], 1)[:, 0] * valid
                from .losses import mkrw_weights, mktd_sample_weights

                def half_weights(ce_t, ce_s):
                    t_sw = s_sw = None
                    if mktd:
                        t_sw = jax.lax.stop_gradient(mktd_sample_weights(
                            ce_t, distill.sample_preprocess,
                            distill.sample_exp_decay))
                        s_sw = jax.lax.stop_gradient(mktd_sample_weights(
                            ce_s, distill.sample_preprocess,
                            distill.sample_exp_decay))
                    return t_sw, s_sw

                def ab_for(key):
                    if distill.adaptive_ability_weight and \
                            distill.adaptive_ability_weight_type == "RW":
                        return mkrw_weights(key, 5, distill.rw_temp)
                    return ab_w_static

                # the reference breaks its step loop once every episode has
                # ended (agent.py:1109-1110), so all-ended trailing steps
                # contribute NO KD (CE is already 0 via ignore_id); the scan
                # has no break — gate each step's KD by "any episode live",
                # per half in fused mode (each half is its own reference
                # rollout with its own break)
                gate_of = lambda live_slice: live_slice.any().astype(
                    jnp.float32)
                gated = lambda tree, gt: jax.tree_util.tree_map(
                    lambda x: x * gt, tree)
                if fused:
                    # strictly per-half losses: MKTD normalization, MKRW
                    # draws, and every reduction stay inside their half —
                    # the sums equal the two independent rollouts exactly
                    t_ml_loss = t_ml_loss + jnp.stack(
                        [t_ce[:fused_split].sum(), t_ce[fused_split:].sum()])
                    halves = (("tf", slice(0, fused_split)),
                              ("dg", slice(fused_split, None)))
                    keys_rw = jax.random.split(k_rw, 2)
                    take = lambda tree, sl: jax.tree_util.tree_map(
                        lambda x: x[sl], tree)
                    for (name, sl), k_rw_h in zip(halves, keys_rw):
                        t_sw, s_sw = half_weights(t_ce[sl], step_ce[sl])
                        ab_w = ab_for(k_rw_h)
                        o_h, t_o_h = take(outs, sl), take(t_outs, sl)
                        gt = gate_of(live0[sl])
                        kd_acc[name] = D.add_losses(
                            kd_acc[name], gated(D.makd_step_losses(
                                distill, t_step, o_h, t_o_h, s_project,
                                nav_targets[sl], ab_w, t_sw, s_learned,
                                role="t2s", ignore_id=self.env.ignore_id),
                                gt))
                        if icod:
                            t_kd_acc[name] = D.add_losses(
                                t_kd_acc[name], gated(D.makd_step_losses(
                                    distill, t_step, t_o_h, o_h, s_project,
                                    nav_targets[sl], ab_w, s_sw, t_learned,
                                    role="s2t", ignore_id=self.env.ignore_id),
                                    gt))
                else:
                    t_ml_loss = t_ml_loss + t_ce.sum()
                    t_sw, s_sw = half_weights(t_ce, step_ce)
                    ab_w = ab_for(k_rw)
                    gt = gate_of(live0)
                    kd_acc = D.add_losses(kd_acc, gated(D.makd_step_losses(
                        distill, t_step, outs, t_outs, s_project, nav_targets,
                        ab_w, t_sw, s_learned, role="t2s",
                        ignore_id=self.env.ignore_id), gt))
                    if icod:
                        t_kd_acc = D.add_losses(
                            t_kd_acc, gated(D.makd_step_losses(
                                distill, t_step, t_outs, outs, s_project,
                                nav_targets, ab_w, s_sw, t_learned,
                                role="s2t", ignore_id=self.env.ignore_id),
                                gt))

            policy_logits = t_logits if (kdl and use_teacher_policy) else logits
            a = self.select_action(
                policy_logits, feedback, k_act, nav_targets, gmap, state,
                explore_mask=(shared[2]["vp_nav_masks"] if local_acts
                              else None),
                is_tf=(jnp.asarray(is_tf) if fused else None))
            stop_prob = jax.nn.softmax(policy_logits, axis=-1)[:, 0]

            # episodes active at the top of this step: the honest per-step
            # work unit (post-ended scan iterations are masked compute)
            rec = {"chosen": None, "ce": step_ce,
                   "live_n": live0.sum().astype(jnp.int32)}
            if train_rl:
                # A2C records (the reference's RL branch is a stub — rollout
                # carries a Critic but computes no RL loss, SURVEY §2.5;
                # completed here): log-prob of the taken action, critic value
                # of the fused state, entropy, and distance-progress reward
                bi_ = jnp.arange(state.batch_size)
                logp_all = jax.nn.log_softmax(policy_logits, axis=-1)
                rec["logp"] = logp_all[bi_, a]
                rec["entropy"] = -(jnp.exp(logp_all) * jnp.where(
                    jnp.isfinite(logp_all), logp_all, 0.0)).sum(-1)
                rec["value"] = critic.apply(critic_params,
                                            outs["cls_embeds"])
                rec["live"] = (~state.ended).astype(jnp.float32)
                d_before = self.t.dist[state.scan, state.cur, state.goal]

            state, chosen, just_ended = self.transition(
                state, gmap, a, stop_prob, t_step, feedback,
                pano=pano_shared, local_actions=local_acts,
                is_tf=(jnp.asarray(is_tf) if fused else None), ep=ep)
            rec["chosen"] = chosen
            if train_rl:
                d_after = self.t.dist[state.scan, state.cur, state.goal]
                progress = (d_before - d_after) * rec["live"]
                bonus = jnp.where(just_ended,
                                  jnp.where(d_after < self.env.error_margin,
                                            2.0, -2.0), 0.0)
                rec["reward"] = progress + bonus
            return (state, rng, ml_loss, t_ml_loss, kd_acc, t_kd_acc), rec

        zeros = jnp.zeros((2,)) if fused else jnp.zeros(())
        kd0 = ({"tf": D.zero_kd_losses(), "dg": D.zero_kd_losses()}
               if fused else D.zero_kd_losses())
        if remat:
            # recompute the step in the backward pass instead of keeping
            # both models' per-step activations live across the whole scan
            # (prevent_cse=False is the scan-safe setting).  remat="dots"
            # keeps weight-stationary MXU outputs resident and recomputes
            # elementwise work; "dots_all" also keeps batch-dim dots
            # (attention scores/outputs) — least recompute, highest HBM
            # floor.  Pick per shape/batch (docs/PERF.md decisions table).
            policy = {
                "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                "dots_all": jax.checkpoint_policies.dots_saveable,
            }.get(remat)
            step_fn = jax.checkpoint(step_fn, prevent_cse=False,
                                     policy=policy)
        (state, _, ml_loss, t_ml_loss, kd_acc, t_kd_acc), recs = jax.lax.scan(
            step_fn, (state, rng, zeros, zeros, kd0,
                      jax.tree_util.tree_map(lambda x: x, kd0)),
            jnp.arange(self.env.max_action_len),
            unroll=self.env.scan_unroll)

        aux = {
            "actions": recs["chosen"],           # [T, B]
            "ml_loss": ml_loss.sum() if fused else ml_loss,
            "t_ml_loss": t_ml_loss.sum() if fused else t_ml_loss,
            "kd_losses": (D.add_losses(kd_acc["tf"], kd_acc["dg"])
                          if fused else kd_acc),
            "t_kd_losses": (D.add_losses(t_kd_acc["tf"], t_kd_acc["dg"])
                            if fused else t_kd_acc),
            "stop_node": self.final_stop_node(state),
            "final_cur": state.cur,
            # semantic (pre-ended) step count across the batch, for honest
            # steps/s accounting (bench.py)
            "semantic_steps": recs["live_n"].sum(),
            # episodes whose observed-node count exceeded the gmap token
            # budget at any point (tokens silently truncated; raise
            # env.max_gmap_len / --max_gmap_len if this is ever nonzero)
            "gmap_overflow": (state.obs_count
                              > self.env.max_gmap_len - 2).sum(),
        }
        if fused:
            # per-half views for the trainer's exact per-rollout weighting
            ov = state.obs_count > self.env.max_gmap_len - 2
            aux["gmap_overflow_tf"] = ov[:fused_split].sum()
            aux["gmap_overflow_dg"] = ov[fused_split:].sum()
            aux["ml_loss_vec"] = ml_loss          # [2] = (tf, dagger) sums
            aux["t_ml_loss_vec"] = t_ml_loss
            aux["kd_losses_tf"], aux["kd_losses_dg"] = \
                kd_acc["tf"], kd_acc["dg"]
            aux["t_kd_losses_tf"], aux["t_kd_losses_dg"] = \
                t_kd_acc["tf"], t_kd_acc["dg"]
        if self.env.observed_graph_parity:
            tn, tl = self._record_backtrack(state, aux["stop_node"])
            aux["traj_nodes"], aux["traj_len"] = tn, tl
        if train_rl:
            # discounted returns (reverse scan) -> advantage actor-critic
            def disc(g_next, xs):
                r, live = xs
                g = r + gamma * g_next * live
                return g, g

            _, returns = jax.lax.scan(
                disc, jnp.zeros((state.batch_size,)),
                (recs["reward"], recs["live"]), reverse=True)
            adv = jax.lax.stop_gradient(returns - recs["value"])
            live = recs["live"]
            policy_loss = -(recs["logp"] * adv * live).sum()
            value_loss = 0.5 * (((recs["value"] - returns) ** 2) * live).sum()
            entropy = (recs["entropy"] * live).sum()
            aux["rl_loss"] = policy_loss + value_loss
            aux["rl_entropy"] = entropy
        return state, aux


    def _observed_walk_tables(self, state: EpisodeBatch):
        """Hoisted per-transition tables for observed-graph walks: candidate
        ids / edge lengths / masks / visited flags as [B, N, C] floats so the
        per-iteration row select is a one-hot contraction (point gathers
        inside the walk loop serialize)."""
        t = self.t
        n = t.node_mask.shape[1]
        cand_all = t.cand_ids[state.scan].astype(jnp.float32)    # [B, N, C]
        w_all = t.cand_dist[state.scan]
        cmask_all = t.cand_mask[state.scan].astype(jnp.float32)
        # candidate VISITED flags are NOT precomputed here: _observed_next
        # derives them per iteration from the one-hot it already builds for
        # the candidate-distance contraction.  Round 2 materialized a
        # [B, N, C] table instead, either via a [S, N, C, N+1] per-scan
        # one-hot (≈290 MB at Matterport's ~61 train scans — guarded off)
        # or a scalarized take_along_axis gather measured at 46% of device
        # time; riding the per-row one-hot is batch-bounded, so parity mode
        # now scales to any scan count with zero extra memory.
        return {"cand": cand_all, "w": w_all, "cmask": cmask_all, "n": n}

    @staticmethod
    def _observed_next(state, wt, p, dcol, target):
        """Greedy next node on the observed shortest path toward ``target``
        (obs-distance column ``dcol``); returns (next_node, valid).

        Steps only onto VISITED nodes or the target itself: obs_dist is the
        FloydGraph visited-intermediate model (relax_observed docstring), so
        a frontier hop mid-path would follow a route that model never
        measured.  The walk starts at a visited node (cur), so every edge it
        reads comes from a fully-reported candidate row."""
        n = wt["n"]
        onehot_p = jax.nn.one_hot(p, n, dtype=jnp.float32)
        row = lambda x: jnp.einsum("bn,bnc->bc", onehot_p, x,
                                   preferred_element_type=jnp.float32)
        cand_row = row(wt["cand"]).astype(jnp.int32)
        w_row = row(wt["w"])
        # candidate distances AND visited flags via one one-hot contraction
        # — take_along_axis with per-lane-varying indices scalarizes (the
        # round-2 profile's 46%-of-device-time gather), and a precomputed
        # visited table is scan-count bounded; this is batch-bounded.
        dhot = jax.nn.one_hot(jnp.maximum(cand_row, 0), n,
                              dtype=jnp.float32)           # [B, C, N]
        visited_f = state.visited[:, :n].astype(jnp.float32)
        vis_cand = jnp.einsum("bcn,bn->bc", dhot, visited_f,
                              preferred_element_type=jnp.float32)
        stepable = (row(wt["cmask"]) > 0.5) & (
            (vis_cand > 0.5) | (cand_row == target[:, None]))
        d_cand = jnp.einsum("bcn,bn->bc", dhot, dcol,
                            preferred_element_type=jnp.float32)
        cost = jnp.where(stepable, w_row + d_cand, jnp.float32(INF_DIST))
        j = jnp.argmin(cost, axis=1)
        nxt = jnp.take_along_axis(cand_row, j[:, None], 1)[:, 0]
        ok = jnp.take_along_axis(cost, j[:, None], 1)[:, 0] < INF_DIST / 2
        return nxt, ok

    def _record_backtrack(self, state: EpisodeBatch, stop_node):
        """Append the stop-score backtrack path (cur -> stop node) to the
        trajectory buffer over the OBSERVED graph (agent.py:1080-1095's final
        traj append).  Parity mode only."""
        t = self.t
        b = state.batch_size
        bi = jnp.arange(b)
        n = t.node_mask.shape[1]
        moving = stop_node != state.cur
        # symmetric obs_dist: contract the same axis as all other consumers
        # (see the layout note in transition)
        dcol = jnp.einsum("bn,bnm->bm",
                          jax.nn.one_hot(stop_node, n, dtype=jnp.float32),
                          state.obs_dist,
                          preferred_element_type=jnp.float32)
        wt = self._observed_walk_tables(state)

        def walk(_, carry):
            p, nodes, ln = carry
            nxt, ok = self._observed_next(state, wt, p, dcol, stop_node)
            stepping = moving & (p != stop_node) & ok
            wi = jnp.where(stepping, jnp.minimum(ln, MAX_TRAJ),
                           jnp.full_like(ln, MAX_TRAJ))
            nodes = nodes.at[bi, wi].set(jnp.where(stepping, nxt,
                                                   nodes[bi, wi]))
            ln = ln + stepping.astype(jnp.int32)
            p = jnp.where(stepping, nxt, p)
            return p, nodes, ln

        _, tn, tl = jax.lax.fori_loop(
            0, WALK_HOPS, walk,
            (state.cur, state.traj_nodes, state.traj_len))
        return tn, tl

    def final_stop_node(self, state: EpisodeBatch):
        """Backtrack target: the visited node with the highest recorded stop
        probability (agent.py:1080-1095)."""
        n = self.t.node_mask.shape[1]
        best = jnp.argmax(state.stop_scores[:, :n], axis=1).astype(jnp.int32)
        has = jnp.take_along_axis(
            state.stop_scores[:, :n], best[:, None], 1)[:, 0] > NEG_INF / 2
        return jnp.where(has, best, state.cur)
