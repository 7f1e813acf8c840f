"""Online step-at-a-time navigation serving (robot deployment).

The reference claims "superior performance and real-time efficiency" for a
robot deployment (readme.md:4) but ships no serving path: its agent can only
batch-decode full episodes against a pre-built MatterSim world
(map_nav_src/r2r/agent_base.py:58-82 loops rollouts over a fixed env).  This
module is the TPU-native serving story:

    server = NavServer(cfg, params, max_nodes=64, max_cands=10)
    sess = server.new_session(instr_tokens)      # one per episode
    while True:
        plan = sess.step(Observation(node=..., position=..., heading=...,
                                     pano_feats=..., candidates=[...]))
        if plan.stop:
            break
        # drive the robot along plan.path; observe at plan.target
    final = sess.finish()   # stop-score backtrack (agent.py:1080-1095)

No world tables are required up front: each session builds its topological
map incrementally from the robot's own observations — the same information
state as the reference's GraphMap (observed-subgraph parity mode,
agent/rollout.py ``relax_observed``), so when the observations replay a
world the decision sequence is IDENTICAL to the offline parity rollout
(pinned by tests/test_serving.py).

Design notes (TPU-first):

- One compile, many episodes: the :class:`NavServer` owns the jitted device
  programs (instruction encode with hoisted cross-attention K/V, the fused
  first-step / next-step decision programs, final backtrack); sessions are
  cheap per-episode state.
- Static shapes throughout: ``max_nodes`` node slots, a fixed candidate
  budget, fixed instruction length.
- The per-decision device program is the same fused step the batch rollout
  scans over (assemble -> panorama -> navigation -> transition), with the
  incrementally-built tables entering as ARGUMENTS (device buffers), never
  closure constants.
- A decision is FOUR host<->device crossings, total ~140 KB: the packed
  host-mirrored topological tables (~30 KB, ONE buffer), the arrival node's
  36-view feature row (~110 KB at CLIP-768 — scattered INSIDE the step
  program, not by a separate dispatch), the single fused jit dispatch
  (row scatter + arrival registration + model step + transition), and ONE
  packed i32 result vector back.  Chatty per-field transfers and per-step
  eager dispatches were measured at 450 ms/decision through the axon
  tunnel; the packed protocol exists because round trips, not bytes,
  dominate a remote-attached TPU.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MagicConfig
from ..env import geometry as geo
from ..models import DualScaleVLNBert
from .rollout import (MAX_TRAJ, EpisodeBatch, Rollout, Tables, _observe,
                      init_episodes, relax_observed)


@dataclasses.dataclass
class Candidate:
    """A navigable neighbor visible from the current node.

    ``view``: discretized 30-degree view index (0..35) the neighbor is
    visible in; synthesized from the relative geometry when None (the same
    nearest-view rule the offline world builder uses, env/world.py:133).
    ``dist``: traversal distance of the edge (odometry / connectivity).
    """

    node: str
    position: tuple[float, float, float]
    dist: float
    heading: float | None = None      # absolute heading cur -> node
    elevation: float | None = None
    view: int | None = None


@dataclasses.dataclass
class Observation:
    """What the robot reports on arriving at a node.  ``heading`` is only
    read at episode start (afterwards the session tracks pose through its
    own transitions, exactly like the offline rollout)."""

    node: str
    position: tuple[float, float, float]
    heading: float
    pano_feats: np.ndarray            # [36, D] view features (CLIP)
    candidates: list[Candidate]


@dataclasses.dataclass
class NavDecision:
    stop: bool
    target: str | None                # chosen map node (None when stopping)
    path: list[str]                   # planned hops cur -> target (incl.)
    action_index: int                 # raw gmap-token action
    latency_ms: float                 # wall time of this decision


def observation_from_world(world, scan_idx: int, v: int,
                           heading: float) -> Observation:
    """Replay client: what a robot standing at node ``v`` of an offline
    :class:`~vln_magic_tpu.env.world.World` would report.  Used by the
    serving equivalence tests and ``bench.py --serve``; a real deployment
    builds :class:`Observation` from live sensors instead."""
    t = world.tables
    g = world.graphs[scan_idx]
    cands = []
    for j in range(t.cand_ids.shape[2]):
        if not t.cand_mask[scan_idx, v, j]:
            continue
        ci = int(t.cand_ids[scan_idx, v, j])
        cands.append(Candidate(
            node=g.node_ids[ci],
            position=tuple(t.positions[scan_idx, ci]),
            dist=float(t.cand_dist[scan_idx, v, j]),
            heading=float(t.cand_heading[scan_idx, v, j]),
            elevation=float(t.cand_elevation[scan_idx, v, j]),
            view=int(t.cand_view[scan_idx, v, j])))
    return Observation(
        node=g.node_ids[v], position=tuple(t.positions[scan_idx, v]),
        heading=heading,
        pano_feats=np.asarray(t.features[scan_idx, v], np.float32),
        candidates=cands)


class NavServer:
    """Compiled serving endpoint: owns the model, parameters, and the jitted
    device programs, shared across every episode session.

    ``cfg.env.observed_graph_parity`` is forced on: serving has exactly the
    observed-subgraph information state of the reference's GraphMap.

    ``max_nodes`` defaults from ``cfg.env.max_gmap_len`` (minus the
    [stop]/[mem] token slots) so a server follows the dataset's own node
    budget — R2R 128, RxR 208 — instead of a literal that a large site
    would exhaust mid-episode."""

    def __init__(self, cfg: MagicConfig, params, max_nodes: int | None = None,
                 max_cands: int = 10, zdicts: dict | None = None, model=None):
        from flax import serialization

        cfg = dataclasses.replace(
            cfg, env=dataclasses.replace(cfg.env, observed_graph_parity=True))
        self.cfg = cfg
        if max_nodes is None:
            max_nodes = max(cfg.env.max_gmap_len - 2, 2)
        # canonicalize to plain nested dicts (what msgpack_restore yields) so
        # an exported program's calling convention matches a bundle reload
        # even when the caller passed a FrozenDict
        self.params = serialization.to_state_dict(params)
        self.n, self.c = max_nodes, max_cands
        self.model = model or DualScaleVLNBert(
            cfg.model, dtype=jnp.dtype(cfg.train.compute_dtype))
        self._zdicts = zdicts or {}
        # template tables only fix SHAPES for the rollout helpers; real
        # tables enter the jitted programs as arguments per call
        d = cfg.model.image_feat_size
        n, c = max_nodes, max_cands
        self.rollout = Rollout(
            Tables(node_mask=jnp.ones((1, n), bool),
                   positions=jnp.zeros((1, n, 3), jnp.float32),
                   dist=jnp.zeros((1, n, n), jnp.float32),
                   steps=jnp.zeros((1, n, n), jnp.int32),
                   next_hop=jnp.zeros((1, n, n), jnp.int32),
                   cand_ids=jnp.full((1, n, c), -1, jnp.int32),
                   cand_dist=jnp.zeros((1, n, c), jnp.float32),
                   cand_view=jnp.zeros((1, n, c), jnp.int32),
                   cand_heading=jnp.zeros((1, n, c), jnp.float32),
                   cand_elevation=jnp.zeros((1, n, c), jnp.float32),
                   cand_mask=jnp.zeros((1, n, c), bool),
                   features=jnp.zeros((1, n, 36, d), jnp.float32)),
            cfg.env, self.model)
        self._first_jit = jax.jit(self._first)
        self._next_jit = jax.jit(self._next)
        self._finish_jit = jax.jit(self._finish_traj)
        self._lang_jit = jax.jit(self._lang)

    def new_session(self, instr_encoding) -> "NavSession":
        return NavSession(self, np.asarray(instr_encoding))

    def warmup(self):
        """Compile (or load from the persistent cache) every per-step device
        program before the first real episode — a robot must not pay a
        multi-second compile mid-run.  Without this, an episode that stops
        at step 0 leaves the next-step program uncompiled and a later
        episode stalls on it (measured as a multi-second latency outlier)."""
        sess = self.new_session(np.zeros((4,), np.int32))
        feats = np.zeros((36, self.cfg.model.image_feat_size), np.float32)
        sess.step(Observation("__warm0", (0.0, 0.0, 0.0), 0.0, feats,
                              [Candidate("__warm1", (1.0, 0.0, 0.0), 1.0)]))
        # drive the remaining programs directly (the episode may have ended)
        packed = jnp.asarray(sess._pack_mirrors())
        d = self.cfg.model.image_feat_size
        _, _, out = self._next_jit(
            self.params, packed, sess._features,
            np.asarray(self.n, np.int32), np.zeros((36, d), np.float32),
            sess.state, np.asarray([True]), np.asarray(1, np.int32),
            *sess._txt)
        fin = self._finish_jit(packed, sess._features, sess.state)
        jax.block_until_ready((out, fin))

    # ------------------------------------------------------------------
    # AOT deployment bundle (see module-tail docs)
    # ------------------------------------------------------------------

    def _program_specs(self):
        """ShapeDtypeStruct argument specs for the four device programs —
        exactly the shapes every session uses (static by design)."""
        n, c = self.n, self.c
        d = self.cfg.model.image_feat_size
        L = self.cfg.env.max_instr_len
        S = jax.ShapeDtypeStruct
        params = jax.tree.map(lambda x: S(jnp.shape(x), x.dtype), self.params)
        ids, mask = S((1, L), jnp.int32), S((1, L), jnp.bool_)
        packed = S((n * 3 + n * n + 5 * n * c,), jnp.float32)
        features = S((1, n, 36, d), jnp.float32)
        feat_v = S((), jnp.int32)
        feat_row = S((36, d), jnp.float32)
        v = S((1,), jnp.int32)
        heading = S((1,), jnp.float32)
        moved = S((1,), jnp.bool_)
        t_step = S((), jnp.int32)
        txt_embeds, txt_kv = jax.eval_shape(self._lang, params, ids, mask)
        _, state, _ = jax.eval_shape(self._first, params, packed, features,
                                     feat_v, feat_row, v, heading,
                                     txt_embeds, mask, txt_kv)
        return {
            "lang": (params, ids, mask),
            "first": (params, packed, features, feat_v, feat_row, v,
                      heading, txt_embeds, mask, txt_kv),
            "next": (params, packed, features, feat_v, feat_row, state,
                     moved, t_step, txt_embeds, mask, txt_kv),
            "finish": (packed, features, state),
        }

    def export_bundle(self, path: str, platforms=None,
                      quantize: bool = False):
        """Ahead-of-time lower every per-step device program to serialized
        StableHLO and write a self-contained deployment directory (programs
        + params + config).  ``platforms``: lowering targets (e.g.
        ``("cpu", "tpu")``); None = this process's default backend.
        ``quantize``: store the weights per-channel int8 (utils/quantize —
        the fairseq fork's scalar-quant counterpart) for a ~4x smaller
        artifact; :meth:`from_bundle` dequantizes at load, so runtime
        compute is unchanged and only the weights carry the ~0.3% rounding.
        Load with :meth:`from_bundle` — no flax tracing on the target."""
        import json as _json
        import os

        from flax import serialization
        from jax import export as jexp

        from ..config import config_to_dict

        _register_export_pytrees()
        os.makedirs(path, exist_ok=True)
        specs = self._program_specs()
        programs = {"lang": self._lang_jit, "first": self._first_jit,
                    "next": self._next_jit, "finish": self._finish_jit}
        for name, fn in programs.items():
            exp = jexp.export(fn, platforms=platforms)(*specs[name])
            with open(os.path.join(path, f"{name}.stablehlo"), "wb") as f:
                f.write(exp.serialize())
        host_params = jax.tree.map(np.asarray, self.params)
        if quantize:
            from ..utils.quantize import quantize_params
            host_params = quantize_params(host_params)
        with open(os.path.join(path, "params.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(host_params))
        import jaxlib

        with open(os.path.join(path, "meta.json"), "w") as f:
            _json.dump({
                # v2: the feature-row scatter rides inside first/next (no
                # separate "feat" program); v1 bundles are not loadable
                "format": "vln_magic_tpu.serving_bundle.v2",
                "config": config_to_dict(self.cfg),
                "max_nodes": self.n, "max_cands": self.c,
                # platforms=None pins the StableHLO to THIS process's
                # backend; record it so a mismatched target host gets a
                # diagnosable load error instead of a deserialize failure
                # (the exact field MULTICHIP_r01.json's libtpu AOT
                # version-mismatch lacked)
                "platforms": list(platforms) if platforms else None,
                "export_backend": jax.default_backend(),
                "quantized": bool(quantize),
                "zdicts_baked": bool(self._zdicts),
                "jax_version": jax.__version__,
                "jaxlib_version": jaxlib.__version__,
            }, f, indent=2)

    @classmethod
    def from_bundle(cls, path: str) -> "NavServer":
        """Build a serving endpoint from an :meth:`export_bundle` directory.
        The four device programs come from the serialized StableHLO — the
        flax model is never traced (its Python object is still constructed
        so shape metadata and session plumbing work, which is milliseconds).

        Any z-dicts in use at export time are baked into the StableHLO as
        closure constants (``meta.json`` records ``zdicts_baked``); a bundle
        server cannot take different ones, which is why this method accepts
        no ``zdicts`` argument.
        """
        import json as _json
        import os

        import jaxlib
        from flax import serialization
        from jax import export as jexp

        from ..config import config_from_dict

        _register_export_pytrees()
        with open(os.path.join(path, "meta.json")) as f:
            meta = _json.load(f)
        fmt = meta.get("format")
        if fmt != "vln_magic_tpu.serving_bundle.v2":
            if isinstance(fmt, str) and \
                    fmt.startswith("vln_magic_tpu.serving_bundle."):
                raise ValueError(
                    f"serving bundle {path} has format {fmt!r} but this "
                    f"build reads serving_bundle.v2 (the feature-row "
                    f"scatter moved inside the first/next programs) — "
                    f"re-export it with export_bundle / "
                    f"--export_serve_bundle")
            raise ValueError(f"not a serving bundle: {path}")
        # diagnosable environment checks BEFORE touching the StableHLO: a
        # platform/version mismatch otherwise surfaces as an opaque
        # deserialize/compile failure on the robot host
        backend = jax.default_backend()
        plats = meta.get("platforms")
        exported_for = [p.lower() for p in plats] if plats else \
            ([meta["export_backend"]] if meta.get("export_backend") else None)
        if exported_for is not None and backend not in exported_for:
            raise RuntimeError(
                f"serving bundle {path} was lowered for platform(s) "
                f"{exported_for} but this host's backend is {backend!r}; "
                f"re-export with export_bundle(platforms=(..., "
                f"{backend!r})) / --serve_bundle_platforms")
        versions = (meta.get("jax_version"), meta.get("jaxlib_version"))
        cfg = config_from_dict(meta["config"])
        with open(os.path.join(path, "params.msgpack"), "rb") as f:
            params = serialization.msgpack_restore(f.read())
        if meta.get("quantized"):
            from ..utils.quantize import dequantize_params
            params = jax.tree.map(np.asarray, dequantize_params(params))
        srv = cls(cfg, params, max_nodes=int(meta["max_nodes"]),
                  max_cands=int(meta["max_cands"]))

        def loaded(name, donate=None):
            with open(os.path.join(path, f"{name}.stablehlo"), "rb") as f:
                raw = bytearray(f.read())
            try:
                exp = jexp.deserialize(raw)
            except Exception as e:
                raise RuntimeError(
                    f"failed to deserialize program {name!r} of bundle "
                    f"{path} (exported with jax={versions[0]} "
                    f"jaxlib={versions[1]}; this host runs "
                    f"jax={jax.__version__} jaxlib={jaxlib.__version__}): "
                    f"{e}") from e
            return (jax.jit(exp.call, donate_argnums=donate)
                    if donate else jax.jit(exp.call))

        srv._lang_jit = loaded("lang")
        srv._first_jit = loaded("first")
        srv._next_jit = loaded("next")
        srv._finish_jit = loaded("finish")
        return srv

    # ------------------------------------------------------------------
    # jitted device programs (shared across sessions — one compile)
    # ------------------------------------------------------------------

    def _unpack_tables(self, packed, features) -> Tables:
        """Rebuild the Tables pytree from the session's single packed f32
        mirror buffer (ONE H2D per step; int fields are exact in f32 for
        node counts < 2^24).  steps/next_hop are unread in parity mode."""
        n, c = self.n, self.c
        sizes = [n * 3, n * n, n * c, n * c, n * c, n * c, n * c]
        off = np.cumsum([0] + sizes)
        part = lambda i, shape: packed[off[i]:off[i + 1]].reshape((1,) + shape)
        cand_ids = part(2, (n, c)).astype(jnp.int32)
        return Tables(
            node_mask=jnp.ones_like(cand_ids[..., 0], bool),
            positions=part(0, (n, 3)),
            dist=part(1, (n, n)),
            steps=jnp.zeros_like(cand_ids[..., 0], shape=(1, n, n)),
            next_hop=jnp.zeros_like(cand_ids[..., 0], shape=(1, n, n)),
            cand_ids=cand_ids,
            cand_dist=part(3, (n, c)),
            cand_view=part(4, (n, c)).astype(jnp.int32),
            cand_heading=part(5, (n, c)),
            cand_elevation=part(6, (n, c)),
            cand_mask=cand_ids >= 0,
            features=features,
        )

    def _zd_for(self, b: int = 1):
        z = self._zdicts.get("student") or {}
        bc = lambda x: jnp.broadcast_to(jnp.asarray(x),
                                        (b,) + jnp.asarray(x).shape)
        out = {}
        for k, v in z.items():
            if v is None:
                continue
            if isinstance(v, dict):
                out[k] = {k2: bc(v2) for k2, v2 in v.items()}
            else:
                out[k] = bc(v)
        return out

    def _lang(self, params, txt_ids, txt_masks):
        zd = self._zd_for()
        txt_embeds, _ = self.model.apply(
            params, txt_ids, txt_masks,
            instr_zdict=zd.get("instr_zdict"),
            front_txt_feats=zd.get("front_txt_feats"),
            deterministic=True, method=type(self.model).language)
        txt_kv = None
        if self.cfg.model.hoist_text_kv:
            txt_kv = self.model.apply(
                params, txt_embeds, method=type(self.model).text_cross_kv)
        return txt_embeds, txt_kv

    def _decide_core(self, params, tables, state, txt_embeds, txt_masks,
                     txt_kv, t_step):
        """The per-step device pipeline: step-id stamp -> assembly -> fused
        model step -> action -> transition (arrival registration deferred to
        the NEXT step's program — see Rollout.transition defer_observe)."""
        r = self.rollout
        prev = r.t
        r.t = tables
        try:
            b = state.batch_size
            bi = jnp.arange(b)
            live0 = ~state.ended
            trash = tables.node_mask.shape[1]
            # top-of-step step-id stamp (agent.py:873-875)
            state = state.replace(step_ids=state.step_ids.at[
                bi, jnp.where(live0, state.cur, trash)].set(
                jnp.where(live0, t_step + 1, state.step_ids[bi, trash])))
            pano = r.assemble_pano(state)
            gmap_base = r.assemble_gmap_base(state)
            vp_base = r.assemble_vp_base(state, pano, gmap_base)
            state, gmap, outs = r._model_step(
                self.model, params, "student", state, txt_embeds, txt_masks,
                jax.random.PRNGKey(0), True, self._zd_for(b), 1,
                (pano, gmap_base, vp_base), txt_kv=txt_kv)
            key = {"dynamic": "fused_logits", "avg": "fused_logits",
                   "global": "global_logits",
                   "local": "local_logits"}[r.cfg.fusion]
            logits = outs[key]
            action = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            stop_prob = jax.nn.softmax(logits, axis=-1)[:, 0]
            state, chosen, just_ended = r.transition(
                state, gmap, action, stop_prob, t_step, "argmax", pano=pano,
                local_actions=(r.cfg.fusion == "local"), defer_observe=True)
            # ONE packed i32 result per lane: [chosen, ended, action,
            # traj_len, traj_nodes...] — a single D2H fetch per decision
            out = jnp.concatenate([
                jnp.stack([chosen, just_ended.astype(jnp.int32),
                           action, state.traj_len], axis=1),
                state.traj_nodes], axis=1)
            return state, out
        finally:
            r.t = prev

    def _first(self, params, packed, features, feat_v, feat_row, v, heading,
               txt_embeds, txt_masks, txt_kv):
        """Episode start + first decision as ONE device program (the batch
        rollout's init_episodes + step 0).  The arrival node's 36-view
        feature row scatters INSIDE the program (``feat_v`` sentinel ``n``
        drops the update) — the session never pays a separate scatter
        dispatch per decision.  The gt path is unknown at serving time —
        goal=start is never read under feedback='argmax'."""
        features = features.at[0, feat_v].set(feat_row, mode="drop")
        tables = self._unpack_tables(packed, features)
        state = init_episodes(
            tables, jnp.zeros_like(v), v, heading, v[:, None],
            jnp.ones_like(v), self.rollout.model_dims, observed_parity=True)
        state, out = self._decide_core(params, tables, state, txt_embeds,
                                       txt_masks, txt_kv, jnp.int32(0))
        return features, state, out[0]

    def _next(self, params, packed, features, feat_v, feat_row, state, moved,
              t_step, txt_embeds, txt_masks, txt_kv):
        """Arrival registration + decision as ONE device program (arrival
        feature row scattered in-program, as in :meth:`_first`).  The
        relax/observe the batch rollout runs at the END of transition runs
        here instead, once the client has reported the arrival node's
        candidates (offline, the tables are complete up front so the order
        is immaterial — nothing reads the registration in between)."""
        features = features.at[0, feat_v].set(feat_row, mode="drop")
        tables = self._unpack_tables(packed, features)
        state = relax_observed(state, tables, state.cur, moved)
        state = _observe(state, tables)
        state, out = self._decide_core(params, tables, state, txt_embeds,
                                       txt_masks, txt_kv, t_step)
        return features, state, out[0]

    def _finish_traj(self, packed, features, state):
        tables = self._unpack_tables(packed, features)
        r = self.rollout
        prev = r.t
        r.t = tables
        try:
            stop_node = r.final_stop_node(state)
            tn, tl = r._record_backtrack(state, stop_node)
            return jnp.concatenate([jnp.stack([stop_node[0], tl[0]]), tn[0]])
        finally:
            r.t = prev


class NavSession:
    """One episode's online state: host-mirrored incremental world tables,
    the device episode state, and the trajectory record.  Create via
    :meth:`NavServer.new_session`."""

    def __init__(self, server: NavServer, instr_encoding: np.ndarray):
        self.server = server
        self.cfg = server.cfg
        self._instr = np.asarray(instr_encoding)
        n, c = server.n, server.c
        self.n, self.c = n, c
        # host mirrors of the incremental world (tiny); features stay on
        # device and only the arrival row crosses per step
        self.h_pos = np.zeros((n, 3), np.float32)
        self.h_cand_ids = np.full((n, c), -1, np.int32)
        self.h_cand_dist = np.zeros((n, c), np.float32)
        self.h_cand_view = np.zeros((n, c), np.int32)
        self.h_cand_heading = np.zeros((n, c), np.float32)
        self.h_cand_elev = np.zeros((n, c), np.float32)
        self.h_dist = np.zeros((n, n), np.float32)
        self._ids: dict[str, int] = {}
        self._names: list[str] = []
        d = self.cfg.model.image_feat_size
        self._features = jnp.zeros((1, n, 36, d), jnp.float32)
        self._pending_row: tuple[int, np.ndarray] | None = None

        L = self.cfg.env.max_instr_len
        ids = np.full((1, L), 1, np.int32)
        mask = np.zeros((1, L), bool)
        enc = np.asarray(instr_encoding)[:L]
        ids[0, : len(enc)] = enc
        mask[0, : len(enc)] = True
        txt_masks = jnp.asarray(mask)
        txt_embeds, txt_kv = server._lang_jit(server.params, jnp.asarray(ids),
                                              txt_masks)
        self._txt = (txt_embeds, txt_masks, txt_kv)

        self.state: EpisodeBatch | None = None
        self.t_step = 0
        self._last_moved = False
        self._cur = -1            # host-tracked current node index
        self._ended = False
        self._traj: list[str] = []

    # ------------------------------------------------------------------
    # world ingestion
    # ------------------------------------------------------------------

    def _intern(self, name: str) -> int:
        if name not in self._ids:
            if len(self._names) >= self.n:
                raise ValueError(
                    f"max_nodes={self.n} exhausted; raise NavServer "
                    f"max_nodes for larger deployment sites")
            self._ids[name] = len(self._names)
            self._names.append(name)
        return self._ids[name]

    def _pack_mirrors(self) -> np.ndarray:
        """All small tables as ONE f32 buffer (int fields are exact in f32
        for < 2^24 node ids) — a single H2D instead of seven."""
        return np.concatenate([
            self.h_pos.ravel(), self.h_dist.ravel(),
            self.h_cand_ids.astype(np.float32).ravel(),
            self.h_cand_dist.ravel(),
            self.h_cand_view.astype(np.float32).ravel(),
            self.h_cand_heading.ravel(), self.h_cand_elev.ravel()])

    def _ingest(self, obs: Observation) -> int:
        """Fold an observation into the host mirrors + device features."""
        v = self._intern(obs.node)
        self.h_pos[v] = np.asarray(obs.position, np.float32)
        if len(obs.candidates) > self.c:
            raise ValueError(
                f"{len(obs.candidates)} candidates > max_cands={self.c}")
        ids, dists, views, heads, elevs = [], [], [], [], []
        for cand in obs.candidates:
            ci = self._intern(cand.node)
            self.h_pos[ci] = np.asarray(cand.position, np.float32)
            h, e = cand.heading, cand.elevation
            if h is None or e is None:
                h, e, _ = geo.rel_pos_features(self.h_pos[v], self.h_pos[ci])
                h, e = float(h), float(e)
            view = cand.view if cand.view is not None else int(
                geo.nearest_view_index(h, e))
            ids.append(ci)
            dists.append(float(cand.dist))
            views.append(view)
            heads.append(h)
            elevs.append(e)
            # symmetric edge weight for the observed-subgraph relax
            # (rollout.relax_observed reads t.dist[scan, v, cand])
            self.h_dist[v, ci] = self.h_dist[ci, v] = float(cand.dist)
            self._reverse_fill(ci, v, float(cand.dist))
        m = len(ids)
        self.h_cand_ids[v] = -1
        self.h_cand_ids[v, :m] = ids
        self.h_cand_dist[v, :m] = dists
        self.h_cand_view[v, :m] = views
        self.h_cand_heading[v, :m] = heads
        self.h_cand_elev[v, :m] = elevs
        row = np.asarray(obs.pano_feats, np.float32)
        d = self.cfg.model.image_feat_size
        if row.shape != (36, d):
            raise ValueError(f"pano_feats must be [36, {d}], got {row.shape}")
        self._put_feature_row(v, row)
        return v

    def _put_feature_row(self, v: int, row: np.ndarray):
        # queue for the step program (the scatter rides inside first/next —
        # no separate per-decision dispatch); each step ingests exactly one
        # observation, so single-slot overwrite is exact
        self._pending_row = (v, row)

    def _reverse_fill(self, frm: int, to: int, dist: float):
        """Record the reverse edge ``frm -> to`` so the observed-graph walk
        can route through frontier nodes (offline, the complete world tables
        carry every node's candidate row; the walk only uses edges with a
        visited endpoint, and those are exactly the reverse edges of
        reported candidates when connectivity is symmetric)."""
        row = self.h_cand_ids[frm]
        if (row == to).any():
            return
        free = np.flatnonzero(row < 0)
        if len(free) == 0:
            return   # row full: the node was (or will be) directly observed
        j = free[0]
        h, e, _ = geo.rel_pos_features(self.h_pos[frm], self.h_pos[to])
        self.h_cand_ids[frm, j] = to
        self.h_cand_dist[frm, j] = dist
        self.h_cand_view[frm, j] = int(geo.nearest_view_index(h, e))
        self.h_cand_heading[frm, j] = float(h)
        self.h_cand_elev[frm, j] = float(e)

    # ------------------------------------------------------------------
    # control-loop API
    # ------------------------------------------------------------------

    def step(self, obs: Observation) -> NavDecision:
        """One decision: ingest the robot's observation at its current node,
        run the fused per-step device program, return the plan."""
        t0 = time.perf_counter()
        if self._ended:
            raise RuntimeError("episode already ended; call finish()")
        v = self._ingest(obs)
        if self.state is not None and v != self._cur:
            raise ValueError(
                f"observation at '{obs.node}' but the session's current "
                f"node is '{self._names[self._cur]}'")
        server = self.server
        packed = jnp.asarray(self._pack_mirrors())
        pre_len = max(len(self._traj), 1)
        # this decision's observed feature row rides inside the step
        # program (sentinel n = nothing queued, dropped by the scatter)
        if self._pending_row is not None:
            fv, frow = self._pending_row
            self._pending_row = None
        else:
            fv, frow = self.n, np.zeros(
                (36, self.cfg.model.image_feat_size), np.float32)
        fv = np.asarray(fv, np.int32)
        if self.state is None:
            self._features, self.state, out_vec = server._first_jit(
                server.params, packed, self._features, fv, frow,
                np.asarray([v], np.int32),
                np.asarray([obs.heading], np.float32), *self._txt)
            self._traj = [obs.node]
        else:
            self._features, self.state, out_vec = server._next_jit(
                server.params, packed, self._features, fv, frow, self.state,
                np.asarray([self._last_moved]),
                np.asarray(self.t_step, np.int32), *self._txt)
        self.t_step += 1
        out = np.asarray(out_vec)   # the ONE per-decision D2H fetch
        chosen, ended, action, traj_len = (int(x) for x in out[:4])
        traj_nodes = out[4:]
        self._last_moved = chosen >= 0
        self._ended = bool(ended) or chosen < 0
        path = []
        if chosen >= 0:
            self._cur = chosen
            path = [self._names[i] for i in traj_nodes[pre_len:traj_len]]
            self._traj.extend(path)
        elif self._cur < 0:
            self._cur = v
        latency = (time.perf_counter() - t0) * 1000.0
        return NavDecision(
            stop=self._ended,
            target=self._names[chosen] if chosen >= 0 else None,
            path=path, action_index=action, latency_ms=latency)

    # ------------------------------------------------------------------
    # crash recovery (the serving face of SURVEY §5.3: a robot process can
    # die mid-episode; the session is a few MB of state)
    # ------------------------------------------------------------------

    def save(self, path: str):
        """Persist the whole session (map mirrors, device episode state,
        trajectory record) so a crashed control process can resume the
        episode exactly where it stopped."""
        import jax.tree_util as jtu
        from flax import serialization

        ft = np.asarray(self._features)
        if self._pending_row is not None:   # queued but not yet stepped
            ft = ft.copy()
            pv, prow = self._pending_row
            ft[0, pv] = prow
        blob = {
            "instr": self._instr,
            "state": (None if self.state is None
                      else jtu.tree_map(np.asarray,
                                        serialization.to_state_dict(
                                            self.state))),
            "features": ft,
            "mirrors": {
                "pos": self.h_pos, "dist": self.h_dist,
                "cand_ids": self.h_cand_ids, "cand_dist": self.h_cand_dist,
                "cand_view": self.h_cand_view,
                "cand_heading": self.h_cand_heading,
                "cand_elev": self.h_cand_elev,
            },
            "names": list(self._names),
            "traj": list(self._traj),
            "t_step": self.t_step,
            "last_moved": self._last_moved,
            "cur": self._cur,
            "ended": self._ended,
        }
        with open(path, "wb") as f:
            f.write(serialization.msgpack_serialize(blob))

    @classmethod
    def restore(cls, server: NavServer, path: str) -> "NavSession":
        """Rebuild a session saved by :meth:`save` on a (re)started server.
        The instruction is re-encoded deterministically; everything else is
        restored verbatim."""
        import jax.tree_util as jtu
        from flax import serialization

        with open(path, "rb") as f:
            blob = serialization.msgpack_restore(f.read())
        sess = cls(server, np.asarray(blob["instr"]))
        m = blob["mirrors"]
        sess.h_pos[:] = m["pos"]
        sess.h_dist[:] = m["dist"]
        sess.h_cand_ids[:] = m["cand_ids"]
        sess.h_cand_dist[:] = m["cand_dist"]
        sess.h_cand_view[:] = m["cand_view"]
        sess.h_cand_heading[:] = m["cand_heading"]
        sess.h_cand_elev[:] = m["cand_elev"]
        sess._features = jnp.asarray(blob["features"])
        if blob["state"] is not None:
            sess.state = EpisodeBatch(
                **jtu.tree_map(jnp.asarray, blob["state"]))
        sess._names = [str(x) for x in blob["names"]]
        sess._ids = {n: i for i, n in enumerate(sess._names)}
        sess._traj = [str(x) for x in blob["traj"]]
        sess.t_step = int(blob["t_step"])
        sess._last_moved = bool(blob["last_moved"])
        sess._cur = int(blob["cur"])
        sess._ended = bool(blob["ended"])
        return sess

    def finish(self) -> dict:
        """Backtrack to the best stop-score node (agent.py:1080-1095) and
        return the final trajectory record."""
        if self.state is None:
            raise RuntimeError("no steps taken")
        out = np.asarray(self.server._finish_jit(
            jnp.asarray(self._pack_mirrors()), self._features, self.state))
        stop_node, tl = int(out[0]), int(out[1])
        tn = out[2:]
        pre = len(self._traj)
        backtrack = [self._names[i] for i in tn[pre:tl]]
        return {
            "stop_node": self._names[stop_node],
            "trajectory": self._traj + backtrack,
            "steps": self.t_step,
        }


# ----------------------------------------------------------------------
# AOT deployment bundles (jax.export)
#
# A robot host should not pay model tracing + XLA compile at process start
# (20-40 s/program on a fresh process, CLAUDE.md platform notes; the
# reference has no serving path at all, let alone a deployable artifact).
# ``NavServer.export_bundle`` ahead-of-time lowers the four per-step device
# programs to serialized StableHLO plus the params and config — ONE
# directory that a serving process loads with ``NavServer.from_bundle``
# without ever tracing the flax model.  The StableHLO still JIT-compiles
# once on the target (hitting the persistent XLA cache when present), but
# tracing/lowering — the dominant warm-process cost on this box — is gone,
# and the artifact is self-contained: bundle + vln_magic_tpu + jax run an
# episode with no checkpoint, tokenizer, or dataset tree mounted.
# ----------------------------------------------------------------------

_EXPORT_REGISTERED = False


def _register_export_pytrees():
    """Register the pytree nodes that cross the export calling convention
    (EpisodeBatch rides in/out of the step programs) for serialization.
    Idempotent; flax struct dataclasses serialize as (name, field-list)."""
    global _EXPORT_REGISTERED
    if _EXPORT_REGISTERED:
        return
    import pickle

    from jax import export as jexp

    for cls, name in ((EpisodeBatch, "vln_magic_tpu.EpisodeBatch"),
                      (Tables, "vln_magic_tpu.Tables")):
        try:
            jexp.register_pytree_node_serialization(
                cls, serialized_name=name,
                # aux is flax-struct static metadata (empty for these all-
                # array classes, but serialize faithfully either way)
                serialize_auxdata=pickle.dumps,
                deserialize_auxdata=pickle.loads)
        except ValueError:
            pass   # already registered (e.g. two servers in one process)
    _EXPORT_REGISTERED = True


# ----------------------------------------------------------------------
# Batched fleet serving: K concurrent robot sessions, ONE dispatch per tick
# ----------------------------------------------------------------------

class FleetSession(NavSession):
    """One slot of a :class:`NavFleet`: host map mirrors identical to a
    standalone session, device state/features/instruction living in the
    fleet's batched buffers.  Obtain via :meth:`NavFleet.join`; drive with
    :meth:`NavFleet.step` (batched) or this object's ``step`` (routes
    through a one-slot fleet tick)."""

    def __init__(self, fleet: "NavFleet", slot: int, instr_encoding):
        self.fleet = fleet
        self.slot = slot
        self.server = fleet            # cfg/shape plumbing only
        self.cfg = fleet.cfg
        self._instr = np.asarray(instr_encoding)
        n, c = fleet.n, fleet.c
        self.n, self.c = n, c
        self.h_pos = np.zeros((n, 3), np.float32)
        self.h_cand_ids = np.full((n, c), -1, np.int32)
        self.h_cand_dist = np.zeros((n, c), np.float32)
        self.h_cand_view = np.zeros((n, c), np.int32)
        self.h_cand_heading = np.zeros((n, c), np.float32)
        self.h_cand_elev = np.zeros((n, c), np.float32)
        self.h_dist = np.zeros((n, n), np.float32)
        self._ids: dict[str, int] = {}
        self._names: list[str] = []

        L = self.cfg.env.max_instr_len
        ids = np.full((1, L), 1, np.int32)
        mask = np.zeros((1, L), bool)
        enc = np.asarray(instr_encoding)[:L]
        ids[0, : len(enc)] = enc
        mask[0, : len(enc)] = True
        fleet._join_slot(slot, ids, mask)

        self.state = None              # device state lives on the fleet
        self.t_step = 0
        self._last_moved = False
        self._started = False
        self._cur = -1
        self._ended = False
        self._traj: list[str] = []

    def _put_feature_row(self, v: int, row: np.ndarray):
        # queue for the next fused tick (NavFleet.step scatters every
        # pending row inside the ONE tick dispatch); a session observes at
        # most one new node per tick, so slot-keyed overwrite is exact
        self.fleet._pending_rows[self.slot] = (v, row)

    def step(self, obs: Observation) -> NavDecision:
        return self.fleet.step({self.slot: obs})[self.slot]

    def finish(self) -> dict:
        return self.fleet.finish(self.slot)

    def save(self, path: str):
        """Persist this slot's episode in the SAME blob format as a
        standalone :meth:`NavSession.save`: the lane's device state and
        feature rows are sliced out of the fleet's batched buffers, with
        ``state.scan`` normalized to 0 so the blob is fleet-agnostic — a
        crashed fleet controller can resume the episode on a fresh
        :class:`NavFleet` (``restore_session``) OR on a standalone
        :class:`NavServer` (``NavSession.restore``), and vice versa."""
        import jax.tree_util as jtu
        from flax import serialization

        f = self.fleet
        state = None
        if self._started and f._state is not None:
            lane = jtu.tree_map(lambda x: np.asarray(x)[self.slot : self.slot + 1],
                                f._state)
            lane = lane.replace(scan=np.zeros_like(np.asarray(lane.scan)))
            state = jtu.tree_map(np.asarray,
                                 serialization.to_state_dict(lane))
        blob = {
            "instr": self._instr,
            "state": state,
            # standalone feature layout [1, n, 36, d] (scan axis 1), so the
            # blob restores on either server kind; a row queued but not yet
            # flushed by a tick (aborted step) is folded in here
            "features": _slot_features_with_pending(f, self.slot),
            "mirrors": {
                "pos": self.h_pos, "dist": self.h_dist,
                "cand_ids": self.h_cand_ids, "cand_dist": self.h_cand_dist,
                "cand_view": self.h_cand_view,
                "cand_heading": self.h_cand_heading,
                "cand_elev": self.h_cand_elev,
            },
            "names": list(self._names),
            "traj": list(self._traj),
            "t_step": self.t_step,
            "last_moved": self._last_moved,
            "cur": self._cur,
            "ended": self._ended,
        }
        with open(path, "wb") as f_out:
            f_out.write(serialization.msgpack_serialize(blob))


def _slot_features_with_pending(fleet: "NavFleet", slot: int) -> np.ndarray:
    """One slot's feature rows in the standalone [1, n, 36, d] layout, with
    any row queued for the next tick (``fleet._pending_rows``) applied."""
    ft = np.asarray(fleet._features[slot])[None].copy()
    pend = fleet._pending_rows.get(slot)
    if pend is not None:
        v, row = pend
        ft[0, v] = row
    return ft


class NavFleet(NavServer):
    """Batched multi-session serving: ``slots`` concurrent episodes advance
    in ONE fused device dispatch per control tick (the single-session
    ``--serve`` loop measured 5.4 ms for an 8-episode batch vs ~31 ms for
    one remote decision — round trips, not compute, dominate, so a fleet
    controller serving K robots should pay them once per tick, not K times).

    Synchronous ticks: every session with a pending observation is stepped
    together; sessions at different episode phases coexist (per-lane
    ``is_first`` folds episode init into the same program; per-lane t_step).
    Lanes not submitting in a tick are bit-frozen (their state is merged
    back unchanged).  Decisions are pinned identical to K standalone
    :class:`NavServer` sessions (tests/test_serving.py)."""

    def __init__(self, cfg: MagicConfig, params, slots: int = 8,
                 max_nodes: int | None = None, max_cands: int = 10,
                 zdicts: dict | None = None, model=None,
                 max_feature_gb: float = 8.0):
        super().__init__(cfg, params, max_nodes=max_nodes,
                         max_cands=max_cands, zdicts=zdicts, model=model)
        self.k = slots
        n, c = self.n, self.c
        d = self.cfg.model.image_feat_size
        L = self.cfg.env.max_instr_len
        dm = self.cfg.model.hidden_size
        # HBM envelope guard: the fleet's dominant buffer is the per-slot
        # feature bank, slots x n x 36 x d f32.  At the RxR node budget
        # (n=206, d=768, 8 slots) that is ~4.6 GB of the chip's 16 GB; the
        # node budget defaults from config, so a big max_gmap_len can blow
        # it silently.  Raise max_feature_gb (or lower slots / max_nodes /
        # image_feat_size) deliberately, not by surprise.
        feat_gb = slots * n * 36 * d * 4 / 1e9
        if feat_gb > max_feature_gb:
            raise ValueError(
                f"NavFleet feature bank would be {feat_gb:.1f} GB "
                f"(slots={slots} x max_nodes={n} x 36 views x "
                f"feat={d} f32) > max_feature_gb={max_feature_gb}; "
                f"lower slots/max_nodes/image_feat_size or pass a larger "
                f"max_feature_gb if the accelerator has the HBM for it")
        self._features = jnp.zeros((slots, n, 36, d), jnp.float32)
        self._txt_buf = jnp.zeros((slots, L, dm), jnp.float32)
        self._txt_mask_buf = jnp.zeros((slots, L), bool)
        self._kv_buf = None
        if self.cfg.model.hoist_text_kv:
            kv_shape = jax.eval_shape(
                self._lang, jax.tree.map(
                    lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype),
                    self.params),
                jax.ShapeDtypeStruct((1, L), jnp.int32),
                jax.ShapeDtypeStruct((1, L), jnp.bool_))[1]
            self._kv_buf = jax.tree.map(
                lambda s: jnp.zeros((slots,) + s.shape[1:], s.dtype),
                kv_shape)
        self._state = None             # lazy: built on the first tick
        self._sessions: dict[int, FleetSession] = {}
        # feature rows observed since the last tick, keyed by slot; flushed
        # INSIDE the fused tick program (one scatter) instead of one jit
        # dispatch per session — the round-4 ladder's ~3.6 ms/session linear
        # term was exactly K per-session dispatches through the tunnel
        self._pending_rows: dict[int, tuple[int, np.ndarray]] = {}

        def join(params, ids, mask, txt_buf, mask_buf, kv_buf, slot):
            emb, kv = self._lang(params, ids, mask)
            txt_buf = txt_buf.at[slot].set(emb[0].astype(txt_buf.dtype))
            mask_buf = mask_buf.at[slot].set(mask[0])
            if kv_buf is not None:
                kv_buf = jax.tree.map(lambda b, x: b.at[slot].set(x[0]),
                                      kv_buf, kv)
            return txt_buf, mask_buf, kv_buf

        self._join_jit = jax.jit(join, donate_argnums=(3, 4, 5))
        # donate the feature bank (can be GBs — see the envelope guard) so
        # the in-program row scatter aliases in place; the episode state is
        # NOT donated — EpisodeBatch inits share buffers between zero-filled
        # leaves, and donation rejects aliased leaves in one pytree
        self._tick_jit = jax.jit(self._tick, donate_argnums=(2,))
        self._fleet_finish_jit = jax.jit(self._fleet_finish)

    # ------------------------------------------------------------------

    def _join_slot(self, slot, ids, mask):
        self._txt_buf, self._txt_mask_buf, self._kv_buf = self._join_jit(
            self.params, jnp.asarray(ids), jnp.asarray(mask),
            self._txt_buf, self._txt_mask_buf, self._kv_buf,
            jnp.asarray(slot, jnp.int32))

    def _unpack_fleet(self, packed, features) -> Tables:
        """Per-slot packed mirrors [K, P] -> Tables with the SLOT as the
        scan axis (each session owns its incremental world; the rollout
        machinery is multi-scan native, state.scan = slot)."""
        n, c = self.n, self.c
        k = packed.shape[0]
        sizes = [n * 3, n * n, n * c, n * c, n * c, n * c, n * c]
        off = np.cumsum([0] + sizes)
        part = lambda i, shape: packed[:, off[i]:off[i + 1]].reshape(
            (k,) + shape)
        cand_ids = part(2, (n, c)).astype(jnp.int32)
        return Tables(
            node_mask=jnp.ones_like(cand_ids[..., 0], bool),
            positions=part(0, (n, 3)),
            dist=part(1, (n, n)),
            steps=jnp.zeros_like(cand_ids[..., 0], shape=(k, n, n)),
            next_hop=jnp.zeros_like(cand_ids[..., 0], shape=(k, n, n)),
            cand_ids=cand_ids,
            cand_dist=part(3, (n, c)),
            cand_view=part(4, (n, c)).astype(jnp.int32),
            cand_heading=part(5, (n, c)),
            cand_elevation=part(6, (n, c)),
            cand_mask=cand_ids >= 0,
            features=features,
        )

    def _tick(self, params, packed, features, feat_v, feat_rows, state,
              ctl, txt_embeds, txt_masks, txt_kv):
        """One fused dispatch for every submitting lane: this tick's newly
        observed feature rows scattered into the bank, per-lane episode
        init (is_first), arrival relax/observe, model step, transition.
        Non-submitting lanes come back bit-identical (full-state merge).

        ``ctl`` packs the per-lane control scalars as ONE f32 [K, 6] buffer
        (submit, is_first, moved, v, heading, t_step) — same lesson as the
        standalone packed protocol: through a remote-attached chip, round
        trips dominate, so the host ships 3 buffers (mirrors, ctl, rows),
        not 9+K.  ``feat_v`` holds the sentinel ``n`` for lanes with no new
        row this tick; the scatter drops out-of-range updates."""
        k = packed.shape[0]
        features = features.at[jnp.arange(k), feat_v].set(
            feat_rows, mode="drop")
        submit = ctl[:, 0] > 0
        is_first = ctl[:, 1] > 0
        moved = ctl[:, 2] > 0
        v = ctl[:, 3].astype(jnp.int32)      # node ids << 2^24: f32-exact
        heading = ctl[:, 4]
        t_step = ctl[:, 5].astype(jnp.int32)
        tables = self._unpack_fleet(packed, features)
        slot_ids = jnp.cumsum(jnp.ones_like(v)) - 1        # arange(k), traced
        fresh = init_episodes(tables, slot_ids, v, heading, v[:, None],
                              jnp.ones_like(v), self.rollout.model_dims,
                              observed_parity=True)
        sel = lambda f, s: jnp.where(
            is_first.reshape((k,) + (1,) * (f.ndim - 1)), f, s)
        state0 = jax.tree_util.tree_map(sel, fresh, state)
        # freeze non-submitting lanes inside the program (everything below
        # gates on ~ended), then merge them back verbatim at the end
        eff = state0.replace(ended=state0.ended | ~submit)
        live_arrival = submit & moved & ~is_first & ~state0.ended
        eff = relax_observed(eff, tables, eff.cur, live_arrival)
        eff = _observe(eff, tables)
        new_state, out = self._decide_core(params, tables, eff,
                                           txt_embeds, txt_masks, txt_kv,
                                           t_step)
        keep = submit & ~state0.ended
        mrg = lambda ns, s: jnp.where(
            keep.reshape((k,) + (1,) * (ns.ndim - 1)), ns, s)
        merged = jax.tree_util.tree_map(mrg, new_state, state0)
        return features, merged, out

    def _fleet_finish(self, packed, features, state):
        tables = self._unpack_fleet(packed, features)
        r = self.rollout
        prev = r.t
        r.t = tables
        try:
            stop_node = r.final_stop_node(state)
            tn, tl = r._record_backtrack(state, stop_node)
            return jnp.concatenate(
                [jnp.stack([stop_node, tl], axis=1), tn], axis=1)
        finally:
            r.t = prev

    # ------------------------------------------------------------------
    # control-loop API
    # ------------------------------------------------------------------

    def join(self, instr_encoding) -> FleetSession:
        """Claim a free slot for a new episode (language encoded + scattered
        into the fleet buffers in one dispatch)."""
        for slot in range(self.k):
            if slot not in self._sessions:
                sess = FleetSession(self, slot, instr_encoding)
                self._sessions[slot] = sess
                return sess
        raise RuntimeError(f"all {self.k} fleet slots busy; release one")

    def release(self, slot: int):
        self._sessions.pop(slot, None)
        self._pending_rows.pop(slot, None)   # never scatter a stale row
                                             # into a re-claimed slot

    def restore_session(self, path: str) -> FleetSession:
        """Resume a saved session (written by :meth:`FleetSession.save` or
        by a standalone :meth:`NavSession.save` — one blob format) into a
        free slot: host mirrors restored verbatim, the feature rows and the
        episode-state lane scattered into the fleet's batched buffers with
        ``state.scan`` re-pointed at the new slot.  Closes the fleet half of
        the SURVEY §5.3 crash-recovery contract."""
        import jax.tree_util as jtu
        from flax import serialization

        with open(path, "rb") as f:
            blob = serialization.msgpack_restore(f.read())
        sess = self.join(np.asarray(blob["instr"]))
        slot = sess.slot
        m = blob["mirrors"]
        sess.h_pos[:] = m["pos"]
        sess.h_dist[:] = m["dist"]
        sess.h_cand_ids[:] = m["cand_ids"]
        sess.h_cand_dist[:] = m["cand_dist"]
        sess.h_cand_view[:] = m["cand_view"]
        sess.h_cand_heading[:] = m["cand_heading"]
        sess.h_cand_elev[:] = m["cand_elev"]
        sess._names = [str(x) for x in blob["names"]]
        sess._ids = {n: i for i, n in enumerate(sess._names)}
        sess._traj = [str(x) for x in blob["traj"]]
        sess.t_step = int(blob["t_step"])
        sess._last_moved = bool(blob["last_moved"])
        sess._cur = int(blob["cur"])
        sess._ended = bool(blob["ended"])
        sess._started = blob["state"] is not None
        ft = np.asarray(blob["features"])
        if ft.ndim == 4:               # standalone layout [1, n, 36, d]
            ft = ft[0]
        self._features = self._features.at[slot].set(jnp.asarray(ft))
        if blob["state"] is not None:
            lane = EpisodeBatch(**jtu.tree_map(jnp.asarray, blob["state"]))
            lane = lane.replace(scan=jnp.full_like(lane.scan, slot))
            if self._state is None:
                # no tick has run yet: build the all-lanes holder exactly as
                # the first tick would (every lane ended until it submits)
                packed = jnp.asarray(np.stack([
                    (self._sessions[s]._pack_mirrors()
                     if s in self._sessions
                     else np.zeros(self.n * 3 + self.n * self.n
                                   + 5 * self.n * self.c, np.float32))
                    for s in range(self.k)]))
                tables = self._unpack_fleet(packed, self._features)
                zeros = jnp.zeros(self.k, jnp.int32)
                st = init_episodes(tables,
                                   jnp.arange(self.k, dtype=jnp.int32),
                                   zeros, jnp.zeros(self.k, jnp.float32),
                                   zeros[:, None], jnp.ones(self.k, jnp.int32),
                                   self.rollout.model_dims,
                                   observed_parity=True)
                self._state = st.replace(ended=jnp.ones(self.k, bool))
            self._state = jtu.tree_map(
                lambda buf, x: buf.at[slot].set(x[0]), self._state, lane)
        return sess

    def step(self, obs_by_slot: dict[int, Observation]) \
            -> dict[int, NavDecision]:
        """One control tick: ingest each submitting session's observation,
        advance ALL of them in one fused dispatch, return their decisions."""
        t0 = time.perf_counter()
        k = self.k
        ctl = np.zeros((k, 6), np.float32)   # submit/is_first/moved/v/
        v_arr = np.zeros(k, np.int32)        # heading/t_step, one H2D
        heading = np.zeros(k, np.float32)
        pre_lens = {}
        for slot, obs in obs_by_slot.items():
            sess = self._sessions[slot]
            if sess._ended:
                raise RuntimeError(
                    f"slot {slot}: episode already ended; call finish()")
            v = sess._ingest(obs)
            if not sess._started:
                ctl[slot, 1] = 1.0
                heading[slot] = obs.heading
            elif v != sess._cur:
                raise ValueError(
                    f"slot {slot}: observation at '{obs.node}' but the "
                    f"session's current node is "
                    f"'{sess._names[sess._cur]}'")
            ctl[slot, 0] = 1.0
            ctl[slot, 2] = float(sess._last_moved)
            ctl[slot, 3] = float(v)
            ctl[slot, 5] = float(sess.t_step)
            v_arr[slot] = v
            pre_lens[slot] = max(len(sess._traj), 1)
        ctl[:, 4] = heading

        # this tick's newly observed rows, fixed [K] layout (sentinel n =
        # no update, dropped by the in-program scatter): same bytes as the
        # old per-session dispatches, ONE transfer instead of K
        d = self.cfg.model.image_feat_size
        feat_v = np.full(k, self.n, np.int32)
        feat_rows = np.zeros((k, 36, d), np.float32)
        for slot, (v, row) in self._pending_rows.items():
            feat_v[slot] = v
            feat_rows[slot] = row
        self._pending_rows.clear()

        packed = jnp.asarray(np.stack([
            (self._sessions[s]._pack_mirrors() if s in self._sessions
             else np.zeros(self.n * 3 + self.n * self.n
                           + 5 * self.n * self.c, np.float32))
            for s in range(k)]))
        if self._state is None:
            # first tick ever: a fresh all-lanes state (inactive lanes ended)
            tables = self._unpack_fleet(packed, self._features)
            st = init_episodes(tables, jnp.arange(k, dtype=jnp.int32),
                               jnp.asarray(v_arr), jnp.asarray(heading),
                               jnp.asarray(v_arr)[:, None],
                               jnp.ones(k, jnp.int32),
                               self.rollout.model_dims,
                               observed_parity=True)
            self._state = st.replace(ended=jnp.ones(k, bool))
        self._features, self._state, out = self._tick_jit(
            self.params, packed, self._features, jnp.asarray(feat_v),
            jnp.asarray(feat_rows), self._state, jnp.asarray(ctl),
            self._txt_buf, self._txt_mask_buf, self._kv_buf)
        out = np.asarray(out)           # the ONE D2H per tick
        latency = (time.perf_counter() - t0) * 1000.0
        decisions = {}
        for slot, obs in obs_by_slot.items():
            sess = self._sessions[slot]
            chosen, ended, action, traj_len = (int(x) for x in out[slot, :4])
            traj_nodes = out[slot, 4:]
            if not sess._started:
                sess._started = True
                sess._traj = [obs.node]
            sess.t_step += 1
            sess._last_moved = chosen >= 0
            sess._ended = bool(ended) or chosen < 0
            path = []
            if chosen >= 0:
                sess._cur = chosen
                path = [sess._names[i]
                        for i in traj_nodes[pre_lens[slot]:traj_len]]
                sess._traj.extend(path)
            elif sess._cur < 0:
                sess._cur = v_arr[slot]
            decisions[slot] = NavDecision(
                stop=sess._ended,
                target=sess._names[chosen] if chosen >= 0 else None,
                path=path, action_index=action, latency_ms=latency)
        return decisions

    def finish(self, slot: int) -> dict:
        sess = self._sessions[slot]
        if not sess._started:
            raise RuntimeError("no steps taken")
        packed = jnp.asarray(np.stack([
            (self._sessions[s]._pack_mirrors() if s in self._sessions
             else np.zeros(self.n * 3 + self.n * self.n
                           + 5 * self.n * self.c, np.float32))
            for s in range(self.k)]))
        out = np.asarray(self._fleet_finish_jit(packed, self._features,
                                                self._state))
        stop_node, tl = int(out[slot, 0]), int(out[slot, 1])
        tn = out[slot, 2:]
        pre = len(sess._traj)
        backtrack = [sess._names[i] for i in tn[pre:tl]]
        return {
            "stop_node": sess._names[stop_node],
            "trajectory": sess._traj + backtrack,
            "steps": sess.t_step,
        }
