"""Continuous-batching greedy evaluation (streaming rollout).

The batch evaluator (`Navigator.evaluate`) runs episodes in fixed waves of B
lanes for the full ``max_action_len`` scan: episodes that stop early leave
their lane masked-but-computing for the rest of the wave (the measured
semantic fraction at the honest R2R shape is ~0.79 — docs/PERF.md).  The
reference has the same dead time — its rollout only breaks once EVERY episode
in the minibatch has ended (reference map_nav_src/r2r/agent.py:1109-1110).

This module closes that gap the way LLM serving does with continuous
batching: a device-resident episode QUEUE.  Lanes whose episode ended are
refilled at compiled-chunk boundaries from banked episode metadata + a banked
language forward, so the lanes stay (nearly) full until the queue drains —
a lane idles at most chunk-1 steps, vs up to the whole wave in batch mode.
(Per-STEP in-scan refill was built first and measured: the refill machinery
cost +14% on every scan step — more than the idle steps it saved; boundary
refill keeps the scan body identical to the batch step.  docs/PERF.md.)
Per-episode outputs are scattered into [Q]-indexed buffers at the step each
episode ends, which makes the streamed decode byte-identical to the batch
decode per episode (pinned in tests/test_streaming.py):

- lane state reset = the same ``init_episodes`` math the batch path uses;
- per-lane step clocks (``lane_t``) replace the global scan index everywhere
  it has per-episode meaning (step-id stamping, the forced stop at
  ``max_action_len - 1``);
- the language forward is precomputed once per episode into a bank (the same
  hoisting ``Rollout.run`` does per batch), gathered on refill.

Scope: greedy argmax eval on the full-table (non-parity) path — the
throughput/serving regime.  Observed-graph parity mode, MC-dropout ensembles,
and ``detailed_output`` keep the batch path (parity needs the per-episode
stop-score backtrack walk, which would put a second bounded walk in every
step).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .rollout import EpisodeBatch, Rollout, Tables, init_episodes

__all__ = ["StreamEval"]


def _bcast(mask, like):
    return mask.reshape(mask.shape + (1,) * (like.ndim - 1))


class StreamEval:
    """Queue-refilled greedy decode over a bank of episodes.

    Built once per (Navigator, queue size) pair; the chunked step function is
    jitted with tables/banks as ARGUMENTS (closed-over tables bake into the
    program and the compile blows up with scan count — rollout.run docstring).
    """

    def __init__(self, rollout: Rollout, env_cfg, batch_lanes: int,
                 chunk_steps: int | None = None):
        self.ro = rollout
        self.env = env_cfg
        self.lanes = int(batch_lanes)
        # chunk = the refill/drain granularity: an ended lane idles at most
        # chunk-1 steps before a boundary refill, but every boundary pays
        # the refill + table-hoist cost — T/3 balances the two at the R2R
        # shape (chunk boundaries are in-device while_loop iterations, so
        # they cost compute only, never a host sync)
        self.chunk = int(chunk_steps or max(2, env_cfg.max_action_len // 3))
        self.policy_key = {
            "dynamic": "fused_logits", "avg": "fused_logits",
            "global": "global_logits", "local": "local_logits",
        }[rollout.cfg.fusion]
        self.local_acts = rollout.cfg.fusion == "local"
        if env_cfg.observed_graph_parity:
            raise ValueError(
                "streaming eval supports the full-table path only; parity "
                "mode keeps the batch evaluator (module docstring)")
        # the WHOLE decode — lane init, chunked while_loop, drain check —
        # is ONE jitted dispatch: any host-side chunk loop pays a blocking
        # done-flag read per lookahead group, and through a remote-attached
        # TPU every read is a tunnel round trip (~10-30 ms); measured
        # ladder in docs/PERF.md "continuous batching" (round 4)
        self._drain_fn = jax.jit(self._drain)
        # ONE cached jit for the bank language forward: a fresh jit closure
        # per build_banks call re-traces every run — 4 traces x ~0.3 s on a
        # 1-CPU host measured as the dominant cost of the whole streamed
        # run (TPU profile: device busy 0.41 s of a 2.14 s wall)
        self._lang_fn = jax.jit(self._lang)

    # ------------------------------------------------------------------
    # banks
    # ------------------------------------------------------------------

    def prepare(self, items, max_instr_len: int, max_gt_len: int = 24):
        """The params-INDEPENDENT episode bank for a queue of items: world
        metadata + tokenized instructions, padded to a lane multiple and
        shipped to the device once.

        A corpus is decoded many times with fresh params (eval every K
        iters); this host/numpy/H2D work (~60 ms at Q=1024 on this box) is
        identical every time, so callers hold one prepared bank per split
        and pass it to :meth:`run` — only the language forward re-runs."""
        q_real = len(items)
        items = list(items)
        if q_real == 0:
            raise ValueError("empty item list")
        # pad the queue to a lane multiple: fills the lanes, and bounds the
        # bank-shape buckets (one lang/drain program per padded Q) so
        # different dataset sizes reuse compiled programs
        while len(items) % self.lanes:
            items.append(items[len(items) % q_real])
        q = len(items)
        scan = np.array([it["scan_idx"] for it in items], np.int32)
        start = np.array([it["path_idx"][0] for it in items], np.int32)
        heading = np.array([it["heading"] for it in items], np.float32)
        gt_path = np.full((q, max_gt_len), -1, np.int32)
        gt_len = np.zeros((q,), np.int32)
        for i, it in enumerate(items):
            p = np.asarray(it["path_idx"])[:max_gt_len]
            gt_path[i, : len(p)] = p
            gt_len[i] = len(p)

        # one GLOBAL instruction length for the whole queue (the batch path
        # buckets per chunk; padded positions are masked out of attention, so
        # the decode is unaffected — pad_instructions docstring)
        L = min(max((len(it["instr_encoding"]) for it in items), default=16),
                max_instr_len)
        L = min(((L + 15) // 16) * 16, max_instr_len)
        ids = np.full((q, L), 1, np.int32)
        masks = np.zeros((q, L), dtype=bool)
        for i, it in enumerate(items):
            enc = np.asarray(it["instr_encoding"])[:L]
            ids[i, : len(enc)] = enc
            masks[i, : len(enc)] = True
        return {
            "q_real": q_real,
            "scan": jnp.asarray(scan), "start": jnp.asarray(start),
            "heading": jnp.asarray(heading), "gt_path": jnp.asarray(gt_path),
            "gt_len": jnp.asarray(gt_len),
            "txt_ids": jnp.asarray(ids), "txt_masks": jnp.asarray(masks),
        }

    def build_banks(self, params, prepared, zdicts=None):
        """Banks for the drain: the prepared episode metadata plus the
        params-dependent hoisted language forward (txt embeds and, when
        enabled, the per-cross-layer instruction K/V — the same hoist
        Rollout.run does), as one jitted call over the whole queue."""
        zd_q = self._zd_for(zdicts, prepared["scan"].shape[0])
        emb, txt_kv = self._lang_fn(params, prepared["txt_ids"],
                                    prepared["txt_masks"], zd_q)
        banks = {k: v for k, v in prepared.items()
                 if k not in ("q_real", "txt_ids")}
        banks["txt_embeds"] = emb
        return banks, txt_kv

    def _lang(self, params, ids, masks, zdc):
        """Bank language forward + (when enabled) the hoisted cross K/V."""
        model = self.ro.model
        emb, _attns = model.apply(
            params, ids, masks, instr_zdict=zdc.get("instr_zdict"),
            front_txt_feats=zdc.get("front_txt_feats"),
            deterministic=True, method=type(model).language)
        kv = (model.apply(params, emb, method=type(model).text_cross_kv)
              if self.ro.cfg.hoist_text_kv and not self.ro.cfg.fuse_branches
              else None)
        return emb, kv

    def _zd_for(self, zdicts, b):
        """Student intervention dicts broadcast over the lane batch (the same
        plumbing as Rollout.run's zd_for)."""
        z = (zdicts or {}).get("student") or {}
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

    # ------------------------------------------------------------------
    # the chunked scan
    # ------------------------------------------------------------------

    def _init_carry(self, tables: Tables, banks, txt_kv):
        b, q = self.lanes, banks["scan"].shape[0]
        t_budget = self.env.max_action_len
        lane0 = jnp.arange(b, dtype=jnp.int32) % q   # q >= b enforced in run()
        state = init_episodes(
            tables, banks["scan"][lane0], banks["start"][lane0],
            banks["heading"][lane0], banks["gt_path"][lane0],
            banks["gt_len"][lane0], self.ro.model_dims,
            observed_parity=False)
        bufs = {
            "actions": jnp.full((q + 1, t_budget), -1, jnp.int32),
            "stop": jnp.full((q + 1,), -1, jnp.int32),
            "cur": jnp.full((q + 1,), -1, jnp.int32),
            "overflow": jnp.zeros((q + 1,), bool),
            "done": jnp.zeros((q + 1,), bool),
        }
        return {
            "state": state,
            "ep_idx": lane0,
            "ptr": jnp.asarray(min(b, q), jnp.int32),
            "lane_t": jnp.zeros((b,), jnp.int32),
            "txt_e": banks["txt_embeds"][lane0],
            "txt_m": banks["txt_masks"][lane0],
            "txt_kv": (None if txt_kv is None else jax.tree_util.tree_map(
                lambda x: x[lane0], txt_kv)),
            "bufs": bufs,
            "sem": jnp.zeros((), jnp.int32),
            "rng": jax.random.PRNGKey(0),
        }

    def _max_chunks(self, q: int) -> int:
        """Hard drain bound: every episode ends within ``max_action_len`` of
        its start (plus <chunk idle steps before its lane refills at a
        boundary), and lanes always hold an undrained episode before the
        queue empties."""
        return 2 + ((q // self.lanes + 2)
                    * (self.env.max_action_len + self.chunk)
                    + self.chunk - 1) // self.chunk

    def _drain(self, params, tables, banks, txt_kv_bank, zd):
        """The whole queue decode as ONE device program: lane init, then a
        ``lax.while_loop`` whose body is [boundary refill + ``self.chunk``
        pure eval scan steps], looping until the queue is empty and every
        lane has ended (bounded by ``_max_chunks`` as a runaway backstop).

        Refill at the chunk boundary — not inside the scan — keeps the scan
        body byte-for-byte the batch step: an in-scan refill re-ran the
        episode init, a tree-wide select over the whole EpisodeBatch, and
        the bank gathers EVERY step, measured at +14% per scan step — more
        than the idle steps it saved (docs/PERF.md round 4).  A lane that
        ends mid-chunk idles at most chunk-1 steps (masked compute, same as
        the batch path's post-ended iterations).  Boundary refill also
        restores the per-episode world-table hoist (``ep``): lane scans are
        constant within a chunk.

        Returns ``(carry, chunks_run, drained)``."""
        ro = self.ro
        q = banks["scan"].shape[0]
        max_chunks = self._max_chunks(q)
        carry = self._init_carry(tables, banks, txt_kv_bank)

        def drained(c):
            return c["state"].ended.all() & (c["ptr"] >= q)

        prev_t = ro.t
        ro.t = tables
        try:
            def cond(s):
                c, n = s
                return ~drained(c) & (n < max_chunks)

            def body(s):
                c, n = s
                c = self._refill(banks, txt_kv_bank, c)
                # per-episode world-table slices, hoisted per chunk (the
                # same hoist Rollout.run does per wave)
                ep = {"dist_f": tables.dist[c["state"].scan],
                      "pos": tables.positions[c["state"].scan],
                      "nh_f": tables.next_hop[c["state"].scan]
                          .astype(jnp.float32)}

                def step(cc, _):
                    return self._step(params, zd, ep, q, cc), None

                c, _ = jax.lax.scan(step, c, None, length=self.chunk)
                return c, n + 1

            carry, chunks = jax.lax.while_loop(
                cond, body, (carry, jnp.zeros((), jnp.int32)))
        finally:
            ro.t = prev_t
        return carry, chunks, drained(carry)

    def _refill(self, banks, txt_kv_bank, c):
        """Assign queued episodes to ended lanes and reset lane state/text
        (the same ``init_episodes`` math the batch path runs per wave)."""
        ro = self.ro
        q = banks["scan"].shape[0]
        state: EpisodeBatch = c["state"]
        ended = state.ended
        e_i = ended.astype(jnp.int32)
        rank = jnp.cumsum(e_i) - e_i                     # exclusive prefix
        refill = ended & (c["ptr"] + rank < q)
        new_idx = jnp.where(refill, jnp.minimum(c["ptr"] + rank, q - 1),
                            c["ep_idx"])
        fresh = init_episodes(
            ro.t, banks["scan"][new_idx], banks["start"][new_idx],
            banks["heading"][new_idx], banks["gt_path"][new_idx],
            banks["gt_len"][new_idx], ro.model_dims, observed_parity=False)
        state = jax.tree_util.tree_map(
            lambda f, o: jnp.where(_bcast(refill, o), f, o), fresh, state)
        txt_kv = c["txt_kv"]
        if txt_kv is not None:
            txt_kv = jax.tree_util.tree_map(
                lambda bank, cur: jnp.where(_bcast(refill, cur),
                                            bank[new_idx], cur),
                txt_kv_bank, txt_kv)
        return {
            **c, "state": state, "ep_idx": new_idx,
            "ptr": c["ptr"] + refill.sum(dtype=jnp.int32),
            "lane_t": jnp.where(refill, 0, c["lane_t"]),
            "txt_e": jnp.where(refill[:, None, None],
                               banks["txt_embeds"][new_idx], c["txt_e"]),
            "txt_m": jnp.where(refill[:, None], banks["txt_masks"][new_idx],
                               c["txt_m"]),
            "txt_kv": txt_kv,
        }

    def _step(self, params, zd, ep, q, c):
        """One pure eval scan step (Rollout.run's step_fn eval slice, with
        the per-lane clock ``lane_t`` standing in for the global scan index
        everywhere it has per-episode meaning)."""
        ro = self.ro
        env = self.env
        b = self.lanes
        t_budget = env.max_action_len
        state: EpisodeBatch = c["state"]
        bufs = dict(c["bufs"])
        ep_idx, lane_t = c["ep_idx"], c["lane_t"]

        rng, k_drop, k_act = jax.random.split(c["rng"], 3)
        bi = jnp.arange(b)
        live0 = ~state.ended
        trash = ro.t.node_mask.shape[1]
        state = state.replace(step_ids=state.step_ids.at[
            bi, jnp.where(live0, state.cur, trash)].set(
            jnp.where(live0, lane_t + 1, state.step_ids[bi, trash])))
        pano = ro.assemble_pano(state)
        gmap_base = ro.assemble_gmap_base(state, ep)
        vp_base = ro.assemble_vp_base(state, pano, gmap_base, ep)
        state, gmap, outs = ro._model_step(
            ro.model, params, "student", state, c["txt_e"], c["txt_m"],
            k_drop, True, zd, 1, (pano, gmap_base, vp_base),
            txt_kv=c["txt_kv"])
        logits = outs[self.policy_key]
        a = ro.select_action(logits, "argmax", k_act, None, gmap, state)
        stop_prob = jax.nn.softmax(logits, axis=-1)[:, 0]
        state, chosen, just_ended = ro.transition(
            state, gmap, a, stop_prob, lane_t, "argmax", pano=pano,
            local_actions=self.local_acts, ep=ep)

        # ---- record ------------------------------------------------------
        # per-step action into the episode's row (dead lanes -> trash row q)
        row = jnp.where(live0, ep_idx, q)
        bufs["actions"] = bufs["actions"].at[
            row, jnp.minimum(lane_t, t_budget - 1)].set(chosen)
        # episode results the moment it ends — the lane's state rows are
        # final here, identical to the batch path's end-of-scan read
        erow = jnp.where(just_ended, ep_idx, q)
        bufs["stop"] = bufs["stop"].at[erow].set(ro.final_stop_node(state))
        bufs["cur"] = bufs["cur"].at[erow].set(state.cur)
        bufs["overflow"] = bufs["overflow"].at[erow].set(
            state.obs_count > env.max_gmap_len - 2)
        bufs["done"] = bufs["done"].at[erow].set(True)

        return {
            **c, "state": state, "bufs": bufs,
            "lane_t": lane_t + live0.astype(jnp.int32),
            "sem": c["sem"] + live0.sum(dtype=jnp.int32),
            "rng": rng,
        }

    # ------------------------------------------------------------------
    # driver
    # ------------------------------------------------------------------

    def run(self, params, tables: Tables, items=None, max_instr_len=None,
            zdicts=None, prepared=None):
        """Decode every episode in ``items`` through the refilled lanes.

        Returns a dict of per-episode numpy outputs: ``actions`` [Q, T]
        (chosen target per step, -1 once stopped), ``stop_node`` [Q],
        ``final_cur`` [Q], ``overflow`` [Q] bool, plus ``semantic_steps``,
        ``scan_steps`` (pipeline iterations run) and ``chunks``.

        Pass ``prepared=self.prepare(items, max_instr_len)`` to reuse the
        params-independent item bank across repeated decodes of the same
        split (the eval-every-K-iters pattern) — then only the language
        forward and the drain run per call.

        The decode is one device-resident ``lax.while_loop`` dispatch
        (``_drain`` docstring) — the host's only blocking read is the final
        result fetch, so a remote-attached chip pays ONE tunnel round trip
        per corpus, not one per chunk group.
        """
        if prepared is None:
            if items is None or max_instr_len is None:
                raise ValueError("run() needs items+max_instr_len or "
                                 "prepared=")
            prepared = self.prepare(items, max_instr_len)
        q_real = prepared["q_real"]
        banks, txt_kv_bank = self.build_banks(params, prepared,
                                              zdicts=zdicts)
        zd = self._zd_for(zdicts, self.lanes)
        carry, chunks, ok = self._drain_fn(params, tables, banks,
                                           txt_kv_bank, zd)
        bufs = jax.device_get(carry["bufs"])
        chunks = int(chunks)
        if not bool(ok):
            raise RuntimeError(
                "streaming eval failed to drain the queue in "
                f"{self._max_chunks(prepared['scan'].shape[0])} chunks "
                "(bug)")
        assert bufs["done"][:q_real].all(), "episode left undecoded (bug)"
        return {
            "actions": bufs["actions"][:q_real],
            "stop_node": bufs["stop"][:q_real],
            "final_cur": bufs["cur"][:q_real],
            "overflow": bufs["overflow"][:q_real],
            "semantic_steps": int(carry["sem"]),
            "scan_steps": chunks * self.chunk,
            "chunks": chunks,
        }
