"""Continuous-batching greedy evaluation (streaming rollout).

The batch evaluator (`Navigator.evaluate`) runs episodes in fixed waves of B
lanes for the full ``max_action_len`` scan: episodes that stop early leave
their lane masked-but-computing for the rest of the wave (the measured
semantic fraction at the honest R2R shape is ~0.79 — docs/PERF.md).  The
reference has the same dead time — its rollout only breaks once EVERY episode
in the minibatch has ended (reference map_nav_src/r2r/agent.py:1109-1110).

This module closes that gap the way LLM serving does with continuous
batching: a device-resident episode QUEUE.  Lanes whose episode ended are
refilled *inside the compiled scan* from banked episode metadata + banked
instruction encodings, so every scan step runs (nearly) B live episodes until
the queue drains.  Per-episode outputs are scattered into [Q]-indexed buffers
at the step each episode ends, which makes the streamed decode byte-identical
to the batch decode per episode (pinned in tests/test_streaming.py):

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
        self.chunk = int(chunk_steps or env_cfg.max_action_len)
        self.policy_key = {
            "dynamic": "fused_logits", "avg": "fused_logits",
            "global": "global_logits", "local": "local_logits",
        }[rollout.cfg.fusion]
        self.local_acts = rollout.cfg.fusion == "local"
        if env_cfg.observed_graph_parity:
            raise ValueError(
                "streaming eval supports the full-table path only; parity "
                "mode keeps the batch evaluator (module docstring)")
        self._chunk_fn = jax.jit(self._run_chunk, donate_argnums=(3,))
        self._init_fn = jax.jit(self._init_carry)

    # ------------------------------------------------------------------
    # banks
    # ------------------------------------------------------------------

    def build_banks(self, params, items, max_instr_len: int,
                    max_gt_len: int = 24, zdicts=None):
        """Device banks for Q episodes: per-episode world metadata + the
        hoisted language forward (txt embeds and, when enabled, the
        per-cross-layer instruction K/V — the same hoist Rollout.run does)."""
        q = len(items)
        model = self.ro.model
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

        zd = self._zd_for(zdicts, self.lanes)
        hoist = (self.ro.cfg.hoist_text_kv
                 and not self.ro.cfg.fuse_branches)

        @jax.jit
        def lang(p_, ids_, masks_, zdc):
            emb, _attns = model.apply(
                p_, ids_, masks_, instr_zdict=zdc.get("instr_zdict"),
                front_txt_feats=zdc.get("front_txt_feats"),
                deterministic=True, method=type(model).language)
            kv = (model.apply(p_, emb, method=type(model).text_cross_kv)
                  if hoist else None)
            return emb, kv

        embs, kvs = [], []
        b = self.lanes
        for q0 in range(0, q, b):
            sl = slice(q0, min(q0 + b, q))
            n = sl.stop - sl.start
            pad = b - n
            ids_c = np.concatenate([ids[sl], np.ones((pad, L), np.int32)]) \
                if pad else ids[sl]
            m_c = np.concatenate([masks[sl], np.zeros((pad, L), bool)]) \
                if pad else masks[sl]
            e, kv = lang(params, jnp.asarray(ids_c), jnp.asarray(m_c), zd)
            embs.append(e[:n])
            kvs.append(jax.tree_util.tree_map(lambda x: x[:n], kv))
        txt_kv = (jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *kvs)
            if hoist else None)
        return {
            "scan": jnp.asarray(scan), "start": jnp.asarray(start),
            "heading": jnp.asarray(heading), "gt_path": jnp.asarray(gt_path),
            "gt_len": jnp.asarray(gt_len),
            "txt_embeds": jnp.concatenate(embs, axis=0),
            "txt_masks": jnp.asarray(masks),
        }, txt_kv

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

    def _run_chunk(self, params, tables, banks, carry, txt_kv_bank, zd):
        """One compiled chunk of ``self.chunk`` scan steps.

        A chunk entered with a fully-drained queue is the IDENTITY via
        ``lax.cond`` — the host pipelines chunks one ahead (the done check
        for chunk i overlaps chunk i+1's execution), and the one speculative
        chunk dispatched past the drain costs ~nothing."""
        ro = self.ro
        q = banks["scan"].shape[0]
        done_in = carry["state"].ended.all() & (carry["ptr"] >= q)

        def body(c):
            prev_t = ro.t
            ro.t = tables
            try:
                def step(cc, _):
                    return self._step(params, banks, txt_kv_bank, zd, cc), None

                c, _ = jax.lax.scan(step, c, None, length=self.chunk)
            finally:
                ro.t = prev_t
            return c

        carry = jax.lax.cond(done_in, lambda c: c, body, carry)
        all_done = carry["state"].ended.all() & (carry["ptr"] >= q)
        return carry, all_done

    def _step(self, params, banks, txt_kv_bank, zd, c):
        ro = self.ro
        env = self.env
        b = self.lanes
        q = banks["scan"].shape[0]
        t_budget = env.max_action_len
        state: EpisodeBatch = c["state"]
        bufs = dict(c["bufs"])

        # ---- refill ended lanes from the queue (top of step) ------------
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
        ep_idx = new_idx
        lane_t = jnp.where(refill, 0, c["lane_t"])
        ptr = c["ptr"] + refill.sum(dtype=jnp.int32)
        txt_e = jnp.where(refill[:, None, None],
                          banks["txt_embeds"][new_idx], c["txt_e"])
        txt_m = jnp.where(refill[:, None], banks["txt_masks"][new_idx],
                          c["txt_m"])
        txt_kv = c["txt_kv"]
        if txt_kv is not None:
            txt_kv = jax.tree_util.tree_map(
                lambda bank, cur: jnp.where(_bcast(refill, cur),
                                            bank[new_idx], cur),
                txt_kv_bank, txt_kv)

        # ---- the eval step (Rollout.run's step_fn eval slice, with the
        # per-lane clock lane_t standing in for the global scan index) -----
        rng, k_drop, k_act = jax.random.split(c["rng"], 3)
        bi = jnp.arange(b)
        live0 = ~state.ended
        trash = ro.t.node_mask.shape[1]
        state = state.replace(step_ids=state.step_ids.at[
            bi, jnp.where(live0, state.cur, trash)].set(
            jnp.where(live0, lane_t + 1, state.step_ids[bi, trash])))
        pano = ro.assemble_pano(state)
        gmap_base = ro.assemble_gmap_base(state)
        vp_base = ro.assemble_vp_base(state, pano, gmap_base)
        state, gmap, outs = ro._model_step(
            ro.model, params, "student", state, txt_e, txt_m, k_drop,
            True, zd, 1, (pano, gmap_base, vp_base), txt_kv=txt_kv)
        logits = outs[self.policy_key]
        a = ro.select_action(logits, "argmax", k_act, None, gmap, state)
        stop_prob = jax.nn.softmax(logits, axis=-1)[:, 0]
        state, chosen, just_ended = ro.transition(
            state, gmap, a, stop_prob, lane_t, "argmax", pano=pano,
            local_actions=self.local_acts)

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
            "state": state, "ep_idx": ep_idx, "ptr": ptr,
            "lane_t": lane_t + live0.astype(jnp.int32),
            "txt_e": txt_e, "txt_m": txt_m, "txt_kv": txt_kv,
            "bufs": bufs,
            "sem": c["sem"] + live0.sum(dtype=jnp.int32),
            "rng": rng,
        }

    # ------------------------------------------------------------------
    # driver
    # ------------------------------------------------------------------

    def run(self, params, tables: Tables, items, max_instr_len: int,
            zdicts=None):
        """Decode every episode in ``items`` through the refilled lanes.

        Returns a dict of per-episode numpy outputs: ``actions`` [Q, T]
        (chosen target per step, -1 once stopped), ``stop_node`` [Q],
        ``final_cur`` [Q], ``overflow`` [Q] bool, plus ``semantic_steps``,
        ``scan_steps`` (pipeline iterations run) and ``chunks``.

        The host loop runs one chunk AHEAD of the done check: the blocking
        read of chunk i's done flag overlaps chunk i+1's device execution,
        so the device never idles on the host round trip (the speculative
        chunk past the drain is an identity cond — _run_chunk docstring).
        """
        q_real = len(items)
        items = list(items)
        if q_real == 0:
            raise ValueError("empty item list")
        while len(items) < self.lanes:   # queue must fill the lanes once
            items.append(items[len(items) % q_real])
        banks, txt_kv_bank = self.build_banks(
            params, items, max_instr_len, zdicts=zdicts)
        zd = self._zd_for(zdicts, self.lanes)
        carry = self._init_fn(tables, banks, txt_kv_bank)
        q = len(items)
        # hard bound: every episode ends within max_action_len of its start,
        # and at least one lane is live in every pre-done chunk
        max_chunks = 2 + (q * self.env.max_action_len) // max(
            self.chunk, 1)
        carry, done_prev = self._chunk_fn(params, tables, banks, carry,
                                          txt_kv_bank, zd)
        chunks = 1
        for _ in range(max_chunks):
            # enqueue the next chunk BEFORE syncing on the previous flag
            carry, done_i = self._chunk_fn(params, tables, banks, carry,
                                           txt_kv_bank, zd)
            if bool(done_prev):
                break
            chunks += 1
            done_prev = done_i
        else:
            raise RuntimeError("streaming eval failed to drain the queue "
                               f"in {max_chunks} chunks (bug)")
        bufs = jax.tree_util.tree_map(np.asarray, carry["bufs"])
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
