"""Reference-rollout EPISODE oracle.

The reference ships its full agent decision logic — only the model files were
stripped (readme.md:75).  This module reimplements that shipped logic
verbatim, host-side, over the torch oracle model (tests/torch_oracle.py):

- GraphMap / FloydGraph per SURVEY §2.6 (the omitted models/graph_utils.py,
  whose semantics are fixed by the public DUET lineage and the call sites in
  map_nav_src/r2r/agent.py): incremental observed-subgraph all-pairs
  distances via pivot relaxation on arrival, dict-insertion node order,
  visited set, per-node averaged embeddings with teacher/student views.
- ``_nav_gmap_variable`` / ``_nav_vp_variable_mem`` token assembly
  (agent.py:175-328): [stop],[mem],visited...,frontier... gmap tokens with
  the [MEM] mask, observed-graph pair distances, 7-d/14-d pos features.
- ``_panorama_feature_variable_do`` (agent.py:111-174): candidate views
  first, then the unused views, reference ragged layout.
- ``_teacher_action`` (agent.py:330-374): imitation gt-next-hop and the
  spl expert (full-graph distances, first-strict-min tie-breaking).
- action selection / stop rules / ``make_equiv_action`` path append /
  stop-score backtrack (agent.py:1028-1110, 1080-1095).
- MKTD sample weights (agent.py:1013-1021 + utils/kd_loss.py:56-67) and the
  action-ability logit KD with the reference loss totals (agent.py:546-719,
  1112-1145), in torch.

Driving this oracle and the JAX ``Rollout.run`` (observed_graph_parity mode)
on the same synthetic world with the same weights converts "decode matches
our own golden files" into "decode matches the reference's decision logic" —
the BASELINE north-star minus only the released checkpoints
(tests/test_episode_oracle.py).
"""

from __future__ import annotations

import math

import numpy as np
import torch

from vln_magic_tpu.env.geometry import (ALL_VIEW_ANGLES, MAX_DIST, MAX_STEP,
                                        angle_feature, rel_pos_features)

INF = float("inf")
IGNORE_ID = -100


# ----------------------------------------------------------------------
# FloydGraph / GraphMap (SURVEY §2.6 — the omitted models/graph_utils.py)
# ----------------------------------------------------------------------

class FloydGraph:
    """Incremental all-pairs shortest paths over the OBSERVED subgraph:
    edges enter via ``add_edge`` as the agent sees candidates; arriving at a
    node runs one Floyd pivot relaxation through it (``update``) — exactly
    the information state of a robot building its map online."""

    def __init__(self):
        self._dist: dict[str, dict[str, float]] = {}
        self._point: dict[str, dict[str, str]] = {}
        self._visited: set[str] = set()

    def distance(self, u: str, v: str) -> float:
        if u == v:
            return 0.0
        return self._dist.get(u, {}).get(v, INF)

    def _set(self, u, v, d, point=""):
        self._dist.setdefault(u, {})[v] = d
        self._point.setdefault(u, {})[v] = point

    def add_edge(self, u: str, v: str, d: float):
        if d < self.distance(u, v):
            self._set(u, v, d)
            self._set(v, u, d)

    def update(self, k: str):
        nodes = set(self._dist) | {k}
        for u in nodes:
            if u == k:
                continue
            for v in nodes:
                if v == k or v == u:
                    continue
                alt = self.distance(u, k) + self.distance(k, v)
                if alt < self.distance(u, v):
                    self._set(u, v, alt, point=k)
                    self._set(v, u, alt, point=k)
        self._visited.add(k)

    def visited(self, k: str) -> bool:
        return k in self._visited

    def path(self, u: str, v: str) -> list[str]:
        """Hops from u to v EXCLUDING u, INCLUDING v (the convention the
        reference's traj append relies on, agent.py:377-386)."""
        if u == v:
            return []
        k = self._point.get(u, {}).get(v, "")
        if k == "":
            return [v]
        return self.path(u, k) + self.path(k, v)

    def hops(self, u: str, v: str) -> int:
        if u == v:
            return 0
        if self.distance(u, v) == INF:
            return -1
        return len(self.path(u, v))


class OracleGraphMap:
    """GraphMap per the agent.py call sites (SURVEY §2.6): node positions in
    first-observation (dict-insertion) order, step ids, stop scores, per-node
    averaged embeddings with separate teacher/student views."""

    def __init__(self, start_vp: str):
        self.start_vp = start_vp
        self.graph = FloydGraph()
        self.node_positions: dict[str, np.ndarray] = {}
        self.node_step_ids: dict[str, int] = {}
        self.node_stop_scores: dict[str, dict] = {}
        self._embeds: dict[tuple, tuple] = {}   # (vp, teacher) -> (sum, cnt)

    def update_graph(self, ob: dict):
        vp = ob["viewpoint"]
        self.node_positions.setdefault(vp, np.asarray(ob["position"],
                                                      np.float32))
        for cc in ob["candidate"]:
            self.node_positions.setdefault(
                cc["viewpointId"], np.asarray(cc["position"], np.float32))
            self.graph.add_edge(vp, cc["viewpointId"], float(cc["distance"]))
        self.graph.update(vp)

    def update_node_embed(self, vp, embed, rewrite=False, teacher=False):
        key = (vp, teacher)
        e = embed.detach()
        if rewrite or key not in self._embeds:
            self._embeds[key] = (e.clone(), 1)
        else:
            s, c = self._embeds[key]
            self._embeds[key] = (s + e, c + 1)

    def get_node_embed(self, vp, teacher=False):
        s, c = self._embeds[(vp, teacher)]
        return s / c

    def get_pos_fts(self, cur_vp, vpids, cur_heading, cur_elevation,
                    angle_feat_size=4):
        """7-d pos features over the OBSERVED graph (env.get_gmap_pos_fts
        formula, env.py:213-235, with GraphMap's own distances)."""
        out = np.zeros((len(vpids), 4 * (angle_feat_size // 4) + 3),
                       np.float32)
        for i, vp in enumerate(vpids):
            if vp is None:
                out[i, :4] = angle_feature(0.0, 0.0, angle_feat_size)
                continue
            h, e, line = rel_pos_features(
                self.node_positions[cur_vp], self.node_positions[vp],
                base_heading=cur_heading, base_elevation=cur_elevation)
            ang = angle_feature(float(h), float(e), angle_feat_size)
            gd = self.graph.distance(cur_vp, vp)
            gs = self.graph.hops(cur_vp, vp)
            out[i] = np.concatenate([
                ang, np.asarray([float(line) / MAX_DIST,
                                 (0.0 if gd == INF else gd) / MAX_DIST,
                                 max(gs, 0) / MAX_STEP], np.float32)])
        return out


# ----------------------------------------------------------------------
# obs construction from the repo's World tables (the reference obs schema,
# env.py:336-376 — what MatterSim + make_candidate would report)
# ----------------------------------------------------------------------

def make_ob(world, item, v: int, heading: float, elevation: float,
            angle_feat_size=4) -> dict:
    si = item["scan_idx"]
    t = world.tables
    g = world.graphs[si]
    feats36 = np.asarray(t.features[si, v], np.float32)
    # agent 36-view features: visual || angle rel to current orientation
    view_ang = angle_feature(ALL_VIEW_ANGLES[:, 0] - heading,
                             ALL_VIEW_ANGLES[:, 1] - elevation,
                             angle_feat_size)
    agent_feature = np.concatenate([feats36, view_ang], -1)
    candidate = []
    for j in range(t.cand_ids.shape[2]):
        if not t.cand_mask[si, v, j]:
            continue
        ci = int(t.cand_ids[si, v, j])
        point = int(t.cand_view[si, v, j])
        ch = float(t.cand_heading[si, v, j])
        ce = float(t.cand_elevation[si, v, j])
        ang = angle_feature(ch - heading, ce - elevation, angle_feat_size)
        candidate.append({
            "viewpointId": g.node_ids[ci],
            "pointId": point,
            "distance": float(t.cand_dist[si, v, j]),
            "position": tuple(np.asarray(t.positions[si, ci], np.float32)),
            "feature": np.concatenate([feats36[point], ang], -1),
        })
    return {
        "instr_id": item["instr_id"],
        "scan": g.scan,
        "viewpoint": g.node_ids[v],
        "position": tuple(np.asarray(t.positions[si, v], np.float32)),
        "heading": heading,
        "elevation": elevation,
        "feature": agent_feature,
        "candidate": candidate,
        "instr_encoding": np.asarray(item["instr_encoding"], np.int64),
        "gt_path": [g.node_ids[i] for i in item["path_idx"]],
    }


# ----------------------------------------------------------------------
# torch KD loss functions (reference utils/kd_loss.py:6-67, verbatim
# semantics)
# ----------------------------------------------------------------------

def ref_mse_loss(s, t, t_sample_weights=None, loss_type="sum", **_):
    per = (s - t) ** 2
    if t_sample_weights is not None:
        w = t_sample_weights.view(-1, *([1] * (per.dim() - 1)))
        per = per * w
    return per.sum() if loss_type == "sum" else per.mean()


def ref_kd_loss(s_logits, t_logits, temperature=1.0, t_sample_weights=None,
                loss_type="sum", **_):
    s = torch.clamp(s_logits, min=-1e6)
    t = torch.clamp(t_logits, min=-1e6)
    p_t = torch.softmax(t / temperature, dim=1)
    log_p_s = torch.log_softmax(s / temperature, dim=1)
    scale = temperature ** 2
    if t_sample_weights is None:
        red = "sum" if loss_type == "sum" else "mean"
        return torch.nn.KLDivLoss(reduction=red)(log_p_s, p_t) * scale
    kd = torch.nn.functional.kl_div(log_p_s, p_t, reduction="none").sum(1)
    w = t_sample_weights.view(-1, *([1] * (kd.dim() - 1)))
    out = (kd * w).sum() if loss_type == "sum" else (kd * w).mean()
    return out * scale


def ref_cal_dtw(dist, index, prediction, reference, threshold=3.0):
    """nDTW of a node-id path against the gt path over full-graph distances
    (reference r2r/eval_utils.py:6-26 cal_dtw, the ndtw-expert's score)."""
    m = np.full((len(prediction) + 1, len(reference) + 1), np.inf)
    m[0][0] = 0.0
    for i in range(1, len(prediction) + 1):
        for j in range(1, len(reference) + 1):
            best = min(m[i - 1][j], m[i][j - 1], m[i - 1][j - 1])
            cost = float(dist[index[prediction[i - 1]],
                              index[reference[j - 1]]])
            m[i][j] = cost + best
    dtw = m[len(prediction)][len(reference)]
    return math.exp(-dtw / (threshold * len(reference)))


def ref_exponential_decay(losses, decay_rate=0.7):
    return torch.exp(-decay_rate * losses)


def ref_invert_normalized(losses):
    lo, hi = losses.min(), losses.max()
    norm = (losses - lo) / (hi - lo)
    return 1 - norm


# ----------------------------------------------------------------------
# the reference rollout itself (agent.py:722-1160), greedy + teacher-forced
# ----------------------------------------------------------------------

class ReferenceRollout:
    """Host-side reimplementation of GMapNavAgent.rollout over the torch
    oracle model(s).  Single process, deterministic (eval mode, no dropout),
    argmax or teacher feedback."""

    def __init__(self, cfg, world, model, teacher_model=None, distill=None,
                 max_action_len=8, expert_policy="spl", zdicts=None):
        self.cfg = cfg                  # flax ModelConfig (student)
        self.world = world
        self.model = model.eval()       # TorchDualScaleVLNBert
        self.teacher = teacher_model.eval() if teacher_model else None
        self.distill = distill          # DistillConfig or None
        self.max_action_len = max_action_len
        self.expert_policy = expert_policy
        # per-role intervention dictionaries {"student": {...}, "teacher":
        # {...}} in the SAME structure Rollout.run(zdicts=...) takes —
        # constants broadcast over the batch (agent.py:43-90 front feats,
        # :63-90 instr zdict repeat, :162-164 img zdict repeat)
        self.zdicts = zdicts or {}
        # --fusion action-score selection (parser.py:16): 'local' switches
        # the action space to viewpoint-candidate slots
        self.fusion = getattr(cfg, "fusion", "dynamic")

    def _role_zd(self, role, b):
        """One role's zdicts -> torch tensors broadcast over the batch."""
        z = self.zdicts.get(role) or {}
        out = {}
        for k, v in z.items():
            if v is None:
                continue
            if isinstance(v, dict):
                out[k] = {
                    k2: torch.from_numpy(np.asarray(v2, np.float32))
                    .unsqueeze(0).expand(b, *np.asarray(v2).shape).clone()
                    for k2, v2 in v.items()}
            else:
                tv = torch.from_numpy(np.asarray(v, np.float32))
                out[k] = tv.unsqueeze(0).expand(b, *tv.shape).clone()
        return out

    # ----- token assembly (agent.py:175-328) -----

    def _pano_inputs(self, obs, ended):
        feat = self.cfg.image_feat_size
        per = []
        for ob in obs:
            view_img, view_ang, nav_types, cand_vpids = [], [], [], []
            used = set()
            for cc in ob["candidate"]:
                view_img.append(cc["feature"][:feat])
                view_ang.append(cc["feature"][feat:])
                nav_types.append(1)
                cand_vpids.append(cc["viewpointId"])
                used.add(cc["pointId"])
            for k in range(36):
                if k in used:
                    continue
                view_img.append(ob["feature"][k, :feat])
                view_ang.append(ob["feature"][k, feat:])
                nav_types.append(0)
            per.append((np.stack(view_img), np.stack(view_ang),
                        nav_types, cand_vpids))
        vl = [len(p[2]) for p in per]
        p_max = max(vl)
        b = len(obs)
        img = np.zeros((b, p_max, feat), np.float32)
        ang = np.zeros((b, p_max, per[0][1].shape[-1]), np.float32)
        types = np.zeros((b, p_max), np.int64)
        masks = np.zeros((b, p_max), bool)
        for i, (vi, va, nt, _) in enumerate(per):
            img[i, : len(nt)] = vi
            ang[i, : len(nt)] = va
            types[i, : len(nt)] = nt
            masks[i, : len(nt)] = True
        box = np.ones((b, p_max, 3), np.float32)
        loc = np.concatenate([ang, box], -1)
        return {
            "view_img_fts": torch.from_numpy(img),
            "loc_fts": torch.from_numpy(loc),
            "nav_types": torch.from_numpy(types),
            "pano_masks": torch.from_numpy(masks),
            "view_lens": np.asarray(vl),
            "cand_vpids": [p[3] for p in per],
        }

    def _nav_gmap_variable(self, obs, gmaps, last_embeds, teacher=False):
        b = len(obs)
        all_vpids, all_visited, all_lens = [], [], []
        all_embeds, all_steps, all_pos, all_pair = [], [], [], []
        no_vp_left = []
        for i, gmap in enumerate(gmaps):
            visited_vpids, unvisited_vpids = [], []
            for k in gmap.node_positions:
                (visited_vpids if gmap.graph.visited(k)
                 else unvisited_vpids).append(k)
            no_vp_left.append(len(unvisited_vpids) == 0)
            vpids = [None, None] + visited_vpids + unvisited_vpids
            vis = [0, 1] + [1] * len(visited_vpids) + [0] * len(unvisited_vpids)
            steps = [gmap.node_step_ids.get(vp, 0) for vp in vpids]
            embeds = [gmap.get_node_embed(vp, teacher) for vp in vpids[2:]]
            zero = torch.zeros_like(embeds[0])
            mem = zero if last_embeds is None else last_embeds[i]
            embeds = torch.stack([zero, mem] + embeds, 0)
            pos = gmap.get_pos_fts(obs[i]["viewpoint"], vpids,
                                   obs[i]["heading"], obs[i]["elevation"],
                                   self.cfg.angle_feat_size)
            pair = np.zeros((len(vpids), len(vpids)), np.float32)
            for a in range(2, len(vpids)):
                for c in range(a + 1, len(vpids)):
                    d = gmap.graph.distance(vpids[a], vpids[c])
                    pair[a, c] = pair[c, a] = 0.0 if d == INF else d
            all_vpids.append(vpids)
            all_visited.append(vis)
            all_lens.append(len(vpids))
            all_embeds.append(embeds)
            all_steps.append(steps)
            all_pos.append(pos)
            all_pair.append(pair)
        g_max = max(all_lens)
        d = all_embeds[0].shape[-1]
        img_embeds = torch.zeros((b, g_max, d))
        step_ids = torch.zeros((b, g_max), dtype=torch.long)
        pos_fts = torch.zeros((b, g_max, all_pos[0].shape[-1]))
        visited = torch.zeros((b, g_max), dtype=torch.bool)
        masks = torch.zeros((b, g_max), dtype=torch.bool)
        pair_dists = torch.zeros((b, g_max, g_max))
        for i in range(b):
            L = all_lens[i]
            img_embeds[i, :L] = all_embeds[i]
            step_ids[i, :L] = torch.tensor(all_steps[i])
            pos_fts[i, :L] = torch.from_numpy(all_pos[i])
            visited[i, :L] = torch.tensor(all_visited[i], dtype=torch.bool)
            masks[i, :L] = True
            pair_dists[i, :L, :L] = torch.from_numpy(all_pair[i])
        masks[:, 1] = False   # [MEM] cannot be an action (agent.py:233)
        return {
            "gmap_vpids": all_vpids, "gmap_img_embeds": img_embeds,
            "gmap_step_ids": step_ids, "gmap_pos_fts": pos_fts,
            "gmap_visited_masks": visited, "gmap_pair_dists": pair_dists,
            "gmap_masks": masks, "no_vp_left": no_vp_left,
        }

    def _nav_vp_variable_mem(self, obs, gmaps, pano_embeds, cand_vpids,
                             view_lens, nav_types, last_embeds):
        b = len(obs)
        d = pano_embeds.shape[-1]
        zero = torch.zeros((b, 1, d))
        mem = zero if last_embeds is None else last_embeds.unsqueeze(1)
        vp_img_embeds = torch.cat([zero, mem, pano_embeds], 1)
        pos_list = []
        for i, gmap in enumerate(gmaps):
            cand_pos = gmap.get_pos_fts(obs[i]["viewpoint"], cand_vpids[i],
                                        obs[i]["heading"], obs[i]["elevation"],
                                        self.cfg.angle_feat_size)
            start_pos = gmap.get_pos_fts(obs[i]["viewpoint"], [gmap.start_vp],
                                         obs[i]["heading"],
                                         obs[i]["elevation"],
                                         self.cfg.angle_feat_size)
            vp_pos = np.zeros((vp_img_embeds.shape[1], 14), np.float32)
            vp_pos[:, :7] = start_pos
            vp_pos[2: len(cand_pos) + 2, 7:] = cand_pos
            pos_list.append(vp_pos)
        vp_pos_fts = torch.from_numpy(np.stack(pos_list))
        lens = torch.from_numpy(view_lens + 2)
        ar = torch.arange(vp_img_embeds.shape[1])[None, :]
        vp_masks = ar < lens[:, None]
        vp_nav_masks = torch.cat(
            [torch.ones(b, 1, dtype=torch.bool),
             torch.zeros(b, 1, dtype=torch.bool),
             torch.from_numpy(nav_types) == 1], 1)
        return {
            "vp_img_embeds": vp_img_embeds, "vp_pos_fts": vp_pos_fts,
            "vp_masks": vp_masks, "vp_nav_masks": vp_nav_masks,
            "vp_cand_vpids": [[None, None] + x for x in cand_vpids],
        }

    def _fusion_plumbing(self, nav_inputs, vp_inputs, gmaps, obs):
        """gmap token -> local candidate slot + visited-candidate flags (the
        fused-logit contract of the reconstructed model, models/vlnbert.py —
        derived here from the reference's vpid lists)."""
        b = len(obs)
        g_max = nav_inputs["gmap_masks"].shape[1]
        p2 = vp_inputs["vp_img_embeds"].shape[1]
        slot = torch.full((b, g_max), -1, dtype=torch.long)
        cand_vis = torch.zeros((b, p2))
        for i in range(b):
            cands = vp_inputs["vp_cand_vpids"][i][2:]
            index = {vp: 2 + j for j, vp in enumerate(cands)}
            for k, vp in enumerate(nav_inputs["gmap_vpids"][i]):
                if k >= 2 and vp in index:
                    slot[i, k] = index[vp]
            for j, vp in enumerate(cands):
                if gmaps[i].graph.visited(vp):
                    cand_vis[i, 2 + j] = 1.0
        return slot, cand_vis

    # ----- supervision (agent.py:330-374) -----

    def _teacher_action(self, obs, vpids, ended, visited_masks,
                        imitation_learning, t, traj=None):
        g = self.world
        a = np.zeros(len(obs), np.int64)
        for i, ob in enumerate(obs):
            if ended[i]:
                a[i] = IGNORE_ID
            elif imitation_learning:
                assert ob["viewpoint"] == ob["gt_path"][t]
                if t == len(ob["gt_path"]) - 1:
                    a[i] = 0
                else:
                    goal_vp = ob["gt_path"][t + 1]
                    for j, vpid in enumerate(vpids[i]):
                        if goal_vp == vpid:
                            a[i] = j
                            break
            else:
                if ob["viewpoint"] == ob["gt_path"][-1]:
                    a[i] = 0
                else:
                    si = [gr.scan for gr in g.graphs].index(ob["scan"])
                    gr = g.graphs[si]
                    goal = gr.index[ob["gt_path"][-1]]
                    cur = gr.index[ob["viewpoint"]]
                    min_idx, min_dist = IGNORE_ID, INF
                    for j, vpid in enumerate(vpids[i]):
                        if j > 1 and (visited_masks is None
                                      or not bool(visited_masks[i][j])):
                            if vpid is None:
                                continue
                            vi = gr.index[vpid]
                            if self.expert_policy == "ndtw":
                                # ndtw expert (the RxR regime,
                                # run_rxr_kdl_valid.sh --expert_policy ndtw;
                                # agent.py:356-363): -nDTW of (executed
                                # trajectory + FULL-graph shortest path to
                                # the candidate) vs the gt path
                                flat = [vp for seg in traj[i]["path"]
                                        for vp in seg]
                                ext = gr.path(ob["viewpoint"], vpid)[1:]
                                dist = -ref_cal_dtw(
                                    gr.dist, gr.index, flat + ext,
                                    ob["gt_path"], threshold=3.0)
                            else:
                                # spl expert over the FULL graph (the env's
                                # shortest_distances, agent.py:364-366).
                                # Summed at f32 — every node ON the current
                                # shortest path has the IDENTICAL true cost
                                # d(cur,goal), so which one is the "strict"
                                # min is pure fp noise (upstream too: nx f64
                                # APSP has its own); f32 sums of the f32
                                # tables make the tie resolve to first token
                                # order on both frameworks
                                dist = np.float32(
                                    np.float32(gr.dist[vi, goal])
                                    + np.float32(gr.dist[cur, vi]))
                            if dist < min_dist:
                                min_dist = dist
                                min_idx = j
                    a[i] = min_idx
        return torch.from_numpy(a)

    # ----- the rollout (agent.py:722-1160) -----

    def rollout(self, items, feedback="argmax", train_ml=None):
        cfg = self.cfg
        world = self.world
        b = len(items)
        kdl = self.distill is not None and self.teacher is not None
        mktd = kdl and self.distill.teacher_sample_hard_mining

        # reset (env.py:394-405): agent at gt start with the item heading
        obs = []
        for it in items:
            g = world.graphs[it["scan_idx"]]
            obs.append(make_ob(world, it, int(it["path_idx"][0]),
                               float(it["heading"]), 0.0,
                               cfg.angle_feat_size))
        gmaps = [OracleGraphMap(ob["viewpoint"]) for ob in obs]
        for i, ob in enumerate(obs):
            gmaps[i].update_graph(ob)
        traj = [{"instr_id": ob["instr_id"], "path": [[ob["viewpoint"]]]}
                for ob in obs]

        # per-role intervention dictionaries, broadcast over the batch
        # (agent.py:767-791 z_dicts/t_z_dicts unpack + get_front_variable)
        s_zd = self._role_zd("student", b)
        t_zd = self._role_zd("teacher", b)

        # language (fixed-length encodings -> no padding ambiguity)
        txt_ids = torch.from_numpy(
            np.stack([np.asarray(it["instr_encoding"], np.int64)
                      for it in items]))
        txt_masks = torch.ones_like(txt_ids, dtype=torch.bool)
        with torch.no_grad():
            txt_embeds, txt_attns = self.model.language(
                txt_ids, txt_masks, instr_zdict=s_zd.get("instr_zdict"),
                front_txt_feats=s_zd.get("front_txt_feats"))
            if kdl:
                t_txt_embeds, _ = self.teacher.language(
                    txt_ids, txt_masks, instr_zdict=t_zd.get("instr_zdict"),
                    front_txt_feats=t_zd.get("front_txt_feats"))

        ended = np.zeros(b, bool)
        just_ended = np.zeros(b, bool)
        ml_loss = torch.zeros(())
        t_losses = torch.zeros(())
        predict_loss = torch.zeros(())
        last_embeds = t_last_embeds = None
        actions_taken = []   # [T][B] node index or -1 (the JAX aux["actions"])
        stop_nodes = [None] * b

        for t in range(self.max_action_len):
            for i, gmap in enumerate(gmaps):
                if not ended[i]:
                    gmap.node_step_ids[obs[i]["viewpoint"]] = t + 1

            pano_inputs = self._pano_inputs(obs, ended)
            with torch.no_grad():
                pano_embeds, pano_fused, _ = self.model.panorama(
                    pano_inputs["view_img_fts"], pano_inputs["loc_fts"],
                    pano_inputs["nav_types"].clamp(min=0),
                    pano_inputs["pano_masks"],
                    z_img_feats=s_zd.get("z_img_feats"),
                    z_img_pzs=s_zd.get("z_img_pzs"))
                if kdl:
                    t_pano_embeds, t_pano_fused, _ = self.teacher.panorama(
                        pano_inputs["view_img_fts"], pano_inputs["loc_fts"],
                        pano_inputs["nav_types"].clamp(min=0),
                        pano_inputs["pano_masks"],
                        z_img_feats=t_zd.get("z_img_feats"),
                        z_img_pzs=t_zd.get("z_img_pzs"))

            for i, gmap in enumerate(gmaps):
                if ended[i]:
                    continue
                vp = obs[i]["viewpoint"]
                gmap.update_node_embed(vp, pano_fused[i], rewrite=True)
                if kdl:
                    gmap.update_node_embed(vp, t_pano_fused[i], rewrite=True,
                                           teacher=True)
                for j, cand_vp in enumerate(pano_inputs["cand_vpids"][i]):
                    if not gmap.graph.visited(cand_vp):
                        gmap.update_node_embed(cand_vp, pano_embeds[i, j])
                        if kdl:
                            gmap.update_node_embed(cand_vp,
                                                   t_pano_embeds[i, j],
                                                   teacher=True)

            nav_inputs = self._nav_gmap_variable(obs, gmaps, last_embeds)
            vp_inputs = self._nav_vp_variable_mem(
                obs, gmaps, pano_embeds, pano_inputs["cand_vpids"],
                pano_inputs["view_lens"],
                pano_inputs["nav_types"].numpy(), last_embeds)
            slot, cand_vis = self._fusion_plumbing(nav_inputs, vp_inputs,
                                                   gmaps, obs)
            with torch.no_grad():
                nav_outs = self.model.navigation(
                    txt_embeds, txt_masks, nav_inputs["gmap_img_embeds"],
                    nav_inputs["gmap_step_ids"], nav_inputs["gmap_pos_fts"],
                    nav_inputs["gmap_masks"],
                    nav_inputs["gmap_visited_masks"],
                    nav_inputs["gmap_pair_dists"],
                    vp_inputs["vp_img_embeds"], vp_inputs["vp_pos_fts"],
                    vp_inputs["vp_masks"], vp_inputs["vp_nav_masks"],
                    slot, cand_vis,
                    front_vp_feats=s_zd.get("front_vp_feats"),
                    front_gmap_feats=s_zd.get("front_gmap_feats"))
            last_embeds = nav_outs["cls_embeds"]
            logit_key = {"dynamic": "fused_logits", "avg": "fused_logits",
                         "global": "global_logits",
                         "local": "local_logits"}[self.fusion]
            local_acts = self.fusion == "local"
            nav_logits = nav_outs[logit_key]
            nav_vpids = (vp_inputs["vp_cand_vpids"] if local_acts
                         else nav_inputs["gmap_vpids"])
            nav_probs = torch.softmax(nav_logits, 1)
            if kdl:
                t_nav_inputs = self._nav_gmap_variable(obs, gmaps,
                                                       t_last_embeds,
                                                       teacher=True)
                t_vp_inputs = self._nav_vp_variable_mem(
                    obs, gmaps, t_pano_embeds, pano_inputs["cand_vpids"],
                    pano_inputs["view_lens"],
                    pano_inputs["nav_types"].numpy(), t_last_embeds)
                with torch.no_grad():
                    t_nav_outs = self.teacher.navigation(
                        t_txt_embeds, txt_masks,
                        t_nav_inputs["gmap_img_embeds"],
                        t_nav_inputs["gmap_step_ids"],
                        t_nav_inputs["gmap_pos_fts"],
                        t_nav_inputs["gmap_masks"],
                        t_nav_inputs["gmap_visited_masks"],
                        t_nav_inputs["gmap_pair_dists"],
                        t_vp_inputs["vp_img_embeds"],
                        t_vp_inputs["vp_pos_fts"], t_vp_inputs["vp_masks"],
                        t_vp_inputs["vp_nav_masks"], slot, cand_vis,
                        front_vp_feats=t_zd.get("front_vp_feats"),
                        front_gmap_feats=t_zd.get("front_gmap_feats"))
                t_last_embeds = t_nav_outs["cls_embeds"]
                t_nav_logits = t_nav_outs[logit_key]

            # stop-score record (agent.py:986-996)
            for i, gmap in enumerate(gmaps):
                if not ended[i]:
                    gmap.node_stop_scores[obs[i]["viewpoint"]] = {
                        "stop": nav_probs[i, 0].item()}

            nav_targets = None
            if train_ml is not None:
                # fusion='local' supervises without a visited mask
                # (agent.py:1003: visited_masks only when fusion != local)
                nav_targets = self._teacher_action(
                    obs, nav_vpids, ended,
                    visited_masks=(None if local_acts
                                   else nav_inputs["gmap_visited_masks"]),
                    imitation_learning=(feedback == "teacher"), t=t,
                    traj=traj)
                ce = torch.nn.CrossEntropyLoss(
                    ignore_index=IGNORE_ID, reduction="none")(
                    nav_logits, nav_targets)
                ml_loss = ml_loss + ce.sum()
                if kdl:
                    t_ce = torch.nn.CrossEntropyLoss(
                        ignore_index=IGNORE_ID, reduction="none")(
                        t_nav_logits, nav_targets)
                    t_losses = t_losses + t_ce.sum()
                    t_sample_weights = None
                    if mktd:
                        fn = (ref_exponential_decay
                              if self.distill.sample_preprocess == "exp"
                              else ref_invert_normalized)
                        t_sample_weights = fn(
                            t_ce.detach(),
                            self.distill.sample_exp_decay) \
                            if self.distill.sample_preprocess == "exp" \
                            else fn(t_ce.detach())
                    # action-ability logit KD (agent.py:703-717); the
                    # feat/attn abilities are padding-layout dependent and
                    # pinned at tensor level by test_torch_oracle instead
                    if "action" in self.distill.ability_types \
                            and not self.distill.no_logit:
                        predict_loss = predict_loss + ref_kd_loss(
                            nav_logits, t_nav_logits.detach(),
                            temperature=self.distill.temperature,
                            t_sample_weights=t_sample_weights,
                            loss_type=self.distill.loss_type)

            # action select (agent.py:1028-1054)
            if feedback == "teacher":
                a_t = nav_targets
            elif feedback == "argmax":
                _, a_t = nav_logits.max(1)
            else:
                raise ValueError(feedback)

            if feedback == "teacher":
                a_t_stop = [ob["viewpoint"] == ob["gt_path"][-1]
                            for ob in obs]
            else:
                a_t_stop = (a_t == 0).numpy()

            cpu_a_t = []
            for i in range(b):
                if a_t_stop[i] or ended[i] or nav_inputs["no_vp_left"][i] \
                        or (t == self.max_action_len - 1):
                    cpu_a_t.append(None)
                    just_ended[i] = True
                else:
                    cpu_a_t.append(nav_vpids[i][a_t[i]])

            # make_equiv_action (agent.py:375-404)
            step_actions = []
            for i, ob in enumerate(obs):
                action = cpu_a_t[i]
                if action is not None and not ended[i]:
                    gr = self.world.graphs[items[i]["scan_idx"]]
                    seg = gmaps[i].graph.path(ob["viewpoint"], action)
                    traj[i]["path"].append(seg)
                    prev_vp = (traj[i]["path"][-2][-1] if len(seg) == 1
                               else seg[-2])
                    # candidate view from the previous node (agent.py:387-393)
                    si = items[i]["scan_idx"]
                    pv = gr.index[prev_vp]
                    av = gr.index[action]
                    trow = self.world.tables
                    viewidx = None
                    for j in range(trow.cand_ids.shape[2]):
                        if trow.cand_mask[si, pv, j] and \
                                int(trow.cand_ids[si, pv, j]) == av:
                            viewidx = int(trow.cand_view[si, pv, j])
                            break
                    heading = (viewidx % 12) * math.radians(30)
                    elevation = (viewidx // 12 - 1) * math.radians(30)
                    step_actions.append((gr.index[action], heading,
                                         elevation))
                    actions_taken.append(gr.index[action])
                else:
                    step_actions.append(None)
                    actions_taken.append(-1)

            # stop-score backtrack on just-ended episodes (agent.py:1080-1095)
            for i in range(b):
                if (not ended[i]) and just_ended[i]:
                    stop_node, stop_score = None, -INF
                    for k, v in gmaps[i].node_stop_scores.items():
                        if v["stop"] > stop_score:
                            stop_score = v["stop"]
                            stop_node = k
                    stop_nodes[i] = stop_node
                    if stop_node is not None and \
                            obs[i]["viewpoint"] != stop_node:
                        traj[i]["path"].append(
                            gmaps[i].graph.path(obs[i]["viewpoint"],
                                                stop_node))

            # new observation + graph update
            for i in range(b):
                if step_actions[i] is not None and not ended[i]:
                    v, heading, elevation = step_actions[i]
                    obs[i] = make_ob(world, items[i], v, heading, elevation,
                                     cfg.angle_feat_size)
                    gmaps[i].update_graph(obs[i])
            ended[:] = np.logical_or(ended,
                                     np.array([x is None for x in cpu_a_t]))
            if ended.all():
                break

        # reshape actions to [T, B]
        T = len(actions_taken) // b
        actions = np.asarray(actions_taken, np.int32).reshape(T, b)
        out = {
            "trajectories": [tr["path"] for tr in traj],
            "stop_nodes": stop_nodes,
            "final_nodes": [ob["viewpoint"] for ob in obs],
            "actions": actions,
        }
        if train_ml is not None:
            out["ml_loss_sum"] = float(ml_loss)
            if kdl:
                out["t_ml_loss_sum"] = float(t_losses)
                out["predict_loss"] = float(predict_loss)
        return out
