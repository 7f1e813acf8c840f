"""MAKD per-step loss assembly (meta-ability knowledge distillation).

Mirrors the reference's ``compute_kd_losses`` (reference:
map_nav_src/r2r/agent.py:546-719): five meta-abilities
{txt, img, local, global, action}, each with feature losses (student
embeddings projected to teacher width), attention-map losses (per-layer,
head-averaged, aligned on the first min(depth) layers), and a logit loss
(KD or DKD) on the fused action scores; all weighted by MKRW ability weights
and MKTD per-sample weights.

Roles:
  't2s' — distill teacher into student: student tensors projected via the
          student's KD heads; teacher tensors stop-gradiented.
  's2t' — ICoD reverse loss training the teacher toward the (projected,
          stop-gradiented) student; loss_type forced to 'mean'
          (agent.py:553-558).

Ability weight VECTOR order is (txt, img, local, global, action) — the
reference's key_order (agent.py:856) and kd_ability_types (parser.py:151).
CONSUMPTION reproduces the reference exactly, including its index quirk:
``softmax_weights[2]`` multiplies the GLOBAL losses and ``[3]`` the LOCAL
ones (agent.py:687-692) even though the grad vector was built in
local-before-global order — i.i.d. RW draws make this exchangeable, but
'grad' mode feels it, so we mirror it.  Likewise the img /2 halving applies
only in learned-weight / no-adaptive modes (agent.py:620-627: the RW/grad
branch multiplies the raw loss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import DistillConfig
from . import losses as L

ABILITIES = ("txt", "img", "local", "global", "action")


def zero_kd_losses():
    return {k: jnp.zeros(()) for k in (
        "txt_emb_loss", "txt_attn_loss", "img_emb_loss", "avg_img_emb_loss",
        "img_attn_loss", "local_emb_loss", "local_attn_loss",
        "global_emb_loss", "global_attn_loss", "predict_loss")}


def _feat_fn(cfg: DistillConfig):
    return L.mse_loss if cfg.feat_loss == "mse" else L.kd_loss


def _attn_fn(cfg: DistillConfig):
    return L.mse_loss if cfg.attn_loss == "mse" else L.kd_loss


def makd_step_losses(cfg: DistillConfig, t_step, s_outs, t_outs, project,
                     nav_targets, ability_weights, sample_weights,
                     learned_weights=None, role="t2s", ignore_id=-100):
    """One step's KD loss contributions.

    ``project(name, x)``: applies the projection head ``name`` of the model
    whose hidden size is smaller (the student in both roles — in 's2t' the
    projected side is the stop-gradiented target, agent.py:571,605,647,665).
    ``ability_weights``: [5] MKRW/grad weights or None;
    ``learned_weights``: [5] softplus ability weights (learned_weight mode);
    ``sample_weights``: [B] MKTD weights or None.
    """
    sg = jax.lax.stop_gradient
    loss_type = "mean" if role == "s2t" else cfg.loss_type
    temp = cfg.temperature
    out = zero_kd_losses()

    def w(learned_i, rw_i=None):
        """``learned_i`` indexes the per-name softplus stack (txt, img,
        local, global, predict); ``rw_i`` the RW/grad softmax vector with
        the reference's global<->local index quirk (module docstring)."""
        if learned_weights is not None:
            return learned_weights[learned_i]
        if ability_weights is not None:
            return ability_weights[rw_i if rw_i is not None else learned_i]
        return 1.0

    # img /2: reference halves only in learned/no-adaptive modes
    # (agent.py:620-627); the RW/grad branch multiplies the raw loss
    img_div = 1.0 if (learned_weights is None
                      and ability_weights is not None) else 2.0

    def pair(name, s_x, t_x):
        """(student-side tensor, target tensor) for feature losses."""
        if role == "t2s":
            return project(name, s_x), sg(t_x)
        return s_x, sg(project(name, t_x))

    feat = _feat_fn(cfg)
    attn = _attn_fn(cfg)

    def attn_pair(s_a, t_a):
        layers = min(s_a.shape[1], t_a.shape[1])
        return s_a[:, :layers], sg(t_a[:, :layers])

    # 1. txt — only contributes at t == 0 (agent.py:562)
    if "txt" in cfg.ability_types:
        gate = (t_step == 0).astype(jnp.float32)
        if not cfg.no_feat:
            s_e, t_e = pair("txt_emb_w", s_outs["txt_embeds"], t_outs["txt_embeds"])
            out["txt_emb_loss"] = gate * w(0) * feat(
                s_e, t_e, temperature=temp, t_sample_weights=sample_weights,
                loss_type=loss_type)
        if not cfg.no_attn:
            s_a, t_a = attn_pair(s_outs["txt_attns"], t_outs["txt_attns"])
            out["txt_attn_loss"] = gate * w(0) * attn(
                s_a, t_a, temperature=temp, t_sample_weights=sample_weights,
                loss_type=loss_type)

    # 2. img — pano embeddings, fused embedding (each /2), attention maps
    if "img" in cfg.ability_types:
        if not cfg.no_feat:
            s_e, t_e = pair("kdl_img_w", s_outs["pano_embeds"],
                            t_outs["pano_embeds"])
            out["img_emb_loss"] = w(1) * feat(
                s_e, t_e, temperature=temp, t_sample_weights=sample_weights,
                loss_type=loss_type) / img_div
            s_f, t_f = pair("kdl_avg_img_w", s_outs["pano_fused_embeds"],
                            t_outs["pano_fused_embeds"])
            out["avg_img_emb_loss"] = w(1) * feat(
                s_f, t_f, temperature=temp, t_sample_weights=sample_weights,
                loss_type=loss_type) / img_div
        if not cfg.no_attn:
            s_a, t_a = attn_pair(s_outs["img_attns"], t_outs["img_attns"])
            out["img_attn_loss"] = w(1) * attn(
                s_a, t_a, temperature=temp, t_sample_weights=sample_weights,
                loss_type=loss_type)

    # 3. local / global cross-modal embeddings + attention maps.
    # RW/grad index quirk mirrored from the reference (agent.py:687-692):
    # weights[2] multiplies GLOBAL, weights[3] LOCAL; learned-weight mode
    # stays per-name (kdl_local_weight = stack index 2).
    if "local" in cfg.ability_types:
        if not cfg.no_feat:
            s_e, t_e = pair("local_cross_w", s_outs["vp_embeds"],
                            t_outs["vp_embeds"])
            out["local_emb_loss"] = w(2, 3) * feat(
                s_e, t_e, t_sample_weights=sample_weights, loss_type=loss_type)
        if not cfg.no_attn:
            s_a, t_a = attn_pair(s_outs["vp_attns"], t_outs["vp_attns"])
            out["local_attn_loss"] = w(2, 3) * attn(
                s_a, t_a, t_sample_weights=sample_weights, loss_type=loss_type)
    if "global" in cfg.ability_types:
        if not cfg.no_feat:
            s_e, t_e = pair("global_cross_w", s_outs["gmap_embeds"],
                            t_outs["gmap_embeds"])
            out["global_emb_loss"] = w(3, 2) * feat(
                s_e, t_e, t_sample_weights=sample_weights, loss_type=loss_type)
        if not cfg.no_attn:
            s_a, t_a = attn_pair(s_outs["gmap_attns"], t_outs["gmap_attns"])
            out["global_attn_loss"] = w(3, 2) * attn(
                s_a, t_a, t_sample_weights=sample_weights, loss_type=loss_type)

    # 4. action — logit KD / DKD on the fused navigation scores
    if "action" in cfg.ability_types and not cfg.no_logit \
            and nav_targets is not None:
        s_l = s_outs["fused_logits"]
        t_l = sg(t_outs["fused_logits"])
        if cfg.logit_loss == "dkd":
            tgt = jnp.where(nav_targets == ignore_id, 0, nav_targets)
            out["predict_loss"] = w(4) * L.dkd_loss(
                s_l, t_l, tgt, temperature=temp, alpha=cfg.dkd_alpha,
                beta=cfg.dkd_beta, t_sample_weights=sample_weights,
                loss_type=loss_type)
        else:
            out["predict_loss"] = w(4) * L.kd_loss(
                s_l, t_l, temperature=temp, t_sample_weights=sample_weights,
                loss_type=loss_type)
    return out


def add_losses(acc, new):
    return {k: acc[k] + new[k] for k in acc}


def total_kd_loss(kd: dict):
    return sum(kd.values())
