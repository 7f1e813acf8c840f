"""Pretraining model: the omitted ``GlocalTextPathCMTPreTraining``
reconstructed (reference: imported at pretrain_src/train_r2r_magic.py:40,
absent from the release; forward contract from the per-task validators,
train_r2r_magic.py:440-587, and SURVEY §2.10).

One trunk (the DualScaleVLNBert navigator as submodule ``bert`` — matching
the checkpoint remap prefix ``bert.lang_encoder`` etc.,
train_r2r_magic.py:193-206) + task heads:

  mlm — masked language modeling over the instruction, decoder tied to the
        word embedding (15%/80-10-10 masking happens in the data layer)
  mrc — masked region classification: predict CLIP class distributions of
        masked views, KL against soft targets
  sap — single-step action prediction on a partial path: global / local /
        fused logits from the navigation head
  cfp — contrastive feature pooling: InfoNCE between pooled {gmap, vp,
        fused} and txt embeddings; the pooled embeddings double as the
        frontdoor dictionary features (SURVEY §2.7)

The whole path trunk is one batched forward: per-step panoramas are folded
into the batch axis ([B, S, P, D] -> [B*S, P, D]) so the MXU sees one large
matmul stream instead of a Python loop over steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from ..models.vlnbert import DualScaleVLNBert
from ..models.layers import NEG_INF


class MLMHead(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, word_embedding):
        c = self.cfg
        x = nn.Dense(c.hidden_size, dtype=self.dtype, name="transform")(hidden)
        x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="norm")(x)
        logits = x @ word_embedding.T.astype(self.dtype)
        bias = self.param("bias", nn.initializers.zeros, (c.vocab_size,))
        return logits + bias


class GlocalTextPathCMTPretrain(nn.Module):
    cfg: ModelConfig
    image_prob_size: int = 1000
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.bert = DualScaleVLNBert(c, self.dtype)
        self.mlm_head = MLMHead(c, self.dtype)
        self.mrc_head = nn.Dense(self.image_prob_size, dtype=self.dtype)
        self.og_obj_proj = nn.Dense(c.hidden_size, dtype=self.dtype)
        self.og_loc_proj = nn.Dense(c.hidden_size, dtype=self.dtype)
        self.og_state_proj = nn.Dense(c.hidden_size, dtype=self.dtype)
        self.cfp_txt_pool = nn.Dense(c.hidden_size, dtype=self.dtype)
        self.cfp_gmap_pool = nn.Dense(c.hidden_size, dtype=self.dtype)
        self.cfp_vp_pool = nn.Dense(c.hidden_size, dtype=self.dtype)
        self.cfp_fused_pool = nn.Dense(c.hidden_size, dtype=self.dtype)

    # ----- trunk -----

    def encode_text(self, batch, deterministic=True):
        return self.bert.language(batch["txt_ids"], batch["txt_masks"],
                                  deterministic=deterministic)

    def encode_panoramas(self, batch, deterministic=True):
        """[B, S, P, ...] per-step panoramas through the pano encoder in one
        folded batch; returns per-step token embeds + fused embeds."""
        v = batch["traj_view_fts"]
        b, s, p, d = v.shape
        fold = lambda x: x.reshape((b * s,) + x.shape[2:])
        pano_embeds, pano_fused, _ = self.bert.panorama(
            fold(v), fold(batch["traj_loc_fts"]), fold(batch["traj_nav_types"]),
            fold(batch["traj_pano_masks"]), deterministic=deterministic)
        return (pano_embeds.reshape(b, s, p, -1),
                pano_fused.reshape(b, s, -1))

    def build_gmap_embeds(self, batch, pano_embeds, pano_fused):
        """Per-token image embeddings for the gmap sequence: visited nodes
        take their step's fused panorama; frontier nodes take the candidate
        view embedding where they were first seen.

        ``gmap_src_step``/``gmap_src_slot``: [B, G] indices (-1 slot =>
        fused embedding of that step)."""
        b, g = batch["gmap_src_step"].shape
        step = jnp.maximum(batch["gmap_src_step"], 0)
        slot = batch["gmap_src_slot"]
        bi = jnp.arange(b)[:, None]
        from_view = pano_embeds[bi, step, jnp.maximum(slot, 0)]
        from_fused = pano_fused[bi, step]
        emb = jnp.where((slot >= 0)[..., None], from_view, from_fused)
        emb = emb * (batch["gmap_src_step"] >= 0)[..., None]
        return emb

    def encode_path(self, batch, deterministic=True):
        txt_embeds, txt_attns = self.encode_text(batch, deterministic)
        pano_embeds, pano_fused = self.encode_panoramas(batch, deterministic)
        gmap_img_embeds = self.build_gmap_embeds(batch, pano_embeds, pano_fused)

        final = batch["final_step"]                     # [B]
        bi = jnp.arange(final.shape[0])
        last_pano = pano_embeds[bi, final]              # [B, P, D]
        d = last_pano.shape[-1]
        b = final.shape[0]
        vp_img_embeds = jnp.concatenate(
            [jnp.zeros((b, 2, d), self.dtype), last_pano], axis=1)

        outs = self.bert.navigation(
            txt_embeds, batch["txt_masks"], gmap_img_embeds,
            batch["gmap_step_ids"], batch["gmap_pos_fts"], batch["gmap_masks"],
            batch["gmap_visited_masks"], batch["gmap_pair_dists"],
            vp_img_embeds, batch["vp_pos_fts"], batch["vp_masks"],
            batch["vp_nav_masks"], batch["gmap_local_slot"],
            batch["vp_cand_visited"], deterministic=deterministic)
        outs["txt_embeds"] = txt_embeds
        outs["pano_embeds"] = pano_embeds
        outs["pano_fused_embeds"] = pano_fused
        return outs

    # ----- task forwards (the reference's model(batch, task=...) modes) -----

    def mlm(self, batch, deterministic=True):
        txt_embeds, _ = self.encode_text(batch, deterministic)
        emb = self.bert.lang_encoder.word_embeddings.embedding
        return self.mlm_head(txt_embeds, emb)

    def mrc(self, batch, deterministic=True):
        """Predict class distributions of masked views at the final step."""
        outs = self.encode_path(batch, deterministic)
        final = batch["final_step"]
        bi = jnp.arange(final.shape[0])
        last_pano = outs["pano_embeds"][bi, final]
        return self.mrc_head(last_pano)                 # [B, P, prob_size]

    def sap(self, batch, deterministic=True):
        outs = self.encode_path(batch, deterministic)
        return {k: outs[k] for k in
                ("global_logits", "local_logits", "fused_logits")}

    def og(self, batch, deterministic=True):
        """REVERIE object grounding (OGDataset, pretrain_src/data/
        tasks.py:455): score candidate objects at the final viewpoint against
        the fused cross-modal state.  Reduced head — MAGIC's R2R/RxR configs
        carry no object features (obj_feat_size 0, model config:48) so this
        exists for capability parity with the REVERIE pathway."""
        outs = self.encode_path(batch, deterministic)
        obj = self.og_obj_proj(batch["obj_fts"])           # [B, O, D]
        if "obj_loc_fts" in batch:
            # angle + box features of each object (dataset.py:483-493)
            obj = obj + self.og_loc_proj(batch["obj_loc_fts"])
        state = self.og_state_proj(
            outs["vp_embeds"][:, 0] + outs["txt_embeds"][:, 0])
        logits = jnp.einsum("bod,bd->bo", obj, state)
        return jnp.where(batch["obj_masks"], logits, -1e9)

    def cfp(self, batch, deterministic=True):
        """L2-normalized pooled embeddings for the InfoNCE objective and the
        frontdoor dictionaries (validator contract train_r2r_magic.py:537-560)."""
        outs = self.encode_path(batch, deterministic)
        txt = self.cfp_txt_pool(outs["txt_embeds"][:, 0])
        gmap = self.cfp_gmap_pool(outs["gmap_embeds"][:, 0])
        vp = self.cfp_vp_pool(outs["vp_embeds"][:, 0])
        fused = self.cfp_fused_pool(
            jnp.concatenate([outs["gmap_embeds"][:, 0],
                             outs["vp_embeds"][:, 0]], -1))
        norm = lambda x: x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
        return {"txt": norm(txt), "gmap": norm(gmap), "vp": norm(vp),
                "fused": norm(fused)}

    def bert_kd_project(self, name, x):
        return self.bert.kd_project(name, x)

    def __call__(self, batch, deterministic=True):
        """Init path: touch every head."""
        mlm_logits = self.mlm(batch, deterministic)
        mrc_logits = self.mrc(batch, deterministic)
        sap_logits = self.sap(batch, deterministic)
        cfp_embeds = self.cfp(batch, deterministic)
        if "obj_fts" in batch:
            self.og(batch, deterministic)
        if self.cfg.kd_heads:
            txt_embeds, _ = self.encode_text(batch, deterministic)
            for head in ("txt_emb_w", "vp_txt_w", "gmap_txt_w",
                         "local_cross_w", "global_cross_w", "kdl_img_w",
                         "kdl_avg_img_w"):
                self.bert.kd_project(head, txt_embeds[:, 0])
            self.bert.kd_ability_weights()
        return {"mlm": mlm_logits, "mrc": mrc_logits, "sap": sap_logits,
                "cfp": cfp_embeds}


# ----- losses (pure functions over head outputs) -----

def mlm_loss(logits, labels, ignore_id=-100):
    valid = labels != ignore_id
    tgt = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0] * valid
    return ce.sum() / jnp.maximum(valid.sum(), 1), valid


def mrc_loss(pred_logits, soft_targets, mask):
    """KL(soft_targets || pred) over masked view positions
    (MrcDataset soft CLIP-prob targets, pretrain_src/data/tasks.py:189)."""
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    p = soft_targets
    kl = (p * (jnp.log(jnp.clip(p, 1e-12, None)) - logp)).sum(-1)
    kl = kl * mask
    return kl.sum() / jnp.maximum(mask.sum(), 1)


def sap_loss(logits, labels, ignore_id=-100):
    valid = labels != ignore_id
    tgt = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, tgt[:, None], -1)[:, 0] * valid
    return ce.sum() / jnp.maximum(valid.sum(), 1)


def cfp_loss(embeds, temperature=1.0):
    """Bidirectional InfoNCE between txt and each of {gmap, vp, fused}
    (CfpDataset contract, pretrain_src/data/tasks.py:562)."""
    txt = embeds["txt"]
    total = 0.0
    n = txt.shape[0]
    labels = jnp.arange(n)
    for key in ("gmap", "vp", "fused"):
        sim = txt @ embeds[key].T / temperature
        lp1 = jax.nn.log_softmax(sim, axis=-1)
        lp2 = jax.nn.log_softmax(sim.T, axis=-1)
        total = total - (jnp.take_along_axis(lp1, labels[:, None], 1).mean()
                         + jnp.take_along_axis(lp2, labels[:, None], 1).mean()) / 2
    return total / 3.0
