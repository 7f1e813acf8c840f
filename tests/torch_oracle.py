"""PyTorch oracle of ``DualScaleVLNBert`` for cross-framework parity tests.

The reference ships its navigator as a *torch* model whose source file was
stripped from the release (reference: map_nav_src/r2r/agent.py:30).  This
module is an independent torch implementation of the SAME architecture the
flax reconstruction targets (mode contract agent.py:796,885,964-983; head
names agent_base.py:330).  The parity test initializes one side randomly,
moves the weights across through the repo's ``.pt`` interop, and asserts that
both frameworks produce the same logits — which pins every silent divergence
risk at once: Linear kernel transposition, LayerNorm eps, the RoBERTa
position offset, attention masking constants, adaptive pano fusion, dynamic
global/local fusion, the fused-logit assembly, and the KD projection heads.

Module attribute names are chosen so that the torch module tree dot-joins to
exactly the flax param paths; ``torch_state_to_flax_flat`` /
``load_flax_flat_into_torch`` do the layout conversion (torch ``Linear``
stores [out, in], flax ``Dense`` stores [in, out]).
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

NEG_INF = -1e9


def gelu(x):
    return F.gelu(x, approximate="none")


class MultiHeadAttention(nn.Module):
    def __init__(self, hidden_size, num_heads, dtype=torch.float32):
        super().__init__()
        self.h = num_heads
        self.hd = hidden_size // num_heads
        self.query = nn.Linear(hidden_size, hidden_size)
        self.key = nn.Linear(hidden_size, hidden_size)
        self.value = nn.Linear(hidden_size, hidden_size)
        self.out = nn.Linear(hidden_size, hidden_size)

    def forward(self, q_input, kv_input, bias=None):
        b, lq, d = q_input.shape
        lk = kv_input.shape[1]
        q = self.query(q_input).view(b, lq, self.h, self.hd)
        k = self.key(kv_input).view(b, lk, self.h, self.hd)
        v = self.value(kv_input).view(b, lk, self.h, self.hd)
        scores = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.hd)
        if bias is not None:
            scores = scores + bias
        probs = torch.softmax(scores.float(), dim=-1).to(scores.dtype)
        ctx = torch.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, lq, d)
        return self.out(ctx), probs.mean(dim=1)


def mask_to_bias(mask):
    """[B, Lk] bool -> additive [B, 1, 1, Lk] (models/layers.py:23)."""
    return torch.where(mask, 0.0, NEG_INF)[:, None, None, :].float()


class AddNorm(nn.Module):
    def __init__(self, hidden_size, eps):
        super().__init__()
        self.LayerNorm_0 = nn.LayerNorm(hidden_size, eps=eps)

    def forward(self, residual, x):
        return self.LayerNorm_0(residual + x)


class FeedForward(nn.Module):
    def __init__(self, hidden_size, intermediate_size):
        super().__init__()
        self.intermediate = nn.Linear(hidden_size, intermediate_size)
        self.output = nn.Linear(intermediate_size, hidden_size)

    def forward(self, x):
        return self.output(gelu(self.intermediate(x)))


class TransformerLayer(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d, h, eps = cfg.hidden_size, cfg.num_attention_heads, cfg.layer_norm_eps
        self.attention = MultiHeadAttention(d, h)
        self.attention_norm = AddNorm(d, eps)
        self.ffn = FeedForward(d, cfg.intermediate_size)
        self.ffn_norm = AddNorm(d, eps)

    def forward(self, x, mask=None, bias=None):
        attn_bias = None
        if mask is not None:
            attn_bias = mask_to_bias(mask)
        if bias is not None:
            attn_bias = bias if attn_bias is None else attn_bias + bias
        attn_out, probs = self.attention(x, x, attn_bias)
        x = self.attention_norm(x, attn_out)
        x = self.ffn_norm(x, self.ffn(x))
        return x, probs


class CrossModalLayer(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d, h, eps = cfg.hidden_size, cfg.num_attention_heads, cfg.layer_norm_eps
        self.lang2visn = cfg.use_lang2visn_attn
        self.crossattention = MultiHeadAttention(d, h)
        self.crossattention_norm = AddNorm(d, eps)
        if self.lang2visn:
            self.lang2visn_attention = MultiHeadAttention(d, h)
            self.lang2visn_norm = AddNorm(d, eps)
        self.self_attention = MultiHeadAttention(d, h)
        self.self_norm = AddNorm(d, eps)
        self.ffn = FeedForward(d, cfg.intermediate_size)
        self.ffn_norm = AddNorm(d, eps)

    def forward(self, visn, lang, visn_mask, lang_mask, self_bias=None):
        lang_bias = mask_to_bias(lang_mask)
        visn_bias = mask_to_bias(visn_mask)
        x_out, x_probs = self.crossattention(visn, lang, lang_bias)
        visn = self.crossattention_norm(visn, x_out)
        if self.lang2visn:
            l_out, _ = self.lang2visn_attention(lang, visn, visn_bias)
            lang = self.lang2visn_norm(lang, l_out)
        self_attn_bias = visn_bias
        if self_bias is not None:
            self_attn_bias = self_attn_bias + self_bias
        s_out, _ = self.self_attention(visn, visn, self_attn_bias)
        visn = self.self_norm(visn, s_out)
        visn = self.ffn_norm(visn, self.ffn(visn))
        return visn, lang, x_probs


class LanguageEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        d = cfg.hidden_size
        self.word_embeddings = nn.Embedding(cfg.vocab_size, d)
        self.position_embeddings = nn.Embedding(cfg.max_position_embeddings, d)
        self.token_type_embeddings = nn.Embedding(max(cfg.type_vocab_size, 1), d)
        self.emb_norm = nn.LayerNorm(d, eps=cfg.layer_norm_eps)
        self._layers = []
        for i in range(cfg.num_l_layers):
            layer = TransformerLayer(cfg)
            setattr(self, f"layer_{i}", layer)
            self._layers.append(layer)

    def forward(self, txt_ids, txt_masks):
        c = self.cfg
        positions = (torch.arange(txt_ids.shape[1])[None, :]
                     + c.pad_token_id + 1)
        x = (self.word_embeddings(txt_ids)
             + self.position_embeddings(positions)
             + self.token_type_embeddings(torch.zeros_like(txt_ids)))
        x = self.emb_norm(x)
        attns = []
        for layer in self._layers:
            x, probs = layer(x, txt_masks)
            attns.append(probs)
        return x, torch.stack(attns, dim=1)


class ZdictAttention(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d = cfg.hidden_size
        self.door = cfg.do_add_method == "door"
        self.z_proj = nn.Linear(d, d)
        self.attention = MultiHeadAttention(d, cfg.num_attention_heads)
        if self.door:
            self.gate = nn.Linear(2 * d, d)
        self.norm = nn.LayerNorm(d, eps=cfg.layer_norm_eps)

    def build_z_proj(self, z_dim, d):
        self.z_proj = nn.Linear(z_dim, d)

    def forward(self, x, z_feats, z_pzs=None):
        z = self.z_proj(z_feats)
        bias = None
        if z_pzs is not None:
            bias = torch.log(torch.clamp(z_pzs[..., 0], min=1e-8))[:, None, None, :]
        out, _ = self.attention(x, z, bias)
        if self.door:
            g = torch.sigmoid(self.gate(torch.cat([x, out], dim=-1)))
            x = x + g * out
        else:
            x = x + out
        return self.norm(x)


class PanoEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        d = cfg.hidden_size
        self.img_proj = nn.Linear(cfg.image_feat_size, d)
        self.img_norm = nn.LayerNorm(d, eps=cfg.layer_norm_eps)
        self.loc_proj = nn.Linear(cfg.loc_feat_size, d)
        self.loc_norm = nn.LayerNorm(d, eps=cfg.layer_norm_eps)
        self.nav_type_embedding = nn.Embedding(3, d)
        self.fuse_norm = nn.LayerNorm(d, eps=cfg.layer_norm_eps)
        if cfg.do_back_img:
            self.img_backdoor = ZdictAttention(cfg)
            self.img_backdoor.build_z_proj(cfg.image_feat_size, d)
        self._layers = []
        for i in range(cfg.num_pano_layers):
            layer = TransformerLayer(cfg)
            setattr(self, f"layer_{i}", layer)
            self._layers.append(layer)
        if cfg.adaptive_pano_fusion:
            self.fusion_score = nn.Linear(d, 1)

    def forward(self, view_img_fts, loc_fts, nav_types, pano_masks,
                z_img_feats=None, z_img_pzs=None):
        c = self.cfg
        img = self.img_norm(self.img_proj(view_img_fts))
        loc = self.loc_norm(self.loc_proj(loc_fts))
        typ = self.nav_type_embedding(nav_types)
        x = self.fuse_norm(img + loc + typ)
        if c.do_back_img and z_img_feats is not None:
            x = self.img_backdoor(x, z_img_feats, z_img_pzs)
        attns = []
        for layer in self._layers:
            x, probs = layer(x, pano_masks)
            attns.append(probs)
        img_attns = torch.stack(attns, dim=1)
        if c.adaptive_pano_fusion:
            score = self.fusion_score(x)[..., 0]
            score = torch.where(pano_masks, score, NEG_INF)
            w = torch.softmax(score.float(), dim=-1).to(x.dtype)
            fused = torch.einsum("bp,bpd->bd", w, x)
        else:
            denom = pano_masks.sum(-1, keepdim=True).clamp(min=1)
            fused = (x * pano_masks[..., None]).sum(1) / denom
        return x, fused, img_attns


class CrossModalEncoder(nn.Module):
    def __init__(self, cfg, sprels=False):
        super().__init__()
        self.cfg = cfg
        self.sprels = sprels
        if sprels:
            self.sprel_linear = nn.Linear(1, cfg.num_attention_heads)
        self._layers = []
        for i in range(cfg.num_x_layers):
            layer = CrossModalLayer(cfg)
            setattr(self, f"layer_{i}", layer)
            self._layers.append(layer)

    def forward(self, visn, lang, visn_mask, lang_mask, pair_dists=None):
        self_bias = None
        if self.sprels and pair_dists is not None:
            rel = self.sprel_linear(1.0 / (1.0 + pair_dists[..., None]))
            self_bias = rel.permute(0, 3, 1, 2)
        attns = []
        for layer in self._layers:
            visn, lang, probs = layer(visn, lang, visn_mask, lang_mask, self_bias)
            attns.append(probs)
        return visn, torch.stack(attns, dim=1)


class ClsPrediction(nn.Module):
    """Mirrors models/vlnbert.py:214 — NOTE the flax module keeps the input
    width through the whole head (`sap_fuse_linear` is ClsPrediction(2d))."""

    def __init__(self, hidden_size, eps):
        super().__init__()
        self.dense = nn.Linear(hidden_size, hidden_size)
        self.norm = nn.LayerNorm(hidden_size, eps=eps)
        self.score = nn.Linear(hidden_size, 1)

    def forward(self, x):
        return self.score(self.norm(gelu(self.dense(x))))[..., 0]


class TorchDualScaleVLNBert(nn.Module):
    """Mirrors models/vlnbert.py:229 mode-for-mode."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        c = cfg
        d = c.hidden_size
        self.lang_encoder = LanguageEncoder(c)
        self.pano_encoder = PanoEncoder(c)
        self.local_encoder = CrossModalEncoder(c, sprels=False)
        self.global_encoder = CrossModalEncoder(c, sprels=c.graph_sprels)
        self.gmap_step_embedding = nn.Embedding(c.max_action_steps, d)
        self.gmap_pos_proj = nn.Linear(c.gmap_pos_size, d)
        self.gmap_input_norm = nn.LayerNorm(d, eps=c.layer_norm_eps)
        self.vp_pos_proj = nn.Linear(c.vp_pos_size, d)
        self.vp_input_norm = nn.LayerNorm(d, eps=c.layer_norm_eps)
        self.global_sap_head = ClsPrediction(d, c.layer_norm_eps)
        self.local_sap_head = ClsPrediction(d, c.layer_norm_eps)
        if c.glocal_fuse:
            # flax only materializes params of modules actually called;
            # with the fixed 0.5 gate the fuse head never exists
            self.sap_fuse_linear = ClsPrediction(2 * d, c.layer_norm_eps)
        self.cls_fuse = nn.Linear(2 * d, d)
        front_dim = c.kd_target_size if c.kd_heads else d
        if c.do_back_txt:
            self.txt_backdoor_direction = ZdictAttention(c)
            self.txt_backdoor_landmark = ZdictAttention(c)
        if c.do_front_txt:
            self.txt_frontdoor = ZdictAttention(c)
            self.txt_frontdoor.build_z_proj(front_dim, d)
        if c.do_front_img:
            self.vp_frontdoor = ZdictAttention(c)
            self.vp_frontdoor.build_z_proj(front_dim, d)
        if c.do_front_his:
            self.gmap_frontdoor = ZdictAttention(c)
            self.gmap_frontdoor.build_z_proj(front_dim, d)
        if c.kd_heads:
            for name in ("txt_emb_w", "vp_txt_w", "gmap_txt_w",
                         "local_cross_w", "global_cross_w", "kdl_img_w",
                         "kdl_avg_img_w"):
                setattr(self, name, nn.Linear(d, c.kd_target_size))
            for name in ("txt", "img", "local", "global", "predict"):
                setattr(self, f"kdl_{name}_weight",
                        nn.Parameter(torch.tensor(0.5413)))

    # ----- modes -----

    def language(self, txt_ids, txt_masks, instr_zdict=None,
                 front_txt_feats=None):
        c = self.cfg
        x, attns = self.lang_encoder(txt_ids, txt_masks)
        if c.do_back_txt and instr_zdict is not None:
            x = self.txt_backdoor_direction(
                x, instr_zdict["direction_features"],
                instr_zdict.get("direction_pzs"))
            x = self.txt_backdoor_landmark(
                x, instr_zdict["landmark_features"],
                instr_zdict.get("landmark_pzs"))
        if c.do_front_txt and front_txt_feats is not None:
            x = self.txt_frontdoor(x, front_txt_feats, None)
        return x, attns

    def panorama(self, *args, **kw):
        return self.pano_encoder(*args, **kw)

    def navigation(self, txt_embeds, txt_masks, gmap_img_embeds, gmap_step_ids,
                   gmap_pos_fts, gmap_masks, gmap_visited_masks,
                   gmap_pair_dists, vp_img_embeds, vp_pos_fts, vp_masks,
                   vp_nav_masks, gmap_local_slot, vp_cand_visited,
                   front_vp_feats=None, front_gmap_feats=None):
        c = self.cfg
        gmap_embeds = self.gmap_input_norm(
            gmap_img_embeds + self.gmap_step_embedding(gmap_step_ids)
            + self.gmap_pos_proj(gmap_pos_fts))
        if c.do_front_his and front_gmap_feats is not None:
            gmap_embeds = self.gmap_frontdoor(gmap_embeds, front_gmap_feats)
        gmap_embeds, gmap_attns = self.global_encoder(
            gmap_embeds, txt_embeds, gmap_masks, txt_masks, gmap_pair_dists)

        vp_embeds = self.vp_input_norm(vp_img_embeds + self.vp_pos_proj(vp_pos_fts))
        if c.do_front_img and front_vp_feats is not None:
            vp_embeds = self.vp_frontdoor(vp_embeds, front_vp_feats)
        vp_embeds, vp_attns = self.local_encoder(
            vp_embeds, txt_embeds, vp_masks, txt_masks, None)

        if c.glocal_fuse:
            fuse = torch.sigmoid(self.sap_fuse_linear(
                torch.cat([gmap_embeds[:, 0], vp_embeds[:, 0]], -1)))[:, None]
        else:
            fuse = torch.full((gmap_embeds.shape[0], 1), 0.5)

        global_logits = self.global_sap_head(gmap_embeds) * fuse
        local_logits = self.local_sap_head(vp_embeds) * (1.0 - fuse)
        global_logits = torch.where(gmap_masks & ~gmap_visited_masks,
                                    global_logits, NEG_INF)
        local_logits = torch.where(vp_nav_masks, local_logits, NEG_INF)

        safe_local = torch.where(vp_nav_masks, local_logits, 0.0)
        bw_logits = (safe_local * vp_cand_visited).sum(-1)

        has_slot = gmap_local_slot >= 0
        slot = gmap_local_slot.clamp(min=0).long()
        local_for_gmap = torch.gather(safe_local, 1, slot)
        g_idx = torch.arange(global_logits.shape[1])[None, :]
        frontier = gmap_masks & ~gmap_visited_masks & (g_idx > 0)
        add = torch.where(has_slot & frontier, local_for_gmap,
                          torch.where(frontier, bw_logits[:, None],
                                      torch.zeros(())))
        add = add.clone()
        add[:, 0] = add[:, 0] + safe_local[:, 0]
        fused_logits = torch.where(global_logits > NEG_INF / 2,
                                   global_logits + add,
                                   torch.full_like(global_logits, NEG_INF))
        cls_embeds = self.cls_fuse(
            torch.cat([gmap_embeds[:, 0], vp_embeds[:, 0]], -1))
        return {
            "gmap_embeds": gmap_embeds, "vp_embeds": vp_embeds,
            "gmap_attns": gmap_attns, "vp_attns": vp_attns,
            "global_logits": global_logits, "local_logits": local_logits,
            "fused_logits": fused_logits, "fuse_weights": fuse[:, 0],
            "cls_embeds": cls_embeds,
        }

    def kd_ability_weights(self):
        return torch.stack([
            F.softplus(getattr(self, f"kdl_{n}_weight"))
            for n in ("txt", "img", "local", "global", "predict")])

    def full_forward(self, batch):
        """Mirror of the flax ``__call__`` (models/vlnbert.py:427)."""
        txt_embeds, txt_attns = self.language(
            batch["txt_ids"], batch["txt_masks"], batch.get("instr_zdict"),
            batch.get("front_txt_feats"))
        pano_embeds, pano_fused, img_attns = self.pano_encoder(
            batch["view_img_fts"], batch["loc_fts"], batch["nav_types"],
            batch["pano_masks"], batch.get("z_img_feats"),
            batch.get("z_img_pzs"))
        outs = self.navigation(
            txt_embeds, batch["txt_masks"], batch["gmap_img_embeds"],
            batch["gmap_step_ids"], batch["gmap_pos_fts"],
            batch["gmap_masks"], batch["gmap_visited_masks"],
            batch["gmap_pair_dists"], batch["vp_img_embeds"],
            batch["vp_pos_fts"], batch["vp_masks"], batch["vp_nav_masks"],
            batch["gmap_local_slot"], batch["vp_cand_visited"],
            batch.get("front_vp_feats"), batch.get("front_gmap_feats"))
        outs.update({"txt_embeds": txt_embeds, "txt_attns": txt_attns,
                     "pano_embeds": pano_embeds,
                     "pano_fused_embeds": pano_fused,
                     "img_attns": img_attns})
        return outs


# ----- state conversion: torch module tree <-> flax flat dot-paths -----

def torch_state_to_flax_flat(model: nn.Module) -> dict[str, np.ndarray]:
    """Walk the torch module tree and emit {flax_path: array} with flax
    layouts (Dense kernel [in, out]; LayerNorm scale; Embed embedding)."""
    flat = {}
    handled = set()
    for mod_name, mod in model.named_modules():
        prefix = f"params.{mod_name}" if mod_name else "params"
        if isinstance(mod, nn.Linear):
            flat[f"{prefix}.kernel"] = mod.weight.detach().numpy().T.copy()
            handled.add(f"{mod_name}.weight" if mod_name else "weight")
            if mod.bias is not None:
                flat[f"{prefix}.bias"] = mod.bias.detach().numpy().copy()
                handled.add(f"{mod_name}.bias" if mod_name else "bias")
        elif isinstance(mod, nn.LayerNorm):
            flat[f"{prefix}.scale"] = mod.weight.detach().numpy().copy()
            flat[f"{prefix}.bias"] = mod.bias.detach().numpy().copy()
            handled.add(f"{mod_name}.weight")
            handled.add(f"{mod_name}.bias")
        elif isinstance(mod, nn.Embedding):
            flat[f"{prefix}.embedding"] = mod.weight.detach().numpy().copy()
            handled.add(f"{mod_name}.weight")
    for pname, p in model.named_parameters():
        if pname not in handled:     # bare scalar params (kdl_*_weight)
            flat[f"params.{pname}"] = p.detach().numpy().copy()
    return flat


def load_flax_flat_into_torch(model: nn.Module, flat: dict) -> list[str]:
    """Inverse of ``torch_state_to_flax_flat``: load {flax_path: array} into
    the torch mirror.  Returns flax paths that found no torch home."""
    wanted = torch_state_to_flax_flat(model)
    unmatched = [k for k in flat if k not in wanted]
    with torch.no_grad():
        for mod_name, mod in model.named_modules():
            prefix = f"params.{mod_name}" if mod_name else "params"
            if isinstance(mod, nn.Linear) and f"{prefix}.kernel" in flat:
                mod.weight.copy_(torch.from_numpy(
                    np.ascontiguousarray(np.asarray(flat[f"{prefix}.kernel"]).T)))
                if mod.bias is not None and f"{prefix}.bias" in flat:
                    mod.bias.copy_(torch.from_numpy(
                        np.asarray(flat[f"{prefix}.bias"])))
            elif isinstance(mod, nn.LayerNorm) and f"{prefix}.scale" in flat:
                mod.weight.copy_(torch.from_numpy(np.asarray(flat[f"{prefix}.scale"])))
                mod.bias.copy_(torch.from_numpy(np.asarray(flat[f"{prefix}.bias"])))
            elif isinstance(mod, nn.Embedding) and f"{prefix}.embedding" in flat:
                mod.weight.copy_(torch.from_numpy(
                    np.asarray(flat[f"{prefix}.embedding"])))
        for pname, p in model.named_parameters():
            key = f"params.{pname}"
            if p.dim() == 0 and key in flat:
                p.copy_(torch.from_numpy(np.asarray(flat[key])))
    return unmatched
