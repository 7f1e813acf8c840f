"""DualScaleVLNBert — TPU-native reconstruction of the omitted reference
navigator model.

The reference imports ``VLNBert``/``Critic`` from a file that was stripped
from the release (reference: map_nav_src/r2r/agent.py:30; readme.md:75).  The
architecture here is reconstructed from its call sites (agent.py:796, 885,
964-983), checkpoint keys (agent_base.py:326-332), the model config
(pretrain_src/config/r2r_magic_model_config.json) and the public DUET/GOAT
lineage it extends: a RoBERTa-style language encoder, a 2-layer panorama
encoder with adaptive fusion, and a dual-scale (local viewpoint + global
topological map) cross-modal encoder with graph-distance attention bias and
dynamic global/local action fusion, plus MAGIC's [MEM] recurrence token and
knowledge-distillation projection heads.

Everything is a pure function of padded, masked arrays — one jitted call per
mode, no Python control flow on data.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from .layers import (
    AddNorm,
    CrossModalLayer,
    MultiHeadAttention,
    TransformerLayer,
    NEG_INF,
    mask_to_bias,
)


class LanguageEncoder(nn.Module):
    """RoBERTa-style embeddings + ``num_l_layers`` transformer layers.

    Position ids use the RoBERTa offset (pad_token_id + 1 = 2) so pretrained
    RoBERTa weights (max_position_embeddings 514, model config:15) load
    unchanged.  Returns (txt_embeds, per-layer head-averaged attention maps
    [B, n_layers, L, L]) — the layer axis is what MAKD's txt attention loss
    slices when student and teacher depth differ (agent.py:560,579).
    """

    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # setup-style (not compact) so the word embedding is reachable for
        # MLM decoder weight tying (pretrain/model.py)
        c = self.cfg
        self.word_embeddings = nn.Embed(c.vocab_size, c.hidden_size,
                                        dtype=self.dtype)
        self.position_embeddings = nn.Embed(c.max_position_embeddings,
                                            c.hidden_size, dtype=self.dtype)
        self.token_type_embeddings = nn.Embed(max(c.type_vocab_size, 1),
                                              c.hidden_size, dtype=self.dtype)
        self.emb_norm = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype)
        self.emb_dropout = nn.Dropout(c.hidden_dropout)
        self.layers = [
            TransformerLayer(
                c.hidden_size, c.num_attention_heads, c.intermediate_size,
                c.hidden_dropout, c.attention_dropout, c.layer_norm_eps,
                dtype=self.dtype, use_pallas=c.use_pallas_attention,
                gelu_approx=c.gelu_approximate,
                softmax_in_dtype=c.softmax_compute_dtype_attn,
                logits_f32=c.attn_logits_f32,
                name=f"layer_{i}")
            for i in range(c.num_l_layers)
        ]

    def __call__(self, txt_ids, txt_masks, deterministic=True):
        c = self.cfg
        if txt_ids.shape[1] + c.pad_token_id + 1 > c.max_position_embeddings:
            raise ValueError(
                f"instruction length {txt_ids.shape[1]} overflows the "
                f"position table ({c.max_position_embeddings}); raise "
                "max_position_embeddings or lower max_instr_len")
        positions = jnp.arange(txt_ids.shape[1])[None, :] + c.pad_token_id + 1
        x = (self.word_embeddings(txt_ids)
             + self.position_embeddings(positions)
             + self.token_type_embeddings(jnp.zeros_like(txt_ids)))
        x = self.emb_norm(x)
        x = self.emb_dropout(x, deterministic=deterministic)
        attns = []
        for layer in self.layers:
            x, probs = layer(x, txt_masks, deterministic=deterministic)
            attns.append(probs)
        return x, jnp.stack(attns, axis=1)


class ZdictAttention(nn.Module):
    """Causal-intervention attention over a dictionary of confounder features
    (GOAT lineage: backdoor z-dicts / frontdoor CFP exemplars).

    ``type_2`` backdoor (parser.py:137 default) attends queries over the
    dictionary; priors p(z) reweight the attention distribution.  The output
    is combined with the stream via ``do_add_method``: ``add`` = residual
    add + LN, ``door`` = learned sigmoid gate (parser.py:139 default).
    """

    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, z_feats, z_pzs=None, deterministic=True):
        c = self.cfg
        z = nn.Dense(c.hidden_size, dtype=self.dtype, name="z_proj")(z_feats)
        bias = None
        if z_pzs is not None:
            # log-prior reweighting of attention scores
            bias = jnp.log(jnp.clip(z_pzs[..., 0], 1e-8, None))[:, None, None, :]
        out, _ = MultiHeadAttention(
            c.hidden_size, c.num_attention_heads, c.attention_dropout,
            self.dtype, name="attention",
        )(x, z, bias, deterministic)
        if c.do_add_method == "door":
            gate = nn.sigmoid(
                nn.Dense(c.hidden_size, dtype=self.dtype, name="gate")(
                    jnp.concatenate([x, out], axis=-1))
            )
            x = x + gate * out
        else:
            x = x + out
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                            name="norm")(x)


class PanoEncoder(nn.Module):
    """Panorama encoder: project CLIP view features + 7-d location features +
    nav-type embedding, run ``num_pano_layers`` of self-attention, and produce
    an adaptively fused pooled embedding (adaptive_pano_fusion, config:57).

    Matches mode 'panorama' outputs (agent.py:885): pano_embeds, pano_masks,
    pano_fused_embeds, img_attns.
    """

    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, view_img_fts, loc_fts, nav_types, pano_masks,
                 z_img_feats=None, z_img_pzs=None, deterministic=True):
        c = self.cfg
        img = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="img_norm")(
            nn.Dense(c.hidden_size, dtype=self.dtype, name="img_proj")(view_img_fts))
        loc = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="loc_norm")(
            nn.Dense(c.hidden_size, dtype=self.dtype, name="loc_proj")(loc_fts))
        typ_mod = nn.Embed(3, c.hidden_size, dtype=self.dtype,
                           name="nav_type_embedding")
        # one-hot matmul instead of the embedding gather (in-scan gathers
        # scalarize; bit-identical — see the step-id embedding note below)
        typ = jax.nn.one_hot(nav_types, 3, dtype=self.dtype) \
            @ typ_mod.embedding.astype(self.dtype)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="fuse_norm")(
            img + loc + typ)
        x = nn.Dropout(c.hidden_dropout)(x, deterministic=deterministic)

        if c.do_back_img and z_img_feats is not None:
            x = ZdictAttention(c, self.dtype, name="img_backdoor")(
                x, z_img_feats, z_img_pzs, deterministic)

        attns = []
        for i in range(c.num_pano_layers):
            x, probs = TransformerLayer(
                c.hidden_size, c.num_attention_heads, c.intermediate_size,
                c.hidden_dropout, c.attention_dropout, c.layer_norm_eps,
                dtype=self.dtype, use_pallas=c.use_pallas_attention,
                gelu_approx=c.gelu_approximate,
                softmax_in_dtype=c.softmax_compute_dtype_attn,
                logits_f32=c.attn_logits_f32,
                name=f"layer_{i}",
            )(x, pano_masks, deterministic=deterministic)
            attns.append(probs)
        img_attns = jnp.stack(attns, axis=1)

        if c.adaptive_pano_fusion:
            score = nn.Dense(1, dtype=self.dtype, name="fusion_score")(x)[..., 0]
            score = jnp.where(pano_masks, score, NEG_INF)
            w = nn.softmax(score.astype(jnp.float32), axis=-1).astype(self.dtype)
            fused = jnp.einsum("bp,bpd->bd", w, x)
        else:
            denom = jnp.maximum(pano_masks.sum(-1, keepdims=True), 1)
            fused = (x * pano_masks[..., None]).sum(1) / denom
        return x, fused, img_attns


class CrossModalEncoder(nn.Module):
    """``num_x_layers`` dual-stream cross-modal layers over one visual stream
    (the local viewpoint tokens or the global map tokens) and the language
    stream.  ``sprels`` enables the pairwise graph-distance attention bias on
    the visual self-attention (graph_sprels, model config:28)."""

    cfg: ModelConfig
    sprels: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, visn, lang, visn_mask, lang_mask, pair_dists=None,
                 deterministic=True, self_bias=None, cross_kvs=None):
        # ``cross_kvs``: per-layer precomputed (k, v) for the vis->lang cross
        # attention, or None entries for layers that must project in place
        # (hoisted loop-invariant instruction K/V — layer 0 always; every
        # layer when lang2visn is off and the lang stream never updates)
        c = self.cfg
        if self.sprels and pair_dists is not None:
            # distance -> per-head additive bias, matching DUET's sprel linear
            rel = nn.Dense(c.num_attention_heads, dtype=self.dtype,
                           name="sprel_linear")(
                1.0 / (1.0 + pair_dists[..., None]))
            self_bias = rel.transpose(0, 3, 1, 2)  # [B, H, L, L]
        # else: a caller-precomputed self_bias (the branch-fused navigation
        # path, which evaluates sprel_linear outside this module) passes through
        attns = []
        for i in range(c.num_x_layers):
            visn, lang, probs = CrossModalLayer(
                c.hidden_size, c.num_attention_heads, c.intermediate_size,
                c.hidden_dropout, c.attention_dropout, c.layer_norm_eps,
                lang2visn=c.use_lang2visn_attn, dtype=self.dtype,
                use_pallas=c.use_pallas_attention,
                gelu_approx=c.gelu_approximate,
                softmax_in_dtype=c.softmax_compute_dtype_attn,
                logits_f32=c.attn_logits_f32,
                name=f"layer_{i}",
            )(visn, lang, visn_mask, lang_mask, self_bias, deterministic,
              cross_kv=cross_kvs[i] if cross_kvs is not None else None)
            attns.append(probs)
        return visn, jnp.stack(attns, axis=1)


class ClsPrediction(nn.Module):
    """Scalar scoring head: Dense -> gelu -> LN -> Dense(1)."""

    hidden_size: int
    eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="dense")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm")(x)
        return nn.Dense(1, dtype=self.dtype, name="score")(x)[..., 0]


class DualScaleVLNBert(nn.Module):
    """The full navigator.  Modes are separate methods (the reference
    dispatches on a mode string, agent.py:796,885,964): ``language``,
    ``panorama``, ``navigation``; CFP/z-dict extraction modes reuse the same
    submodules (see agent/interventions.py).
    """

    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.lang_encoder = LanguageEncoder(c, self.dtype)
        self.pano_encoder = PanoEncoder(c, self.dtype)
        self.local_encoder = CrossModalEncoder(c, sprels=False, dtype=self.dtype)
        self.global_encoder = CrossModalEncoder(c, sprels=c.graph_sprels,
                                                dtype=self.dtype)
        self.gmap_step_embedding = nn.Embed(c.max_action_steps, c.hidden_size,
                                            dtype=self.dtype)
        self.gmap_pos_proj = nn.Dense(c.hidden_size, dtype=self.dtype)
        self.gmap_input_norm = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype)
        self.vp_pos_proj = nn.Dense(c.hidden_size, dtype=self.dtype)
        self.vp_input_norm = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype)

        self.global_sap_head = ClsPrediction(c.hidden_size, c.layer_norm_eps, self.dtype)
        self.local_sap_head = ClsPrediction(c.hidden_size, c.layer_norm_eps, self.dtype)
        self.sap_fuse_linear = ClsPrediction(c.hidden_size * 2, c.layer_norm_eps,
                                             self.dtype)
        # [MEM] recurrence: pooled dual-scale state fed to the next step
        # (MAGIC's cls_embeds, agent.py:966; exact head is unpublished — we
        # fuse the two branch [stop]/cls tokens).
        self.cls_fuse = nn.Dense(c.hidden_size, dtype=self.dtype)

        if c.do_back_txt:
            self.txt_backdoor_direction = ZdictAttention(c, self.dtype)
            self.txt_backdoor_landmark = ZdictAttention(c, self.dtype)
        if c.do_front_txt:
            self.txt_frontdoor = ZdictAttention(c, self.dtype)
        if c.do_front_img:
            self.vp_frontdoor = ZdictAttention(c, self.dtype)
        if c.do_front_his:
            self.gmap_frontdoor = ZdictAttention(c, self.dtype)

        if c.kd_heads:
            # the 7 projection heads + 5 learned ability weights named in the
            # reference checkpoint contract (agent_base.py:330; agent.py:1130-1134)
            proj = lambda: nn.Dense(c.kd_target_size, dtype=self.dtype)
            self.txt_emb_w = proj()
            self.vp_txt_w = proj()
            self.gmap_txt_w = proj()
            self.local_cross_w = proj()
            self.global_cross_w = proj()
            self.kdl_img_w = proj()
            self.kdl_avg_img_w = proj()
            init_w = nn.initializers.constant(0.5413)  # softplus^-1(1.0)
            for name in ("txt", "img", "local", "global", "predict"):
                setattr(self, f"kdl_{name}_weight",
                        self.param(f"kdl_{name}_weight", init_w, ()))

    # ----- mode: language (agent.py:796) -----

    def language(self, txt_ids, txt_masks, instr_zdict=None, front_txt_feats=None,
                 deterministic=True):
        c = self.cfg
        x, attns = self.lang_encoder(txt_ids, txt_masks, deterministic)
        if c.do_back_txt and instr_zdict is not None:
            x = self.txt_backdoor_direction(
                x, instr_zdict["direction_features"],
                instr_zdict.get("direction_pzs"), deterministic)
            x = self.txt_backdoor_landmark(
                x, instr_zdict["landmark_features"],
                instr_zdict.get("landmark_pzs"), deterministic)
        if c.do_front_txt and front_txt_feats is not None:
            x = self.txt_frontdoor(x, front_txt_feats, None, deterministic)
        return x, attns

    # ----- mode: panorama (agent.py:885) -----

    def panorama(self, view_img_fts, loc_fts, nav_types, pano_masks,
                 z_img_feats=None, z_img_pzs=None, deterministic=True):
        return self.pano_encoder(view_img_fts, loc_fts, nav_types, pano_masks,
                                 z_img_feats, z_img_pzs, deterministic)

    # ----- mode: navigation (agent.py:964) -----

    def text_cross_kv(self, txt_embeds):
        """Precompute the cross-attention K/V over the instruction for every
        cross layer whose lang input is loop-invariant: layer 0 always, all
        ``num_x_layers`` when lang2visn is off (the lang stream then never
        changes).  Returns ``{"global": [...], "local": [...]}`` of per-layer
        ``(k, v)`` or ``None`` entries, consumable by ``navigation``'s
        ``txt_cross_kvs``.  Bit-identical to the in-layer Dense: the same
        kernels/biases are read from ``self.variables`` and applied with the
        same dtype promotion ``nn.Dense`` uses."""
        c = self.cfg
        p = self.variables["params"]
        n_hoist = 1 if c.use_lang2visn_attn else c.num_x_layers
        h = c.num_attention_heads
        hd = c.hidden_size // h

        def dense(x, dp):
            y = (x.astype(self.dtype) @ dp["kernel"].astype(self.dtype)
                 + dp["bias"].astype(self.dtype))
            # head-split HERE so the [B, L, H, hd] relayout happens once at
            # hoist time; left packed, every scan step re-laid the buffer
            # for the attention einsum (the profile's largest copy shape,
            # bf16[B, 200, 2, 64], docs/PERF.md)
            return y.reshape(y.shape[:-1] + (h, hd))

        out = {}
        for branch, enc in (("global", "global_encoder"),
                            ("local", "local_encoder")):
            kvs = []
            for i in range(c.num_x_layers):
                if i < n_hoist:
                    dp = p[enc][f"layer_{i}"]["crossattention"]
                    kvs.append((dense(txt_embeds, dp["key"]),
                                dense(txt_embeds, dp["value"])))
                else:
                    kvs.append(None)
            out[branch] = kvs
        return out

    def navigation(self, txt_embeds, txt_masks, gmap_img_embeds, gmap_step_ids,
                   gmap_pos_fts, gmap_masks, gmap_visited_masks, gmap_pair_dists,
                   vp_img_embeds, vp_pos_fts, vp_masks, vp_nav_masks,
                   gmap_local_slot, vp_cand_visited,
                   front_vp_feats=None, front_gmap_feats=None, deterministic=True,
                   txt_cross_kvs=None):
        """Dual-scale cross-modal forward + dynamic action fusion.

        gmap token layout: [stop], [mem], visited..., frontier...  (agent.py:199).
        vp token layout:   [stop], [mem], pano views...             (agent.py:296).
        ``gmap_local_slot[b, g]`` is the vp-token index holding the same
        viewpoint as gmap token g at this step (-1 if none) — the index map
        the reference builds with Python dicts in its fusion loop.
        ``vp_cand_visited[b, p]`` marks candidate vp tokens whose viewpoint is
        already visited (their scores fold into the backtrack logit).
        """
        c = self.cfg

        # step-id embedding as a one-hot matmul: an embedding gather with
        # per-lane-varying ids scalarizes inside the rollout scan (~65 µs/
        # step, docs/PERF.md round 3); the [G, S]x[S, D] one-hot dot is
        # bit-identical (single-nonzero rows) and rides the MXU
        step_tbl = self.gmap_step_embedding.embedding.astype(self.dtype)
        step_emb = jax.nn.one_hot(gmap_step_ids, step_tbl.shape[0],
                                  dtype=self.dtype) @ step_tbl
        gmap_embeds = self.gmap_input_norm(
            gmap_img_embeds
            + step_emb
            + self.gmap_pos_proj(gmap_pos_fts))
        if c.do_front_his and front_gmap_feats is not None:
            gmap_embeds = self.gmap_frontdoor(gmap_embeds, front_gmap_feats, None,
                                              deterministic)

        vp_embeds = self.vp_input_norm(vp_img_embeds + self.vp_pos_proj(vp_pos_fts))
        if c.do_front_img and front_vp_feats is not None:
            vp_embeds = self.vp_frontdoor(vp_embeds, front_vp_feats, None,
                                          deterministic)

        if c.fuse_branches and not self.is_initializing():
            (gmap_embeds, vp_embeds, gmap_attns, vp_attns,
             global_scores, local_scores) = \
                self._branched_encoders(gmap_embeds, vp_embeds, txt_embeds,
                                        gmap_masks, vp_masks, txt_masks,
                                        gmap_pair_dists, deterministic)
        else:
            kvs = txt_cross_kvs or {}
            gmap_embeds, gmap_attns = self.global_encoder(
                gmap_embeds, txt_embeds, gmap_masks, txt_masks,
                gmap_pair_dists, deterministic,
                cross_kvs=kvs.get("global"))
            vp_embeds, vp_attns = self.local_encoder(
                vp_embeds, txt_embeds, vp_masks, txt_masks, None,
                deterministic, cross_kvs=kvs.get("local"))
            global_scores = self.global_sap_head(gmap_embeds)
            local_scores = self.local_sap_head(vp_embeds)

        # --- dynamic fusion of global and local action scores ---
        if c.glocal_fuse:
            fuse = nn.sigmoid(self.sap_fuse_linear(
                jnp.concatenate([gmap_embeds[:, 0], vp_embeds[:, 0]], -1)))[:, None]
        else:
            fuse = jnp.full((gmap_embeds.shape[0], 1), 0.5, self.dtype)

        global_logits = global_scores * fuse
        local_logits = local_scores * (1.0 - fuse)
        global_logits = jnp.where(gmap_masks & ~gmap_visited_masks, global_logits,
                                  NEG_INF)
        local_logits = jnp.where(vp_nav_masks, local_logits, NEG_INF)

        # backtrack logit: sum of local scores of already-visited candidates
        safe_local = jnp.where(vp_nav_masks, local_logits, 0.0)
        bw_logits = (safe_local * vp_cand_visited).sum(-1)

        has_slot = gmap_local_slot >= 0
        slot = jnp.maximum(gmap_local_slot, 0)
        # one-hot selection instead of take_along_axis: per-lane-varying
        # gather indices scalarize on TPU (measured 0.34 ms/step, 4% of eval
        # device time as a bf16[B*G] custom fusion); a single-nonzero one-hot
        # sum is bit-identical and rides the MXU
        slot_onehot = jax.nn.one_hot(slot, safe_local.shape[1],
                                     dtype=safe_local.dtype)
        local_for_gmap = jnp.einsum("bgp,bp->bg", slot_onehot, safe_local)
        g_idx = jnp.arange(global_logits.shape[1])[None, :]
        frontier = gmap_masks & ~gmap_visited_masks & (g_idx > 0)
        add = jnp.where(has_slot & frontier, local_for_gmap,
                        jnp.where(frontier, bw_logits[:, None], 0.0))
        # stop slot: local stop score folds into gmap slot 0
        add = add.at[:, 0].add(safe_local[:, 0])
        fused_logits = jnp.where(global_logits > NEG_INF / 2,
                                 global_logits + add, NEG_INF)

        cls_embeds = self.cls_fuse(
            jnp.concatenate([gmap_embeds[:, 0], vp_embeds[:, 0]], -1))

        return {
            "gmap_embeds": gmap_embeds,
            "vp_embeds": vp_embeds,
            "gmap_attns": gmap_attns,
            "vp_attns": vp_attns,
            "global_logits": global_logits,
            "local_logits": local_logits,
            "fused_logits": fused_logits,
            "fuse_weights": fuse[:, 0],
            "cls_embeds": cls_embeds,
        }

    def _branched_encoders(self, gmap_x, vp_x, lang, gmap_mask, vp_mask,
                           lang_mask, pair_dists, deterministic):
        """Run the global and local cross-modal encoders as ONE vmapped
        computation over branch-stacked parameters.

        The per-step rollout is dispatch-latency bound (~1,300 device ops at
        ~3 µs average, docs/PERF.md): the two encoders have identical layer
        structure but separate weights, so stacking their param trees on a
        leading branch axis and vmapping a single shell encoder halves the
        trunk's op count — every matmul/softmax/LN dispatches once as a
        [2, ...] batched op instead of twice.  Math per branch is exactly
        ``CrossModalEncoder`` (it IS the vmapped function); the vp stream is
        padded to the longer branch length and sliced back (masks make the
        padding inert).  Params/checkpoints are untouched — stacking happens
        at apply time from ``self.variables``.  The global branch's
        graph-sprels bias is evaluated here (same Dense math as
        ``sprel_linear``) because the shell runs with ``sprels=False``.
        """
        c = self.cfg
        B, G, P = gmap_x.shape[0], gmap_x.shape[1], vp_x.shape[1]
        L = max(G, P)

        def pad(x, width):
            cfgpad = [(0, 0)] * x.ndim
            cfgpad[1] = (0, width - x.shape[1])
            return jnp.pad(x, cfgpad)

        visn = jnp.stack([pad(gmap_x, L), pad(vp_x, L)])
        vmask = jnp.stack([pad(gmap_mask, L), pad(vp_mask, L)])

        params = self.variables["params"]
        gp, lp = params["global_encoder"], params["local_encoder"]
        stacked = {
            f"layer_{i}": jax.tree_util.tree_map(
                lambda a, b: jnp.stack([a, b]),
                gp[f"layer_{i}"], lp[f"layer_{i}"])
            for i in range(c.num_x_layers)
        }

        self_bias = jnp.zeros((2, B, c.num_attention_heads, L, L), self.dtype)
        if c.graph_sprels and pair_dists is not None:
            k = gp["sprel_linear"]["kernel"].astype(self.dtype)
            b = gp["sprel_linear"]["bias"].astype(self.dtype)
            x = (1.0 / (1.0 + pair_dists[..., None])).astype(self.dtype)
            rel = (x @ k + b).transpose(0, 3, 1, 2)  # [B, H, G, G]
            rel = jnp.pad(rel, ((0, 0), (0, 0), (0, L - G), (0, L - G)))
            self_bias = self_bias.at[0].set(rel)

        # parent=None: a detached functional shell — it consumes the stacked
        # param trees explicitly and creates no params of its own
        shell = CrossModalEncoder(c, sprels=False, dtype=self.dtype,
                                  parent=None)
        if deterministic:
            def run(p, v, m, sb):
                return shell.apply({"params": p}, v, lang, m, lang_mask,
                                   self_bias=sb, deterministic=True)
            out, attns = jax.vmap(run)(stacked, visn, vmask, self_bias)
        else:
            keys = jax.random.split(self.make_rng("dropout"), 2)
            def run(p, v, m, sb, key):
                return shell.apply({"params": p}, v, lang, m, lang_mask,
                                   self_bias=sb, deterministic=False,
                                   rngs={"dropout": key})
            out, attns = jax.vmap(run)(stacked, visn, vmask, self_bias, keys)

        # the SAP scoring heads ride the same branch axis (ClsPrediction is
        # branch-duplicated too: global_sap_head / local_sap_head)
        head_stack = jax.tree_util.tree_map(
            lambda a, b: jnp.stack([a, b]),
            params["global_sap_head"], params["local_sap_head"])
        head = ClsPrediction(c.hidden_size, c.layer_norm_eps, self.dtype,
                             parent=None)
        scores = jax.vmap(lambda p, x: head.apply({"params": p}, x))(
            head_stack, out)
        return (out[0, :, :G], out[1, :, :P],
                attns[0][:, :, :G, :], attns[1][:, :, :P, :],
                scores[0, :, :G], scores[1, :, :P])

    # ----- mode: extract_cfp_features (agent.py:1516-1561) -----

    def extract_cfp(self, txt_embeds, gmap_embeds, vp_embeds):
        """Pooled trajectory features for the frontdoor dictionaries.  Uses
        the txt/vp/gmap projection heads when present (the student contract
        heads, agent_base.py:330); raw pooled [CLS]/[STOP] embeddings
        otherwise (teacher-size models)."""
        txt = txt_embeds[:, 0]
        gmap = gmap_embeds[:, 0]
        vp = vp_embeds[:, 0]
        if self.cfg.kd_heads:
            txt = self.txt_emb_w(txt)
            gmap = self.gmap_txt_w(gmap)
            vp = self.vp_txt_w(vp)
        norm = lambda x: x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
        return {"txt": norm(txt), "gmap": norm(gmap), "vp": norm(vp)}

    # ----- KD projection heads (called from the loss, as the reference does
    #       from agent code: agent.py:568,600-606,643,661) -----

    def kd_project(self, name, x):
        return getattr(self, name)(x)

    def kd_ability_weights(self):
        """softplus(learned per-ability weights) in the canonical order
        [txt, img, local, global, predict] (agent.py:858)."""
        return jnp.stack([
            jax.nn.softplus(getattr(self, f"kdl_{n}_weight"))
            for n in ("txt", "img", "local", "global", "predict")
        ])

    # ----- init / combined forward -----

    def __call__(self, batch, deterministic=True):
        """Full forward over one assembled step batch — touches every
        submodule so ``model.init`` creates all params; also the convenient
        single-call entry for compile checks."""
        txt_embeds, txt_attns = self.language(
            batch["txt_ids"], batch["txt_masks"], batch.get("instr_zdict"),
            batch.get("front_txt_feats"), deterministic)
        pano_embeds, pano_fused, img_attns = self.panorama(
            batch["view_img_fts"], batch["loc_fts"], batch["nav_types"],
            batch["pano_masks"], batch.get("z_img_feats"),
            batch.get("z_img_pzs"), deterministic)
        outs = self.navigation(
            txt_embeds, batch["txt_masks"], batch["gmap_img_embeds"],
            batch["gmap_step_ids"], batch["gmap_pos_fts"], batch["gmap_masks"],
            batch["gmap_visited_masks"], batch["gmap_pair_dists"],
            batch["vp_img_embeds"], batch["vp_pos_fts"], batch["vp_masks"],
            batch["vp_nav_masks"], batch["gmap_local_slot"],
            batch["vp_cand_visited"], batch.get("front_vp_feats"),
            batch.get("front_gmap_feats"), deterministic)
        if self.cfg.kd_heads:
            for head, x in (
                ("txt_emb_w", txt_embeds), ("vp_txt_w", txt_embeds[:, 0]),
                ("gmap_txt_w", txt_embeds[:, 0]), ("kdl_img_w", pano_embeds),
                ("kdl_avg_img_w", pano_fused),
                ("local_cross_w", outs["vp_embeds"]),
                ("global_cross_w", outs["gmap_embeds"]),
            ):
                self.kd_project(head, x)
            self.kd_ability_weights()
        outs.update({"txt_embeds": txt_embeds, "txt_attns": txt_attns,
                     "pano_embeds": pano_embeds, "pano_fused_embeds": pano_fused,
                     "img_attns": img_attns})
        return outs


def dummy_step_batch(cfg: ModelConfig, batch_size=2, txt_len=16, pano_len=8,
                     gmap_len=6, n_z=4):
    """Minimal consistent input batch for ``model.init`` / compile checks.
    Includes intervention dictionaries when the config enables them so their
    modules get initialized."""
    b, lt, p, g = batch_size, txt_len, pano_len, gmap_len
    f32, i32 = jnp.float32, jnp.int32
    extra = {}
    if cfg.do_back_txt:
        extra["instr_zdict"] = {
            "direction_features": jnp.zeros((b, n_z, cfg.hidden_size), f32),
            "direction_pzs": jnp.ones((b, n_z, 1), f32) / n_z,
            "landmark_features": jnp.zeros((b, n_z, cfg.hidden_size), f32),
            "landmark_pzs": jnp.ones((b, n_z, 1), f32) / n_z,
        }
    if cfg.do_back_img:
        extra["z_img_feats"] = jnp.zeros((b, n_z, cfg.image_feat_size), f32)
        extra["z_img_pzs"] = jnp.ones((b, n_z, 1), f32) / n_z
    # frontdoor features arrive at the CFP projection width (kd_target when
    # the model has projection heads, its own hidden size otherwise)
    front_dim = cfg.kd_target_size if cfg.kd_heads else cfg.hidden_size
    if cfg.do_front_txt:
        extra["front_txt_feats"] = jnp.zeros((b, n_z, front_dim), f32)
    if cfg.do_front_img:
        extra["front_vp_feats"] = jnp.zeros((b, n_z, front_dim), f32)
    if cfg.do_front_his:
        extra["front_gmap_feats"] = jnp.zeros((b, n_z, front_dim), f32)
    return {
        **extra,
        "txt_ids": jnp.zeros((b, lt), i32),
        "txt_masks": jnp.ones((b, lt), bool),
        "view_img_fts": jnp.zeros((b, p, cfg.image_feat_size), f32),
        "loc_fts": jnp.zeros((b, p, cfg.loc_feat_size), f32),
        "nav_types": jnp.ones((b, p), i32),
        "pano_masks": jnp.ones((b, p), bool),
        "gmap_img_embeds": jnp.zeros((b, g, cfg.hidden_size), f32),
        "gmap_step_ids": jnp.zeros((b, g), i32),
        "gmap_pos_fts": jnp.zeros((b, g, cfg.gmap_pos_size), f32),
        "gmap_masks": jnp.ones((b, g), bool).at[:, 1].set(False),
        "gmap_visited_masks": jnp.zeros((b, g), bool).at[:, 1].set(True),
        "gmap_pair_dists": jnp.zeros((b, g, g), f32),
        "vp_img_embeds": jnp.zeros((b, p + 2, cfg.hidden_size), f32),
        "vp_pos_fts": jnp.zeros((b, p + 2, cfg.vp_pos_size), f32),
        "vp_masks": jnp.ones((b, p + 2), bool),
        "vp_nav_masks": jnp.ones((b, p + 2), bool).at[:, 1].set(False),
        "gmap_local_slot": jnp.full((b, g), -1, i32).at[:, 0].set(0),
        "vp_cand_visited": jnp.zeros((b, p + 2), f32),
    }


class Critic(nn.Module):
    """Value head (constructed by the reference agent, agent.py:39; the RL
    path is vestigial — scripts run --gamma 0)."""

    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, state):
        x = nn.Dense(self.hidden_size // 2, dtype=self.dtype)(state)
        x = nn.relu(x)
        return nn.Dense(1, dtype=self.dtype)(x)[..., 0]
