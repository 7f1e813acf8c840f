"""Transformer building blocks (flax.linen), BERT/RoBERTa post-LN style.

These reconstruct the layer structure of the omitted reference models
(reference: map_nav_src/models/model.py is absent; evidence in SURVEY.md §2.5
and the METER/RoBERTa checkpoint remaps at pretrain_src/train_r2r_magic.py:
183-254).  Everything is mask-driven with static shapes so XLA can fuse and
tile onto the MXU; attention probabilities are returned head-averaged per
layer for the MAKD attention-distillation losses (student and teacher have
different head counts, so the head axis must be reduced before comparing).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e9


def mask_to_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, Lk] bool -> additive attention bias [B, 1, 1, Lk]."""
    return jnp.where(mask, 0.0, NEG_INF).astype(dtype)[:, None, None, :]


class MultiHeadAttention(nn.Module):
    """Standard scaled dot-product attention with optional additive bias.

    ``bias`` broadcasts against [B, H, Lq, Lk] — used for padding masks and
    for the global branch's pairwise-distance bias (graph_sprels).
    Returns (output, head-averaged probs [B, Lq, Lk]).
    """

    hidden_size: int
    num_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    # f32 softmax is the torch-parity default; computing it in the compute
    # dtype (bf16) drops the convert+reduce pairs that measured 16% of eval
    # device time (opt-in: ModelConfig.softmax_compute_dtype_attn)
    softmax_in_dtype: bool = False
    # attention logits straight out of the MXU's f32 accumulator
    # (preferred_element_type) instead of bf16-rounded scores converted back
    # to f32 before the softmax: kills the convert pair AND is numerically
    # CLOSER to the torch-f32 reference than the default bf16 round-trip.
    # No-op when the compute dtype is already f32 (CPU tests / goldens).
    # Opt-in: ModelConfig.attn_logits_f32; measured on TPU in docs/PERF.md
    logits_f32: bool = False

    @nn.compact
    def __call__(self, q_input, kv_input, bias=None, deterministic=True,
                 precomputed_kv=None):
        d = self.hidden_size
        h = self.num_heads
        hd = d // h
        dense = lambda name: nn.Dense(d, dtype=self.dtype, name=name)
        q = dense("query")(q_input)
        if precomputed_kv is not None:
            # loop-invariant K/V computed once outside a scan (the rollout's
            # instruction stream; see ModelConfig.hoist_text_kv).  The
            # key/value Dense params still exist — init always runs the
            # dense path below — they are just not re-applied per step.
            # Arrives either packed [B, L, d] or already head-split
            # [B, L, H, hd] (text_cross_kv splits at hoist time so the
            # per-step relayout copy disappears from the scan body).
            k, v = precomputed_kv
        else:
            k = dense("key")(kv_input)
            v = dense("value")(kv_input)

        if (self.use_pallas and deterministic
                and jax.default_backend() == "tpu"):
            # packed Pallas path (eval/serving): Q/K/V go to the kernel
            # exactly as the Dense layers produce them — heads are sliced in
            # VMEM, so the [B, L, H, hd] head-split relayout copies (the
            # profile's dominant copy bucket, docs/PERF.md lever #1) never
            # hit HBM.  The head-averaged probs are NOT computed: they feed
            # only the MAKD losses, and training (deterministic=False)
            # always runs the einsum path below — here they are dead code
            # that XLA DCEs along with the zeros returned in their place.
            from ..ops.attention import packed_attention

            if k.ndim == 4:     # hoisted pre-split K/V: kernel wants packed
                k = k.reshape(k.shape[0], k.shape[1], d)
                v = v.reshape(v.shape[0], v.shape[1], d)
            b, lq = q.shape[0], q.shape[1]
            lk = k.shape[1]
            if bias is None:
                mask_bias = jnp.zeros((b, lk), jnp.float32)
                sprel = None
            elif bias.shape[-2] == 1 and bias.shape[-3] == 1:
                # padding-mask-style bias [B|1, 1, 1, Lk]
                mask_bias = jnp.broadcast_to(
                    bias[:, 0, 0, :], (b, lk)).astype(jnp.float32)
                sprel = None
            else:
                mask_bias = jnp.zeros((b, lk), jnp.float32)
                sprel = jnp.broadcast_to(
                    bias, (b, h, lq, lk)).astype(jnp.float32)
            ctx = packed_attention(q, k, v, mask_bias, sprel, num_heads=h)
            out = nn.Dense(d, dtype=self.dtype, name="out")(ctx)
            return out, jnp.zeros((b, lq, lk), jnp.float32)

        # heads stay in place ([B, L, H, hd]) and the einsums carry the head
        # axis — explicit (0,2,1,3) transposes materialized as per-step
        # layout copies inside the rollout scan (the profile's copy bucket)
        q = q.reshape(q.shape[:-1] + (h, hd))
        if k.ndim == 3:          # hoisted K/V arrives pre-split
            k = k.reshape(k.shape[:-1] + (h, hd))
            v = v.reshape(v.shape[:-1] + (h, hd))
        if self.logits_f32 and not self.softmax_in_dtype:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32) \
                / jnp.sqrt(hd).astype(jnp.float32)
            if bias is not None:
                scores = scores + bias.astype(jnp.float32)
            probs = nn.softmax(scores, axis=-1).astype(self.dtype)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) \
                / jnp.sqrt(hd).astype(self.dtype)
            if bias is not None:
                scores = scores + bias.astype(scores.dtype)
            if self.softmax_in_dtype:
                probs = nn.softmax(scores, axis=-1)
            else:
                probs = nn.softmax(scores.astype(jnp.float32),
                                   axis=-1).astype(self.dtype)
        probs_drop = nn.Dropout(self.dropout)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs_drop, v)
        ctx = ctx.reshape(ctx.shape[0], ctx.shape[1], d)
        out = nn.Dense(d, dtype=self.dtype, name="out")(ctx)
        return out, probs.mean(axis=1)


class AddNorm(nn.Module):
    hidden_size: int
    dropout: float = 0.1
    eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, residual, x, deterministic=True):
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype)(residual + x)


class FeedForward(nn.Module):
    hidden_size: int
    intermediate_size: int
    dtype: jnp.dtype = jnp.float32
    # exact-erf gelu is the BERT/reference-parity default; the erf polynomial
    # alone measured ~230 µs/step/layer on the in-scan gmap-branch FFN (~11%
    # of eval device time, docs/PERF.md round-3 profile).  The tanh
    # approximation differs by <~3e-3 absolute — around bf16 resolution —
    # and is an opt-in speed knob (ModelConfig.gelu_approximate)
    gelu_approx: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.intermediate_size, dtype=self.dtype, name="intermediate")(x)
        x = nn.gelu(x, approximate=self.gelu_approx)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="output")(x)


class TransformerLayer(nn.Module):
    """Post-LN self-attention encoder layer (BERT structure)."""

    hidden_size: int
    num_heads: int
    intermediate_size: int
    dropout: float = 0.1
    attn_dropout: float = 0.1
    eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    gelu_approx: bool = False
    softmax_in_dtype: bool = False
    logits_f32: bool = False

    @nn.compact
    def __call__(self, x, mask=None, bias=None, deterministic=True):
        attn_bias = None
        if mask is not None:
            attn_bias = mask_to_bias(mask, self.dtype)
        if bias is not None:
            attn_bias = bias if attn_bias is None else attn_bias + bias
        attn_out, probs = MultiHeadAttention(
            self.hidden_size, self.num_heads, self.attn_dropout, self.dtype,
            self.use_pallas, self.softmax_in_dtype, self.logits_f32,
            name="attention",
        )(x, x, attn_bias, deterministic)
        x = AddNorm(self.hidden_size, self.dropout, self.eps, self.dtype,
                    name="attention_norm")(x, attn_out, deterministic)
        ff = FeedForward(self.hidden_size, self.intermediate_size, self.dtype,
                         self.gelu_approx, name="ffn")(x)
        x = AddNorm(self.hidden_size, self.dropout, self.eps, self.dtype,
                    name="ffn_norm")(x, ff, deterministic)
        return x, probs


class CrossModalLayer(nn.Module):
    """One dual-stream cross-modal layer: vision-queries-language cross
    attention, optional language-queries-vision attention
    (use_lang2visn_attn, model config:27), self-attention over the visual
    stream with an optional additive structure bias (graph_sprels), FFN.
    """

    hidden_size: int
    num_heads: int
    intermediate_size: int
    dropout: float = 0.1
    attn_dropout: float = 0.1
    eps: float = 1e-12
    lang2visn: bool = True
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    gelu_approx: bool = False
    softmax_in_dtype: bool = False
    logits_f32: bool = False

    @nn.compact
    def __call__(self, visn, lang, visn_mask, lang_mask, self_bias=None,
                 deterministic=True, cross_kv=None):
        # ``self_bias``: additive [B, H, Lv, Lv] bias on the visual
        # self-attention (graph_sprels, or zeros from the branch-fused path)
        # ``cross_kv``: precomputed (k, v) for the vis->lang cross attention
        # (hoisted loop-invariant instruction K/V, ModelConfig.hoist_text_kv)
        lang_bias = mask_to_bias(lang_mask, self.dtype)
        visn_bias = mask_to_bias(visn_mask, self.dtype)

        x_out, x_probs = MultiHeadAttention(
            self.hidden_size, self.num_heads, self.attn_dropout, self.dtype,
            self.use_pallas, self.softmax_in_dtype, self.logits_f32,
            name="crossattention",
        )(visn, lang, lang_bias, deterministic, precomputed_kv=cross_kv)
        visn = AddNorm(self.hidden_size, self.dropout, self.eps, self.dtype,
                       name="crossattention_norm")(visn, x_out, deterministic)

        if self.lang2visn:
            l_out, _ = MultiHeadAttention(
                self.hidden_size, self.num_heads, self.attn_dropout, self.dtype,
                softmax_in_dtype=self.softmax_in_dtype,
                logits_f32=self.logits_f32,
                name="lang2visn_attention",
            )(lang, visn, visn_bias, deterministic)
            lang = AddNorm(self.hidden_size, self.dropout, self.eps, self.dtype,
                           name="lang2visn_norm")(lang, l_out, deterministic)

        self_attn_bias = visn_bias
        if self_bias is not None:
            self_attn_bias = self_attn_bias + self_bias
        s_out, _ = MultiHeadAttention(
            self.hidden_size, self.num_heads, self.attn_dropout, self.dtype,
            self.use_pallas, self.softmax_in_dtype, self.logits_f32,
            name="self_attention",
        )(visn, visn, self_attn_bias, deterministic)
        visn = AddNorm(self.hidden_size, self.dropout, self.eps, self.dtype,
                       name="self_norm")(visn, s_out, deterministic)

        ff = FeedForward(self.hidden_size, self.intermediate_size, self.dtype,
                         self.gelu_approx, name="ffn")(visn)
        visn = AddNorm(self.hidden_size, self.dropout, self.eps, self.dtype,
                       name="ffn_norm")(visn, ff, deterministic)
        return visn, lang, x_probs
