"""Luna: Linear Unified Nested Attention.

TPU-native counterpart of the reference's Luna module family (reference:
map_nav_src/fairseq/modules/luna_attention.py:1-730,
luna_sentence_encoder.py; models/lra/luna encoders) — the second long-context
tool the vendored Mega fork carries next to Mega itself (models/mega.py here).

Nested attention over a fixed-length projected sequence ``P`` of ``proj_len``
tokens: the *pack* attention contextualizes P against the input
(``P' = Attn(P, X)``), the *unpack* attention reads the input against the
packed context (``Y = Attn(X, P')``).  Cost is O(N * proj_len) instead of
O(N^2) — both attentions are plain dense matmuls on the MXU with static
shapes, so XLA tiles them without any custom kernel.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import FeedForward, MultiHeadAttention, mask_to_bias


class LunaAttention(nn.Module):
    """One nested (pack + unpack) attention: returns (Y, P')."""

    hidden_size: int
    num_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, p, x_mask=None, deterministic=True):
        x_bias = mask_to_bias(x_mask, self.dtype) if x_mask is not None else None
        packed, _ = MultiHeadAttention(
            self.hidden_size, self.num_heads, self.dropout, self.dtype,
            name="pack")(p, x, x_bias, deterministic)
        # the packed context is fully dense — no key mask needed
        y, _ = MultiHeadAttention(
            self.hidden_size, self.num_heads, self.dropout, self.dtype,
            name="unpack")(x, packed, None, deterministic)
        return y, packed


class LunaEncoderLayer(nn.Module):
    """Pre-LN Luna layer updating both streams (luna_sentence_encoder
    layer semantics): x gets attention + FFN residuals, p gets the packed
    update."""

    hidden_size: int
    num_heads: int
    intermediate_size: int
    dropout: float = 0.1
    eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, p, x_mask=None, deterministic=True):
        y, packed = LunaAttention(self.hidden_size, self.num_heads,
                                  self.dropout, self.dtype, name="attn")(
            nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="x_norm")(x),
            nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="p_norm")(p),
            x_mask, deterministic)
        x = x + nn.Dropout(self.dropout)(y, deterministic=deterministic)
        p = p + nn.Dropout(self.dropout)(packed, deterministic=deterministic)
        ff = FeedForward(self.hidden_size, self.intermediate_size, self.dtype,
                         name="ffn")(
            nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                         name="ffn_norm")(x))
        x = x + nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        return x, p


class LunaEncoder(nn.Module):
    """Stacked Luna encoder over token ids (the LRA-style classifier trunk,
    fairseq models/lra/luna encoders): learned projected tokens, num_layers
    nested-attention layers, mean-pooled [CLS]-free readout."""

    vocab_size: int
    hidden_size: int
    num_layers: int = 2
    num_heads: int = 4
    proj_len: int = 32
    intermediate_ratio: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, token_ids, mask=None, deterministic=True):
        if mask is None:
            mask = jnp.ones_like(token_ids, bool)
        x = nn.Embed(self.vocab_size, self.hidden_size, dtype=self.dtype,
                     name="embed")(token_ids)
        pos = self.param("proj_tokens", nn.initializers.normal(0.02),
                         (self.proj_len, self.hidden_size))
        p = jnp.broadcast_to(pos[None], (x.shape[0],) + pos.shape).astype(
            self.dtype)
        for i in range(self.num_layers):
            x, p = LunaEncoderLayer(
                self.hidden_size, self.num_heads,
                self.hidden_size * self.intermediate_ratio, self.dropout,
                dtype=self.dtype, name=f"layer_{i}")(
                x, p, mask, deterministic)
        denom = jnp.maximum(mask.sum(-1, keepdims=True), 1)
        pooled = (x * mask[..., None]).sum(1) / denom
        return x, p, pooled
