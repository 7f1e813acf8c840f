"""LRA-style long-sequence classification harness.

Counterpart of the reference's Long Range Arena suite (reference:
map_nav_src/fairseq/tasks/long_range_arena.py:38; models/lra/*.py — the
transformer/luna/mega classification encoders the Mega research fork ships;
SURVEY §5.7).  One classifier head over interchangeable long-context trunks:

  ``mega``  — chunked EMA-gated attention, linear in length (models/mega.py)
  ``luna``  — nested pack/unpack attention, O(N * proj_len) (models/luna.py)
  ``dense`` — plain quadratic multi-head attention (the baseline)

All trunks are static-shape, MXU-friendly, and share the embedding +
mean-pool + classify head so they are directly comparable (the LRA
methodology).  ``lra_train_step`` is a ready-made jitted step for capability
benchmarks and tests.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import FeedForward, MultiHeadAttention, mask_to_bias
from .luna import LunaEncoderLayer
from .mega import MegaEncoder


class _DenseTrunk(nn.Module):
    hidden_size: int
    num_layers: int
    num_heads: int
    dropout: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        bias = mask_to_bias(mask, self.dtype)
        for i in range(self.num_layers):
            a, _ = MultiHeadAttention(self.hidden_size, self.num_heads,
                                      self.dropout, self.dtype,
                                      name=f"attn_{i}")(
                nn.LayerNorm(dtype=self.dtype, name=f"norm1_{i}")(x),
                nn.LayerNorm(dtype=self.dtype, name=f"normk_{i}")(x),
                bias, deterministic)
            x = x + a
            f = FeedForward(self.hidden_size, self.hidden_size * 4,
                            self.dtype, name=f"ffn_{i}")(
                nn.LayerNorm(dtype=self.dtype, name=f"norm2_{i}")(x))
            x = x + f
        return x


class LRAClassifier(nn.Module):
    """Embed -> long-context trunk -> masked mean-pool -> classify."""

    vocab_size: int
    num_classes: int
    hidden_size: int = 64
    num_layers: int = 2
    num_heads: int = 4
    encoder: str = "mega"          # mega | luna | dense
    chunk_size: int = 64           # mega
    proj_len: int = 16             # luna
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, token_ids, mask=None, deterministic=True):
        if mask is None:
            mask = jnp.ones_like(token_ids, bool)
        x = nn.Embed(self.vocab_size, self.hidden_size, dtype=self.dtype,
                     name="embed")(token_ids)
        if self.encoder == "mega":
            x = MegaEncoder(self.hidden_size, self.num_layers,
                            chunk_size=self.chunk_size, dropout=self.dropout,
                            dtype=self.dtype, name="trunk")(
                x, mask, deterministic=deterministic)
        elif self.encoder == "luna":
            p = self.param("proj_tokens", nn.initializers.normal(0.02),
                           (self.proj_len, self.hidden_size))
            p = jnp.broadcast_to(p[None], (x.shape[0],) + p.shape).astype(
                self.dtype)
            for i in range(self.num_layers):
                x, p = LunaEncoderLayer(
                    self.hidden_size, self.num_heads, self.hidden_size * 4,
                    self.dropout, dtype=self.dtype, name=f"trunk_{i}")(
                    x, p, mask, deterministic)
        elif self.encoder == "dense":
            x = _DenseTrunk(self.hidden_size, self.num_layers,
                            self.num_heads, self.dropout, self.dtype,
                            name="trunk")(x, mask, deterministic)
        else:
            raise ValueError(self.encoder)
        denom = jnp.maximum(mask.sum(-1, keepdims=True), 1)
        pooled = (x * mask[..., None]).sum(1) / denom
        pooled = nn.tanh(nn.Dense(self.hidden_size, dtype=self.dtype,
                                  name="pool_proj")(pooled))
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="classifier")(pooled)


def lra_train_step(model, optimizer):
    """Jitted (params, opt_state, tokens, mask, labels, rng) -> updated
    state + (loss, acc): the LRA task training step."""
    import optax

    def loss_fn(params, tokens, mask, labels, rng):
        logits = model.apply(params, tokens, mask, deterministic=False,
                             rngs={"dropout": rng})
        logp = jax.nn.log_softmax(logits, -1)
        ce = -jnp.take_along_axis(logp, labels[:, None], -1)[:, 0]
        acc = (jnp.argmax(logits, -1) == labels).mean()
        return ce.mean(), acc

    def step(params, opt_state, tokens, mask, labels, rng):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, tokens, mask, labels, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    return jax.jit(step, donate_argnums=(0, 1))
