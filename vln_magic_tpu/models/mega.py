"""Mega-style moving-average-gated attention: the long-range toolkit.

Capability parity with the reference's vendored Mega research fork
(reference: map_nav_src/fairseq/models/mega.py:87-650, modules/
moving_average_gated_attention.py:1-403, mega_layer.py — chunked
linear-time EMA-gated single-head attention, the fork's reason to exist for
long sequences; SURVEY §5.7).  Rebuilt TPU-first: the EMA is a parallel
associative scan (ops/ema.py), chunked attention is one batched matmul per
chunk block ([B*C, L_c, L_c] on the MXU), and gating is plain fused
elementwise.

Linear in sequence length: attention never crosses chunk boundaries; the EMA
carries global context across chunks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.ema import damped_ema_scan


class MovingAverageGatedAttention(nn.Module):
    """One Mega block: damped-EMA context -> shared single-head chunked
    attention -> SiLU gating with reset/update gates."""

    hidden_size: int
    z_dim: int = 64          # shared qk dimension
    v_dim: int | None = None  # value/expanded dim (default 2*hidden)
    ema_ndim: int = 8
    chunk_size: int = 64
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, causal=False, deterministic=True):
        d = self.hidden_size
        v_dim = self.v_dim or 2 * d
        b, l, _ = x.shape
        c = min(self.chunk_size, l)
        pad = (-l) % c
        n_chunks = (l + pad) // c

        # --- EMA context (parallel scan over the full sequence) ---
        init = nn.initializers.uniform(scale=1.0)
        p_alpha = self.param("alpha", init, (d, self.ema_ndim))
        p_delta = self.param("delta", init, (d, self.ema_ndim))
        p_beta = self.param("beta", nn.initializers.normal(0.02),
                            (d, self.ema_ndim))
        p_eta = self.param("eta", nn.initializers.normal(1.0),
                           (d, self.ema_ndim))
        alpha = jax.nn.sigmoid(p_alpha)
        delta = jax.nn.sigmoid(p_delta)
        xin = x * mask[..., None] if mask is not None else x
        mx, _ = damped_ema_scan(xin.astype(jnp.float32), alpha, delta,
                                p_beta, p_eta)
        mx = mx.astype(self.dtype)

        # --- shared representation and single-head qk from the EMA output ---
        z = nn.Dense(self.z_dim, dtype=self.dtype, name="z_proj")(mx)
        z = nn.silu(z)
        # per-dim scale/offset split into q and k (Mega's qk parameterization)
        kappa_q = self.param("kappa_q", nn.initializers.normal(0.02),
                             (2, self.z_dim))
        kappa_b = self.param("kappa_b", nn.initializers.zeros, (2, self.z_dim))
        q = z * kappa_q[0] + kappa_b[0]
        k = z * kappa_q[1] + kappa_b[1]
        v = nn.silu(nn.Dense(v_dim, dtype=self.dtype, name="v_proj")(x))

        # --- chunked attention (never crosses chunk boundaries) ---
        def to_chunks(t):
            t = jnp.pad(t, ((0, 0), (0, pad)) + ((0, 0),) * (t.ndim - 2))
            return t.reshape(b * n_chunks, c, *t.shape[2:])

        qc, kc, vc = to_chunks(q), to_chunks(k), to_chunks(v)
        mc = to_chunks((mask if mask is not None
                        else jnp.ones((b, l), bool))[..., None])[..., 0]
        scores = jnp.einsum("xqd,xkd->xqk", qc, kc) / jnp.sqrt(
            self.z_dim).astype(self.dtype)
        bias = jnp.where(mc, 0.0, -1e9)[:, None, :]
        if causal:
            cm = jnp.tril(jnp.ones((c, c), bool))
            bias = bias + jnp.where(cm, 0.0, -1e9)[None]
        probs = jax.nn.softmax(scores.astype(jnp.float32) + bias, axis=-1)
        probs = nn.Dropout(self.dropout)(probs.astype(self.dtype),
                                         deterministic=deterministic)
        ctx = jnp.einsum("xqk,xkd->xqd", probs, vc)
        ctx = ctx.reshape(b, n_chunks * c, v_dim)[:, :l]

        # --- gated output (reset/update gates from the EMA stream) ---
        # gamma/beta_g are Mega's per-gate scale/offset calibration: row 0
        # calibrates the reset-gate stream, row 1 the attention context
        # entering the candidate projection (reference moving_average_gated_
        # attention.py's per-stream rescale before gating).
        gamma = self.param("gamma", nn.initializers.normal(0.02), (2, v_dim))
        beta_g = self.param("beta_g", nn.initializers.zeros, (2, v_dim))
        reset = nn.silu(
            nn.Dense(v_dim, dtype=self.dtype, name="reset")(mx)
            * (1.0 + gamma[0]) + beta_g[0])
        update = nn.sigmoid(nn.Dense(d, dtype=self.dtype, name="update")(mx))
        h = nn.silu(nn.Dense(d, dtype=self.dtype, name="h_proj")(
            (ctx * (1.0 + gamma[1]) + beta_g[1]) * reset))
        out = update * h + (1.0 - update) * x
        return nn.LayerNorm(dtype=self.dtype, name="norm")(out)


class MegaEncoder(nn.Module):
    """Stack of Mega blocks + lightweight FFNs — a drop-in long-sequence
    encoder (the LRA-suite role, fairseq/models/lra/)."""

    hidden_size: int
    num_layers: int = 4
    chunk_size: int = 64
    ema_ndim: int = 8
    ffn_ratio: int = 2
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, causal=False, deterministic=True):
        for i in range(self.num_layers):
            x = MovingAverageGatedAttention(
                self.hidden_size, chunk_size=self.chunk_size,
                ema_ndim=self.ema_ndim, dropout=self.dropout,
                dtype=self.dtype, name=f"mega_{i}",
            )(x, mask, causal, deterministic)
            y = nn.Dense(self.hidden_size * self.ffn_ratio, dtype=self.dtype,
                         name=f"ffn_up_{i}")(x)
            y = nn.silu(y)
            y = nn.Dense(self.hidden_size, dtype=self.dtype,
                         name=f"ffn_down_{i}")(y)
            x = nn.LayerNorm(dtype=self.dtype, name=f"ffn_norm_{i}")(x + y)
        return x
