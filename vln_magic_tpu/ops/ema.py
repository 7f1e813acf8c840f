"""Multi-dimensional damped EMA as a parallel (associative) scan.

The capability counterpart of the fairseq fork's Mega EMA module
(reference: map_nav_src/fairseq/modules/moving_average_gated_attention.py,
models/mega.py — sequential CUDA-friendly recurrences).  On TPU the
recurrence h_t = a ⊙ h_{t-1} + b ⊙ x_t lowers to
``jax.lax.associative_scan`` — log-depth, fully parallel across the
sequence, XLA-fused.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def damped_ema_scan(x, alpha, delta, beta, eta, h0=None):
    """Mega's multidimensional damped EMA.

    x:     [B, L, D] input
    alpha: [D, N] per-dim expansion weights in (0, 1)
    delta: [D, N] damping in (0, 1)
    beta:  [D, N] input expansion
    eta:   [D, N] output projection
    h0:    optional [B, D, N] initial state

    u_t = beta * x_t (expanded to N);  h_t = (1 - alpha*delta) h_{t-1}
    + alpha * u_t;  y_t = sum_N eta * h_t.
    Returns (y [B, L, D], h_last [B, D, N]).
    """
    b, l, d = x.shape
    n = alpha.shape[1]
    a = (1.0 - alpha * delta)[None, None]          # [1, 1, D, N]
    u = x[..., None] * beta[None, None]            # [B, L, D, N]
    bx = alpha[None, None] * u

    if h0 is not None:
        bx = bx.at[:, 0].add(a[0, 0] * h0)

    def combine(c1, c2):
        a1, b1 = c1
        a2, b2 = c2
        return a1 * a2, b1 * a2 + b2

    a_full = jnp.broadcast_to(a, bx.shape)
    _, h = jax.lax.associative_scan(combine, (a_full, bx), axis=1)
    y = (h * eta[None, None]).sum(-1)
    return y, h[:, -1]


def damped_ema_reference(x, alpha, delta, beta, eta, h0=None):
    """Sequential oracle for tests."""
    b, l, d = x.shape
    n = alpha.shape[1]
    h = jnp.zeros((b, d, n)) if h0 is None else h0
    ys = []
    for t in range(l):
        u = x[:, t, :, None] * beta[None]
        h = (1 - alpha * delta)[None] * h + alpha[None] * u
        ys.append((h * eta[None]).sum(-1))
    return jnp.stack(ys, axis=1), h
