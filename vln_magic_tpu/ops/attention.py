"""Pallas TPU kernel: fused biased attention for the dual-scale encoders.

One kernel computes, per batch element, all heads of
``softmax(q k^T / sqrt(d) + bias) v`` plus the head-averaged probability map
(which is exactly what the MAKD attention-distillation losses consume,
agent.py:579-673) — the [B, H, Lq, Lk] score tensor never round-trips
through HBM.  Replaces what the reference leaves to cuDNN/apex fused kernels
(reference: fairseq/modules/multihead_attention.py;
fairseq hooks to apex at optim/fused_adam.py:11-29).

Sequences here are short (gmap <=128 tokens, text <=250), so each grid
program holds a full (heads, Lq, Lk) working set in VMEM and loops heads
statically; softmax runs in f32 regardless of the input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_attention_reference(q, k, v, bias):
    """Plain-XLA reference: identical math, used for validation and as the
    fallback on non-TPU backends."""
    hd = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd).astype(q.dtype)
    scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v)
    return out, probs.mean(axis=1)


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, p_ref, *, num_heads, scale):
    acc = jnp.zeros(p_ref.shape[1:], jnp.float32)
    for h in range(num_heads):
        q = q_ref[0, h].astype(jnp.float32)
        kk = k_ref[0, h].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = s + bias_ref[0, h].astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1)
        o_ref[0, h] = jnp.dot(p.astype(v_ref.dtype), v_ref[0, h],
                              preferred_element_type=jnp.float32
                              ).astype(o_ref.dtype)
        acc = acc + p
    p_ref[0] = acc / num_heads


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q, k, v, bias, interpret=False):
    """q, k, v: [B, H, L, hd]; bias: broadcastable to [B, H, Lq, Lk]
    (padding mask + graph-distance sprels already summed in).

    Returns (out [B, H, Lq, hd], probs_head_avg [B, Lq, Lk] f32).
    """
    b, h, lq, hd = q.shape
    lk = k.shape[2]
    bias = jnp.broadcast_to(bias, (b, h, lq, lk)).astype(jnp.float32)
    scale = 1.0 / (hd ** 0.5)

    grid = (b,)
    blk = lambda *shape: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    out, probs = pl.pallas_call(
        functools.partial(_kernel, num_heads=h, scale=scale),
        grid=grid,
        in_specs=[blk(1, h, lq, hd), blk(1, h, lk, hd), blk(1, h, lk, hd),
                  blk(1, h, lq, lk)],
        out_specs=[blk(1, h, lq, hd), blk(1, lq, lk)],
        out_shape=[jax.ShapeDtypeStruct((b, h, lq, hd), q.dtype),
                   jax.ShapeDtypeStruct((b, lq, lk), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * lq * lk * (2 * hd),
            bytes_accessed=4 * b * h * (lq * hd * 2 + lk * hd * 2 + lq * lk),
            transcendentals=b * h * lq * lk),
        interpret=interpret,
    )(q, k, v, bias)
    return out, probs
