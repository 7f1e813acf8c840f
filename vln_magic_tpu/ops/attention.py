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


def _packed_kernel(q_ref, k_ref, v_ref, mb_ref, sb_ref, o_ref, *,
                   num_heads, hd, scale, has_sprel):
    """Packed-head attention: Q/K/V arrive [NB, L, H*hd] exactly as the
    QKV Dense layers produce them — heads are VMEM column slices, so the
    [B, L, H, hd] head-split relayout (the profile's dominant copy bucket,
    docs/PERF.md lever #1) never materializes in HBM.  No probability
    output: this path serves deterministic eval/serving, where the
    head-averaged probs are dead code (MAKD consumes them only in training,
    which runs the einsum path)."""
    nb = q_ref.shape[0]
    for i in range(nb):
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            q = q_ref[i, :, sl].astype(jnp.float32)
            kk = k_ref[i, :, sl].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, kk, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = s + mb_ref[i][None, :]
            if has_sprel:
                s = s + sb_ref[i, h]
            p = jax.nn.softmax(s, axis=-1)
            o_ref[i, :, sl] = jnp.dot(
                p.astype(v_ref.dtype), v_ref[i, :, sl],
                preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _packed_kernel_grouped(q_ref, k_ref, v_ref, mb_ref, sb_ref, o_ref, *,
                           num_heads, hd, scale, has_sprel, group):
    """Grouped block-diagonal packed-head attention.

    Processes ``group = 128 // hd`` heads per MXU dot: the per-group K/V
    column block (a 128-lane-ALIGNED slice) is expanded into a
    block-diagonal [group*Lk, 128] operand via lane masks, so one
    full-contraction-width dot computes every head's scores at once.
    Compared to the per-(batch, head) unroll in ``_packed_kernel`` this
    halves the dot count, keeps every slice/store 128-lane aligned (hd=64
    offsets forced lane rotations), and runs the MXU at full k-width (k=64
    dots pad the contraction to 128 and waste half the array — the
    block-diagonal zeros waste exactly the same MACs but save the second
    instruction).  Per-head softmax runs as a segment-masked softmax over
    the [Lq, group*Lk] row — full-width VPU ops, no unaligned slicing.

    mb_ref arrives pre-tiled to [nb, group*Lk]; sb_ref (when has_sprel) is
    pre-arranged to [nb, H//group, Lq, group*Lk] by the wrapper.
    """
    nb = q_ref.shape[0]
    lq = q_ref.shape[1]
    lk = k_ref.shape[1]
    glk = group * lk
    neg = jnp.float32(-1e30)
    # lane-id masks: which head-block each of the 128 columns / glk score
    # columns belongs to
    col_head = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) // hd
    seg = jax.lax.broadcasted_iota(jnp.int32, (lq, glk), 1) // lk
    for i in range(nb):
        for g in range(num_heads // group):
            base = g * 128
            sl = slice(base, base + 128)
            qg = q_ref[i, :, sl]
            kg = k_ref[i, :, sl]
            vg = v_ref[i, :, sl]
            # block-diagonal over the group's heads: row block h keeps only
            # head h's 64 columns
            k2 = jnp.concatenate(
                [jnp.where(col_head == h, kg, jnp.zeros_like(kg))
                 for h in range(group)], axis=0)          # [glk, 128]
            v2 = jnp.concatenate(
                [jnp.where(col_head == h, vg, jnp.zeros_like(vg))
                 for h in range(group)], axis=0)
            s = jax.lax.dot_general(
                qg.astype(jnp.float32), k2.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # [Lq, glk]
            s = s + mb_ref[i][None, :]
            if has_sprel:
                s = s + sb_ref[i, g]
            # segment softmax: per head-block max/sum without slicing lanes
            p = jnp.zeros_like(s)
            for h in range(group):
                m = seg == h
                sm = jnp.where(m, s, neg)
                mx = jnp.max(sm, axis=-1, keepdims=True)
                e = jnp.where(m, jnp.exp(sm - mx), 0.0)
                den = jnp.sum(e, axis=-1, keepdims=True)
                p = p + e / den
            o_ref[i, :, sl] = jnp.dot(
                p.astype(v_ref.dtype), v2,
                preferred_element_type=jnp.float32).astype(o_ref.dtype)


def packed_attention_reference(q, k, v, mask_bias, sprel_bias, num_heads):
    """Plain-XLA oracle for ``packed_attention`` (validation + non-TPU)."""
    b, lq, d = q.shape
    hd = d // num_heads
    qh = q.reshape(b, lq, num_heads, hd)
    kh = k.reshape(b, k.shape[1], num_heads, hd)
    vh = v.reshape(b, v.shape[1], num_heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / jnp.sqrt(hd).astype(q.dtype)
    s = s.astype(jnp.float32) + mask_bias[:, None, None, :]
    if sprel_bias is not None:
        s = s + sprel_bias
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), vh)
    return out.reshape(b, lq, d)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "block_b", "interpret"))
def packed_attention(q, k, v, mask_bias, sprel_bias=None, *, num_heads,
                     block_b=None, interpret=False):
    """Fused attention on packed heads.

    q: [B, Lq, H*hd]; k, v: [B, Lk, H*hd] — the raw Dense outputs, no head
    split.  mask_bias: [B, Lk] additive f32 (0 / -1e9 padding mask).
    sprel_bias: optional [B, H, Lq, Lk] additive f32 (graph_sprels).
    Returns out [B, Lq, H*hd] (packed, ready for the output Dense).

    Grid tiles the batch; each program holds NB full (Lq, Lk) working sets
    in VMEM and statically unrolls batch x heads (NB*H small MXU dots) —
    at the rollout's shapes (L <= 250, hd 64) everything fits comfortably.
    """
    b, lq, d = q.shape
    lk = k.shape[1]
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    if block_b is None:
        # bigger batch tiles amortize the per-program fixed cost (measured
        # 20.2 / 15.6 / 11.9 us per call at nb=8/16/32, B=256 Lq=130
        # Lk=200).  Mosaic requires the [nb, Lk] mask block's nb % 8 == 0
        # on real hardware, so indivisible batches take the XLA oracle
        # (interpret mode has no such constraint — any divisor works).
        if b % 8 == 0:
            block_b = next(nb for nb in (32, 16, 8) if b % nb == 0)
        elif interpret:
            block_b = next(nb for nb in (4, 2, 1) if b % nb == 0)
        else:
            return packed_attention_reference(q, k, v, mask_bias,
                                              sprel_bias, num_heads)
    mask_bias = mask_bias.astype(jnp.float32)
    has_sprel = sprel_bias is not None

    nb = block_b
    blk = lambda *shape: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)

    # grouped block-diagonal path: heads pack into 128-lane-aligned column
    # groups (hd divides 128, head count divides evenly into groups) —
    # measured faster than the per-(batch, head) unroll (full-width MXU
    # dots, no 64-lane-offset slices; see _packed_kernel_grouped)
    group = 128 // hd if hd <= 128 and 128 % hd == 0 else 0
    if group > 1 and num_heads % group == 0:
        glk = group * lk
        mb2 = jnp.tile(mask_bias, (1, group))             # [B, glk]
        if has_sprel:
            sb2 = (sprel_bias.astype(jnp.float32)
                   .reshape(b, num_heads // group, group, lq, lk)
                   .transpose(0, 1, 3, 2, 4)
                   .reshape(b, num_heads // group, lq, glk))
        else:
            sb2 = jnp.zeros((b, num_heads // group, 1, 1), jnp.float32)
        out = pl.pallas_call(
            functools.partial(_packed_kernel_grouped, num_heads=num_heads,
                              hd=hd, scale=scale, has_sprel=has_sprel,
                              group=group),
            grid=(b // nb,),
            in_specs=[blk(nb, lq, d), blk(nb, lk, d), blk(nb, lk, d),
                      blk(nb, glk),
                      blk(nb, num_heads // group, *sb2.shape[2:])],
            out_specs=blk(nb, lq, d),
            out_shape=jax.ShapeDtypeStruct((b, lq, d), q.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * (num_heads // group) * lq * glk * (2 * 128),
                bytes_accessed=2 * b * (lq * d + 2 * lk * d + lq * d),
                transcendentals=b * num_heads * lq * lk),
            interpret=interpret,
        )(q, k, v, mb2, sb2)
        return out

    if not has_sprel:
        # zero-size dummy operand keeps one kernel signature
        sprel_bias = jnp.zeros((b, num_heads, 1, 1), jnp.float32)
    sprel_bias = sprel_bias.astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_packed_kernel, num_heads=num_heads, hd=hd,
                          scale=scale, has_sprel=has_sprel),
        grid=(b // nb,),
        in_specs=[blk(nb, lq, d), blk(nb, lk, d), blk(nb, lk, d),
                  blk(nb, lk),
                  blk(nb, num_heads, *sprel_bias.shape[2:])],
        out_specs=blk(nb, lq, d),
        out_shape=jax.ShapeDtypeStruct((b, lq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * num_heads * lq * lk * (2 * hd),
            bytes_accessed=2 * b * (lq * d + 2 * lk * d + lq * d),
            transcendentals=b * num_heads * lq * lk),
        interpret=interpret,
    )(q, k, v, mask_bias, sprel_bias)
    return out


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
