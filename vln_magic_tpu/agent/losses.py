"""Distillation losses: MAKD feature/attention/logit losses, MKTD sample
weighting, MKRW ability weighting, and the decoupled KD (DKD) logit loss.

Pure jnp functions mirroring the reference loss semantics
(reference: map_nav_src/utils/kd_loss.py:6-67 for mse/kd/MKTD transforms;
agent.py:546-719 for the per-ability assembly; the ``dkd_loss`` the reference
imports is absent upstream — reconstructed here from the published DKD
formulation with the reference's alpha/beta knobs, parser.py:157-158).

All losses take ``t_sample_weights`` (MKTD per-sample weights derived from the
teacher's CE loss) and ``loss_type`` ('sum' | 'mean').
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF_CLAMP = -1e6


def _weight_and_reduce(per_sample, t_sample_weights, loss_type):
    if t_sample_weights is not None:
        w = t_sample_weights.reshape(
            (-1,) + (1,) * (per_sample.ndim - 1))
        per_sample = per_sample * w
    if loss_type == "sum":
        return per_sample.sum()
    if loss_type == "mean":
        return per_sample.mean()
    raise ValueError(f"loss_type {loss_type}")


def mse_loss(s_inputs, t_inputs, t_sample_weights=None, loss_type="sum", **_):
    """Elementwise squared error (reference kd_loss.py:6-25)."""
    return _weight_and_reduce((s_inputs - t_inputs) ** 2, t_sample_weights,
                              loss_type)


def kd_loss(student_logits, teacher_logits, temperature=1.0,
            t_sample_weights=None, loss_type="sum", **_):
    """Temperature-scaled KL(teacher || student) over the last axis with
    -inf clamping (reference kd_loss.py:27-54).

    Matches torch's KLDivLoss conventions: 'sum' sums all elements;
    'mean' divides by the *element* count (torch's legacy 'mean', not
    batchmean) — kept for parity.
    """
    s = jnp.where(jnp.isneginf(student_logits), NEG_INF_CLAMP, student_logits)
    t = jnp.where(jnp.isneginf(teacher_logits), NEG_INF_CLAMP, teacher_logits)
    # clamp our -1e9 masks too
    s = jnp.clip(s, NEG_INF_CLAMP, None)
    t = jnp.clip(t, NEG_INF_CLAMP, None)
    p_t = jax.nn.softmax(t / temperature, axis=-1)
    log_p_s = jax.nn.log_softmax(s / temperature, axis=-1)
    log_p_t = jnp.log(jnp.clip(p_t, 1e-12, None))
    pointwise = p_t * (log_p_t - log_p_s)
    scale = temperature ** 2
    if t_sample_weights is None:
        return _weight_and_reduce(pointwise, None, loss_type) * scale
    per_sample = pointwise.sum(axis=-1)
    return _weight_and_reduce(per_sample, t_sample_weights, loss_type) * scale


def dkd_loss(student_logits, teacher_logits, target, temperature=1.0,
             alpha=1.0, beta=8.0, t_sample_weights=None, loss_type="sum", **_):
    """Decoupled knowledge distillation: target-class KD (TCKD) weighted by
    ``alpha`` + non-target-class KD (NCKD) weighted by ``beta``.

    Reconstructed for the missing upstream import (agent_base.py:22;
    knobs kdl_dkd_alpha/beta, parser.py:157-158).  ``target`` indexes the
    class axis; rows whose target was remapped from ignore_id are expected to
    be zeroed via t_sample_weights or the caller's masking (the reference
    clamps ignore rows to class 0, agent.py:703).
    """
    s = jnp.clip(jnp.where(jnp.isneginf(student_logits), NEG_INF_CLAMP,
                           student_logits), NEG_INF_CLAMP, None)
    t = jnp.clip(jnp.where(jnp.isneginf(teacher_logits), NEG_INF_CLAMP,
                           teacher_logits), NEG_INF_CLAMP, None)
    n = s.shape[-1]
    onehot = jax.nn.one_hot(target, n)
    p_s = jax.nn.softmax(s / temperature, axis=-1)
    p_t = jax.nn.softmax(t / temperature, axis=-1)

    # TCKD: binary KL over {target, not-target}
    pt_s = (p_s * onehot).sum(-1)
    pt_t = (p_t * onehot).sum(-1)
    b_s = jnp.clip(jnp.stack([pt_s, 1 - pt_s], -1), 1e-12, 1.0)
    b_t = jnp.clip(jnp.stack([pt_t, 1 - pt_t], -1), 1e-12, 1.0)
    tckd = (b_t * (jnp.log(b_t) - jnp.log(b_s))).sum(-1)

    # NCKD: KL over non-target classes (target masked to -inf)
    masked_s = jnp.where(onehot > 0, NEG_INF_CLAMP, s) / temperature
    masked_t = jnp.where(onehot > 0, NEG_INF_CLAMP, t) / temperature
    pn_t = jax.nn.softmax(masked_t, axis=-1)
    log_pn_s = jax.nn.log_softmax(masked_s, axis=-1)
    log_pn_t = jnp.log(jnp.clip(pn_t, 1e-12, None))
    nckd = (pn_t * (log_pn_t - log_pn_s)).sum(-1)

    per_sample = (alpha * tckd + beta * nckd) * (temperature ** 2)
    return _weight_and_reduce(per_sample, t_sample_weights, loss_type)


# ----- MKTD: teacher-loss -> per-sample transfer weights -----

def exponential_decay(t_sample_losses, decay_rate=0.1):
    """w = exp(-decay * loss) (reference kd_loss.py:56-57)."""
    return jnp.exp(-decay_rate * t_sample_losses)


def invert_normalized_losses(t_sample_losses, eps=1e-8, **_):
    """1 - minmax-normalized loss (reference kd_loss.py:59-67)."""
    lo = t_sample_losses.min()
    hi = t_sample_losses.max()
    return 1.0 - (t_sample_losses - lo) / jnp.maximum(hi - lo, eps)


def mktd_sample_weights(per_sample_ce, method="exp", decay=0.7):
    if method == "exp":
        return exponential_decay(per_sample_ce, decay)
    if method == "norm":
        return invert_normalized_losses(per_sample_ce)
    raise ValueError(method)


# ----- MKRW: randomized per-step ability weights -----

def mkrw_weights(rng, num_abilities=5, temp=1.0):
    """softmax(N(0,1)/temp) * K — per-step random reweighting over the K
    meta-abilities (reference agent.py:866-871)."""
    z = jax.random.normal(rng, (num_abilities,))
    return jax.nn.softmax(z / temp) * num_abilities


def grad_softmax_weights(ability_grads, temp=1.0):
    """Gradient-magnitude-driven ability weights for the 'grad' mode:
    softmax(-grads / temp) * K (reference agent.py:856-863)."""
    g = -jnp.asarray(ability_grads)
    return jax.nn.softmax(g / temp) * g.shape[0]


def masked_softmax_ce(logits, targets, ignore_id=-100):
    """Per-sample cross entropy with ignore_index semantics."""
    valid = targets != ignore_id
    tgt = jnp.maximum(targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, tgt[:, None], axis=1)[:, 0]
    return ce * valid, valid
