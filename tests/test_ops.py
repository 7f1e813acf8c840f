import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_magic_tpu.ops.attention import (fused_attention,
                                         fused_attention_reference,
                                         packed_attention,
                                         packed_attention_reference)


@pytest.mark.parametrize("b,h,lq,lk,hd", [(2, 2, 16, 16, 32),
                                          (1, 4, 8, 24, 16)])
def test_fused_attention_matches_reference(b, h, lq, lk, hd):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(k1, (b, h, lq, hd))
    k = jax.random.normal(k2, (b, h, lk, hd))
    v = jax.random.normal(k3, (b, h, lk, hd))
    bias = jax.random.normal(k4, (b, 1, 1, lk)) * 2.0
    # mask some keys with -1e9 like the model does
    bias = bias.at[:, :, :, -3:].set(-1e9)

    out_ref, probs_ref = fused_attention_reference(q, k, v, bias)
    out_p, probs_p = fused_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(probs_p), np.asarray(probs_ref),
                               rtol=2e-4, atol=2e-5)
    # masked keys get ~zero probability
    assert float(np.asarray(probs_p)[..., -3:].max()) < 1e-6


def test_fused_attention_bf16():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(k1, (2, 2, 16, 32), jnp.bfloat16)
    k = jax.random.normal(k2, (2, 2, 16, 32), jnp.bfloat16)
    v = jax.random.normal(k3, (2, 2, 16, 32), jnp.bfloat16)
    bias = jnp.zeros((1, 1, 1, 1))
    out_p, probs_p = fused_attention(q, k, v, bias, interpret=True)
    out_ref, probs_ref = fused_attention_reference(q, k, v, bias)
    assert out_p.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out_p, np.float32),
                               np.asarray(out_ref, np.float32),
                               rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("b,h,lq,lk,hd,sprel", [
    (4, 2, 16, 24, 32, False),    # cross-attention shape (mask bias only)
    (2, 2, 16, 16, 32, True),     # self-attention with graph-sprels bias
    (3, 4, 8, 8, 16, False),      # odd batch -> block_b falls back to 1
])
def test_packed_attention_matches_reference(b, h, lq, lk, hd, sprel):
    d = h * hd
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(k1, (b, lq, d))
    k = jax.random.normal(k2, (b, lk, d))
    v = jax.random.normal(k3, (b, lk, d))
    mask_bias = jnp.zeros((b, lk)).at[:, -3:].set(-1e9)
    sb = (jax.random.normal(k4, (b, h, lq, lk)) if sprel else None)
    out_ref = packed_attention_reference(q, k, v, mask_bias, sb, h)
    out_p = packed_attention(q, k, v, mask_bias, sb, num_heads=h,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("b,h,lq,lk,sprel", [
    (4, 2, 16, 24, False),   # MAGIC-S shape family: one group of 2 heads
    (2, 2, 16, 16, True),    # grouped + graph-sprels bias
    (2, 4, 8, 24, True),     # multiple head groups (teacher-like)
])
def test_packed_attention_grouped_matches_reference(b, h, lq, lk, sprel):
    """hd=64 routes to the grouped block-diagonal kernel
    (_packed_kernel_grouped); math must match the XLA oracle exactly."""
    hd = 64
    d = h * hd
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(7), 4)
    q = jax.random.normal(k1, (b, lq, d))
    k = jax.random.normal(k2, (b, lk, d))
    v = jax.random.normal(k3, (b, lk, d))
    mask_bias = jnp.zeros((b, lk)).at[:, -3:].set(-1e9)
    sb = (jax.random.normal(k4, (b, h, lq, lk)) if sprel else None)
    out_ref = packed_attention_reference(q, k, v, mask_bias, sb, h)
    out_p = packed_attention(q, k, v, mask_bias, sb, num_heads=h,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-5)


def test_packed_attention_bf16():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(k1, (2, 16, 64), jnp.bfloat16)
    k = jax.random.normal(k2, (2, 16, 64), jnp.bfloat16)
    v = jax.random.normal(k3, (2, 16, 64), jnp.bfloat16)
    mask_bias = jnp.zeros((2, 16))
    out_p = packed_attention(q, k, v, mask_bias, None, num_heads=2,
                             interpret=True)
    out_ref = packed_attention_reference(q, k, v, mask_bias, None, 2)
    assert out_p.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out_p, np.float32),
                               np.asarray(out_ref, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_model_flag_pallas_falls_back_on_cpu():
    """On CPU the flag must silently use the XLA path (same results)."""
    import dataclasses

    from vln_magic_tpu.config import ModelConfig
    from vln_magic_tpu.models import DualScaleVLNBert
    from vln_magic_tpu.models.vlnbert import dummy_step_batch

    cfg = ModelConfig(vocab_size=100, hidden_size=32, num_attention_heads=2,
                      num_l_layers=1, num_pano_layers=1, num_x_layers=1,
                      image_feat_size=16, max_position_embeddings=64)
    batch = dummy_step_batch(cfg)
    m1 = DualScaleVLNBert(cfg)
    params = m1.init(jax.random.PRNGKey(0), batch)
    m2 = DualScaleVLNBert(dataclasses.replace(cfg, use_pallas_attention=True))
    o1 = m1.apply(params, batch)
    o2 = m2.apply(params, batch)
    np.testing.assert_allclose(np.asarray(o1["fused_logits"]),
                               np.asarray(o2["fused_logits"]), rtol=1e-5)
