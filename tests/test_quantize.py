import jax
import numpy as np
import pytest

from vln_magic_tpu.config import ModelConfig
from vln_magic_tpu.models import DualScaleVLNBert
from vln_magic_tpu.models.vlnbert import dummy_step_batch
from vln_magic_tpu.utils.quantize import (dequantize_params, load_quantized,
                                          quantization_error, quantize_array,
                                          quantize_params, save_quantized)


def test_quantize_array_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 32)).astype(np.float32)
    q, scale = quantize_array(x)
    assert q.dtype == np.int8
    rel = np.linalg.norm(x - q.astype(np.float32) * scale) / np.linalg.norm(x)
    assert rel < 0.01


def test_quantized_model_still_navigates(tmp_path):
    cfg = ModelConfig(vocab_size=200, hidden_size=64, num_attention_heads=2,
                      num_l_layers=1, num_pano_layers=1, num_x_layers=1,
                      image_feat_size=32, max_position_embeddings=64)
    model = DualScaleVLNBert(cfg)
    batch = dummy_step_batch(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    qp = quantize_params(params)
    err = quantization_error(params, qp)
    assert max(err.values()) < 0.02

    deq = dequantize_params(qp)
    o1 = model.apply(params, batch)
    o2 = model.apply(deq, batch)
    # decisions survive quantization on this random batch
    np.testing.assert_array_equal(
        np.asarray(o1["fused_logits"].argmax(-1)),
        np.asarray(o2["fused_logits"].argmax(-1)))

    p = str(tmp_path / "model_int8.npz")
    save_quantized(params, p)
    loaded = load_quantized(p)
    o3 = model.apply(loaded, batch)
    np.testing.assert_allclose(np.asarray(o2["fused_logits"]),
                               np.asarray(o3["fused_logits"]), rtol=1e-5,
                               atol=1e-5)


def test_speaker_beam_search():
    import jax.numpy as jnp

    from vln_magic_tpu.models.speaker import TransSpeaker, beam_decode, greedy_decode

    model = TransSpeaker(vocab_size=50, hidden_size=32, word_size=16,
                         num_layers=1, num_heads=2)
    b, s, dc = 2, 3, 20
    cand = jax.random.normal(jax.random.PRNGKey(0), (b, s, dc))
    pano = jax.random.normal(jax.random.PRNGKey(1), (b, s, 36, dc))
    masks = jnp.ones((b, s), bool)
    params = model.init(jax.random.PRNGKey(2), cand, pano, masks,
                        jnp.zeros((b, 4), jnp.int32))
    toks, scores = beam_decode(model, params, cand, pano, masks, max_len=8,
                               bos=1, eos=2, beam=3)
    assert toks.shape == (2, 3, 8) and scores.shape == (2, 3)
    assert (np.asarray(toks[:, :, 0]) == 1).all()
    # beams sorted best-first
    assert (np.diff(np.asarray(scores), axis=1) <= 1e-5).all()
    # beam-1 equals greedy
    g = greedy_decode(model, params, cand, pano, masks, 8, 1, 2)
    t1, _ = beam_decode(model, params, cand, pano, masks, 8, 1, 2, beam=1)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(t1[:, 0]))
