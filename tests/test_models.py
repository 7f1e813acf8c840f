import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_magic_tpu.config import ModelConfig, from_reference_flags
from vln_magic_tpu.models import Critic, DualScaleVLNBert
from vln_magic_tpu.models.vlnbert import dummy_step_batch


@pytest.fixture(scope="module")
def small_cfg():
    return ModelConfig(
        vocab_size=200, hidden_size=64, num_attention_heads=4, num_l_layers=2,
        num_pano_layers=2, num_x_layers=2, image_feat_size=32,
        max_position_embeddings=64, kd_heads=True, kd_target_size=96,
    )


@pytest.fixture(scope="module")
def model_and_params(small_cfg):
    model = DualScaleVLNBert(small_cfg)
    batch = dummy_step_batch(small_cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    return model, params, batch


def test_full_forward_shapes(model_and_params, small_cfg):
    model, params, batch = model_and_params
    outs = model.apply(params, batch)
    b, g = batch["gmap_masks"].shape
    p2 = batch["vp_masks"].shape[1]
    lt = batch["txt_masks"].shape[1]
    assert outs["fused_logits"].shape == (b, g)
    assert outs["global_logits"].shape == (b, g)
    assert outs["local_logits"].shape == (b, p2)
    assert outs["cls_embeds"].shape == (b, small_cfg.hidden_size)
    assert outs["txt_embeds"].shape == (b, lt, small_cfg.hidden_size)
    assert outs["txt_attns"].shape == (b, small_cfg.num_l_layers, lt, lt)
    assert outs["gmap_attns"].shape == (b, small_cfg.num_x_layers, g, lt)
    assert np.isfinite(np.asarray(outs["fused_logits"][:, 0])).all()


def test_mem_token_masked_from_actions(model_and_params):
    model, params, batch = model_and_params
    outs = model.apply(params, batch)
    # [MEM] is gmap slot 1: unreachable as an action (agent.py:233)
    assert (np.asarray(outs["fused_logits"][:, 1]) < -1e8).all()
    assert (np.asarray(outs["global_logits"][:, 1]) < -1e8).all()


def test_visited_nodes_masked(model_and_params):
    model, params, batch = model_and_params
    batch = dict(batch)
    batch["gmap_visited_masks"] = batch["gmap_visited_masks"].at[:, 2].set(True)
    outs = model.apply(params, batch)
    assert (np.asarray(outs["fused_logits"][:, 2]) < -1e8).all()


def test_padding_invariance(model_and_params, small_cfg):
    """Extending padded regions must not change valid outputs (mask discipline)."""
    model, params, batch = model_and_params
    outs = model.apply(params, batch)

    wide = dummy_step_batch(small_cfg, txt_len=24, pano_len=12, gmap_len=9)
    # copy the real content, leave the extension as padding
    for k, v in batch.items():
        w = np.asarray(wide[k]).copy()
        sl = tuple(slice(0, s) for s in v.shape)
        w[sl] = np.asarray(v)
        # mask extension
        if k in ("txt_masks", "pano_masks", "gmap_masks", "vp_masks", "vp_nav_masks"):
            mask = np.zeros_like(w, dtype=bool)
            mask[sl] = np.asarray(v)
            w = mask
        if k == "gmap_visited_masks":
            mask = np.zeros_like(w, dtype=bool)
            mask[sl] = np.asarray(v)
            w = mask
        if k == "nav_types":
            w2 = np.zeros_like(w)
            w2[sl] = np.asarray(v)
            w = w2
        if k == "gmap_local_slot":
            w2 = np.full_like(w, -1)
            w2[sl] = np.asarray(v)
            w = w2
        if k == "vp_cand_visited":
            w2 = np.zeros_like(w)
            w2[sl] = np.asarray(v)
            w = w2
        wide[k] = jnp.asarray(w)
    wouts = model.apply(params, wide)

    g = batch["gmap_masks"].shape[1]
    np.testing.assert_allclose(
        np.asarray(outs["fused_logits"][:, 0]),
        np.asarray(wouts["fused_logits"][:, 0]), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(outs["cls_embeds"]), np.asarray(wouts["cls_embeds"]),
        rtol=2e-4, atol=2e-5)
    # valid (non-mem) action logits match
    valid = np.asarray(batch["gmap_masks"][0] & ~batch["gmap_visited_masks"][0])
    np.testing.assert_allclose(
        np.asarray(outs["fused_logits"][0][valid]),
        np.asarray(wouts["fused_logits"][0][:g][valid]), rtol=2e-4, atol=2e-5)


def _randomized(batch, seed=0):
    """Fill the dummy batch's float arrays with random values (zeros would
    make the fused-vs-unfused comparison vacuous)."""
    rng = np.random.default_rng(seed)
    out = {}
    for k, v in batch.items():
        if isinstance(v, dict):
            out[k] = _randomized(v, seed + 1)
        elif jnp.issubdtype(v.dtype, jnp.floating) and "pzs" not in k \
                and k not in ("vp_cand_visited", "gmap_pair_dists"):
            out[k] = jnp.asarray(
                rng.standard_normal(v.shape).astype(np.float32))
        elif k == "gmap_pair_dists":
            out[k] = jnp.asarray(
                rng.uniform(0, 10, v.shape).astype(np.float32))
        else:
            out[k] = v
    return out


@pytest.mark.parametrize("sprels,lang2visn", [(True, True), (False, False),
                                              (True, False)])
def test_branch_fusion_matches_unfused(sprels, lang2visn):
    """`fuse_branches` is a pure perf knob: the vmapped branch-stacked trunk
    must reproduce the two-encoder path exactly (same params, same inputs)."""
    from dataclasses import replace

    base = ModelConfig(
        vocab_size=200, hidden_size=64, num_attention_heads=4, num_l_layers=1,
        num_pano_layers=1, num_x_layers=2, image_feat_size=32,
        max_position_embeddings=64, graph_sprels=sprels,
        use_lang2visn_attn=lang2visn, fuse_branches=False)
    fused_cfg = replace(base, fuse_branches=True)
    m0, m1 = DualScaleVLNBert(base), DualScaleVLNBert(fused_cfg)
    batch = _randomized(dummy_step_batch(base, gmap_len=7, pano_len=5))
    params = m0.init(jax.random.PRNGKey(0), batch)
    o0 = m0.apply(params, batch)
    o1 = m1.apply(params, batch)
    for key in ("gmap_embeds", "vp_embeds", "gmap_attns", "vp_attns",
                "fused_logits", "cls_embeds", "fuse_weights"):
        a, b = np.asarray(o0[key]), np.asarray(o1[key])
        if key == "fused_logits":  # padded lanes carry NEG_INF sentinels
            m = a > -1e8
            a, b = a[m], b[m]
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5,
                                   err_msg=f"branch fusion diverged on {key}")


@pytest.mark.parametrize("lang2visn", [True, False])
def test_text_kv_hoist_matches_inplace(lang2visn):
    """Precomputed instruction K/V (``text_cross_kv`` -> ``navigation``'s
    ``txt_cross_kvs``) must be bit-identical to the in-layer Dense path —
    it is the same projection on the same values, hoisted out of the rollout
    scan.  With lang2visn off every layer hoists; with it on only layer 0
    (deeper layers read the updated lang stream)."""
    cfg = ModelConfig(
        vocab_size=200, hidden_size=64, num_attention_heads=4, num_l_layers=1,
        num_pano_layers=1, num_x_layers=2, image_feat_size=32,
        max_position_embeddings=64, use_lang2visn_attn=lang2visn)
    m = DualScaleVLNBert(cfg)
    batch = _randomized(dummy_step_batch(cfg, gmap_len=7, pano_len=5))
    params = m.init(jax.random.PRNGKey(0), batch)
    txt_embeds, _ = m.apply(params, batch["txt_ids"], batch["txt_masks"],
                            method=DualScaleVLNBert.language)
    nav_args = (txt_embeds, batch["txt_masks"], batch["gmap_img_embeds"],
                batch["gmap_step_ids"], batch["gmap_pos_fts"],
                batch["gmap_masks"], batch["gmap_visited_masks"],
                batch["gmap_pair_dists"], batch["vp_img_embeds"],
                batch["vp_pos_fts"], batch["vp_masks"], batch["vp_nav_masks"],
                batch["gmap_local_slot"], batch["vp_cand_visited"])
    o0 = m.apply(params, *nav_args, method=DualScaleVLNBert.navigation)
    kv = m.apply(params, txt_embeds, method=DualScaleVLNBert.text_cross_kv)
    n_hoisted = sum(x is not None for x in kv["global"])
    assert n_hoisted == (1 if lang2visn else cfg.num_x_layers)
    o1 = m.apply(params, *nav_args, txt_cross_kvs=kv,
                 method=DualScaleVLNBert.navigation)
    for key in ("gmap_embeds", "vp_embeds", "fused_logits", "cls_embeds"):
        np.testing.assert_array_equal(
            np.asarray(o0[key]), np.asarray(o1[key]),
            err_msg=f"text K/V hoist diverged on {key}")


def test_serving_knobs_stay_close():
    """The opt-in speed knobs (tanh gelu, in-dtype softmax) must keep
    outputs within approximation tolerance of the exact-parity defaults —
    they are serving knobs, not different models."""
    from dataclasses import replace

    base = ModelConfig(
        vocab_size=200, hidden_size=64, num_attention_heads=4, num_l_layers=1,
        num_pano_layers=1, num_x_layers=2, image_feat_size=32,
        max_position_embeddings=64)
    fast = replace(base, gelu_approximate=True,
                   softmax_compute_dtype_attn=True)
    m0, m1 = DualScaleVLNBert(base), DualScaleVLNBert(fast)
    batch = _randomized(dummy_step_batch(base, gmap_len=7, pano_len=5))
    params = m0.init(jax.random.PRNGKey(0), batch)
    o0, o1 = m0.apply(params, batch), m1.apply(params, batch)
    for key in ("cls_embeds", "gmap_embeds", "vp_embeds"):
        np.testing.assert_allclose(
            np.asarray(o0[key]), np.asarray(o1[key]), atol=5e-2,
            err_msg=f"serving knobs drifted too far on {key}")
    # valid action logits agree to approximation tolerance
    a, b = np.asarray(o0["fused_logits"]), np.asarray(o1["fused_logits"])
    mask = a > -1e8
    np.testing.assert_allclose(a[mask], b[mask], atol=5e-2)


def test_kd_heads_exist_and_project(model_and_params, small_cfg):
    model, params, batch = model_and_params
    outs = model.apply(params, batch)
    proj = model.apply(params, "txt_emb_w", outs["txt_embeds"],
                       method=DualScaleVLNBert.kd_project)
    assert proj.shape == outs["txt_embeds"].shape[:-1] + (small_cfg.kd_target_size,)
    w = model.apply(params, method=DualScaleVLNBert.kd_ability_weights)
    assert w.shape == (5,)
    np.testing.assert_allclose(np.asarray(w), np.ones(5), rtol=1e-3)


def test_dropout_rng_changes_train_outputs(model_and_params):
    model, params, batch = model_and_params
    o1 = model.apply(params, batch, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = model.apply(params, batch, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(o1["cls_embeds"]), np.asarray(o2["cls_embeds"]))


def test_critic():
    c = Critic(hidden_size=64)
    x = jnp.ones((3, 64))
    params = c.init(jax.random.PRNGKey(0), x)
    v = c.apply(params, x)
    assert v.shape == (3,)


def test_reference_flag_parsing():
    flags = {
        "train_kdl": True, "student_hidden_size": 256,
        "teacher_hidden_size": 768, "max_action_len": 15,
        "kdl_alpha": 0.5, "kd_ability_types": ["txt", "img"],
        "kdl_adaptive_ability_weight": True,
        "kdl_adaptive_ability_weight_type": "RW",
    }
    cfg = from_reference_flags(flags)
    assert cfg.model.hidden_size == 256
    assert cfg.model.num_attention_heads == 4
    assert cfg.model.kd_heads and cfg.model.kd_target_size == 768
    assert cfg.teacher_model.hidden_size == 768
    assert cfg.teacher_model.num_attention_heads == 12
    assert cfg.distill.ability_types == ("txt", "img")
    assert cfg.model.intermediate_size == 1024


def test_attn_logits_f32_noop_at_f32_and_close_at_bf16():
    """ModelConfig.attn_logits_f32 reads the attention logits from the MXU's
    f32 accumulator (preferred_element_type) instead of bf16-rounded scores
    converted back before the softmax.  At f32 compute dtype the accumulator
    IS the default result — bit-identical outputs (goldens safe); at bf16 it
    must stay within bf16 rounding of the default path (it is numerically
    CLOSER to the torch-f32 reference, never farther)."""
    from dataclasses import replace

    base = ModelConfig(
        vocab_size=200, hidden_size=64, num_attention_heads=4, num_l_layers=1,
        num_pano_layers=1, num_x_layers=2, image_feat_size=32,
        max_position_embeddings=64)
    acc = replace(base, attn_logits_f32=True)
    batch = _randomized(dummy_step_batch(base, gmap_len=7, pano_len=5))
    params = DualScaleVLNBert(base).init(jax.random.PRNGKey(0), batch)

    # f32 compute: exact no-op
    o0 = DualScaleVLNBert(base).apply(params, batch)
    o1 = DualScaleVLNBert(acc).apply(params, batch)
    for key in ("cls_embeds", "gmap_embeds", "fused_logits"):
        np.testing.assert_array_equal(np.asarray(o0[key]),
                                      np.asarray(o1[key]), err_msg=key)

    # bf16 compute: runs, finite, within bf16 rounding of the default path
    b0 = DualScaleVLNBert(base, dtype=jnp.bfloat16).apply(params, batch)
    b1 = DualScaleVLNBert(acc, dtype=jnp.bfloat16).apply(params, batch)
    a, b = np.asarray(b0["fused_logits"], np.float32), \
        np.asarray(b1["fused_logits"], np.float32)
    mask = a > -1e8
    assert np.all(np.isfinite(b[mask]))
    np.testing.assert_allclose(a[mask], b[mask], atol=0.15)
