import jax
import numpy as np
import pytest

from vln_magic_tpu.agent import Navigator
from vln_magic_tpu.agent.interventions import (
    KMeansPicker, WordPicker, Zdict, extract_cfp_features, load_cfp_tsv,
    save_cfp_tsv, update_backdoor_dict)
from vln_magic_tpu.config import EnvConfig, MagicConfig, ModelConfig, TrainConfig
from vln_magic_tpu.env import make_synthetic_world
from vln_magic_tpu.env.synthetic import make_synthetic_instructions
from vln_magic_tpu.pretrain.tasks import PathDataBuilder


@pytest.fixture(scope="module")
def setup():
    world = make_synthetic_world(num_scans=1, nodes_per_scan=16, feat_dim=16,
                                 seed=31)
    cfg = MagicConfig(
        model=ModelConfig(vocab_size=300, hidden_size=32,
                          num_attention_heads=2, num_l_layers=1,
                          num_pano_layers=1, num_x_layers=1,
                          image_feat_size=16, max_position_embeddings=64,
                          do_back_txt=True, do_front_txt=True,
                          do_front_img=True, do_front_his=True,
                          kd_heads=True, kd_target_size=48),
        env=EnvConfig(max_action_len=5, max_gmap_len=16, max_instr_len=32),
        train=TrainConfig(batch_size=4),
    )
    nav = Navigator(cfg, world, rng=jax.random.PRNGKey(0))
    items = make_synthetic_instructions(world, 8, np.random.default_rng(5),
                                        vocab_size=300, min_path=2, max_path=4)
    for i, it in enumerate(items):
        it["instruction"] = f"walk forward past the table then turn left item{i}"
    return world, cfg, nav, items


def test_word_picker():
    p = WordPicker()
    lm, dr = p.pick("walk forward past the large table".split())
    words = "walk forward past the large table".split()
    assert all(words[i].lower() in p.direction_words for i in dr)
    assert 1 in dr and 2 in dr           # forward, past
    assert any(words[i] == "table" for i in lm)


def test_update_backdoor_dict(setup):
    world, cfg, nav, items = setup
    zd = update_backdoor_dict(nav, items, WordPicker(), batch_size=4,
                              max_entries=10)
    assert set(zd) == {"landmark", "direction"}
    d = zd["direction"]
    assert d.features.shape[1] == cfg.model.hidden_size
    assert d.pzs.sum() == pytest.approx(1.0, rel=1e-4)
    assert "forward" in d.keys and "left" in d.keys


def test_zdict_tsv_roundtrip(tmp_path, setup):
    world, cfg, nav, items = setup
    zd = update_backdoor_dict(nav, items, WordPicker(), batch_size=4,
                              max_entries=6)
    p = str(tmp_path / "z.tsv")
    zd["direction"].save_tsv(p)
    back = Zdict.load_tsv(p, cfg.model.hidden_size)
    np.testing.assert_allclose(back.features, zd["direction"].features,
                               rtol=1e-6)
    assert back.keys == zd["direction"].keys


def test_extract_cfp_and_kmeans(tmp_path, setup):
    world, cfg, nav, items = setup
    builder = PathDataBuilder(world, max_steps=5,
                              max_gmap=cfg.env.max_gmap_len, max_txt=32,
                              vocab_size=300)
    feats, ids = extract_cfp_features(nav, items, builder, batch_size=4)
    assert set(feats) == {"txt", "gmap", "vp"}
    assert feats["txt"].shape == (8, cfg.model.kd_target_size)
    # unit norm
    np.testing.assert_allclose(np.linalg.norm(feats["txt"], axis=1), 1.0,
                               rtol=1e-4)
    p = str(tmp_path / "cfp.tsv")
    save_cfp_tsv(p, feats, ids)
    loaded, lids = load_cfp_tsv(p, cfg.model.kd_target_size)
    np.testing.assert_allclose(loaded["vp"], feats["vp"], rtol=1e-6)
    assert lids == ids

    picker = KMeansPicker(feats, n_clusters=4, seed=0)
    front = picker.random_pick_front_features(np.random.default_rng(0))
    assert front["txt"].shape == (4, cfg.model.kd_target_size)


def test_rollout_with_zdicts(setup):
    world, cfg, nav, items = setup
    zd = update_backdoor_dict(nav, items, WordPicker(), batch_size=4,
                              max_entries=6)
    builder = PathDataBuilder(world, max_steps=5,
                              max_gmap=cfg.env.max_gmap_len, max_txt=32,
                              vocab_size=300)
    feats, _ = extract_cfp_features(nav, items, builder, batch_size=4)
    front = KMeansPicker(feats, 4).random_pick_front_features(
        np.random.default_rng(0))
    zdicts = {"student": {
        "instr_zdict": {
            "direction_features": zd["direction"].features,
            "direction_pzs": zd["direction"].pzs,
            "landmark_features": zd["landmark"].features,
            "landmark_pzs": zd["landmark"].pzs,
        },
        "front_txt_feats": front["txt"],
        "front_vp_feats": front["vp"],
        "front_gmap_feats": front["gmap"],
    }}
    (avg, _), preds = nav.evaluate(items, batch_size=4, zdicts=zdicts)
    assert np.isfinite(avg["nDTW"])
    (avg0, _), preds0 = nav.evaluate(items, batch_size=4)
    # interventions actually flow through the forward pass
    assert any(p1["trajectory_idx"] != p0["trajectory_idx"]
               for p1, p0 in zip(preds, preds0)) or avg != avg0
