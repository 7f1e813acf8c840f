import numpy as np
import pytest

from vln_magic_tpu.config import (DistillConfig, EnvConfig, MagicConfig,
                                  ModelConfig, TrainConfig)
from vln_magic_tpu.env import make_synthetic_world
from vln_magic_tpu.env.synthetic import make_synthetic_instructions
from vln_magic_tpu.pretrain.tasks import PathDataBuilder, mlm_mask
from vln_magic_tpu.pretrain.trainer import PretrainTrainer


def _cfg(kdl=False):
    mk = lambda h, heads, kd=False, t=48: ModelConfig(
        vocab_size=300, hidden_size=h, num_attention_heads=heads,
        num_l_layers=1, num_pano_layers=1, num_x_layers=1, image_feat_size=16,
        max_position_embeddings=80, kd_heads=kd, kd_target_size=t)
    return MagicConfig(
        model=mk(32, 2, kd=kdl),
        teacher_model=mk(48, 2) if kdl else None,
        env=EnvConfig(max_instr_len=32),
        train=TrainConfig(batch_size=4, lr=3e-4),
        distill=DistillConfig(train_kdl=kdl, alpha=0.5),
    )


@pytest.fixture(scope="module")
def world():
    return make_synthetic_world(num_scans=1, nodes_per_scan=14, feat_dim=16,
                                seed=21)


@pytest.fixture(scope="module")
def items(world):
    return make_synthetic_instructions(world, 12, np.random.default_rng(4),
                                       vocab_size=300, min_path=2, max_path=4)


def test_mlm_mask_properties():
    rng = np.random.default_rng(0)
    toks = np.array([[0, 10, 11, 12, 13, 14, 15, 16, 17, 2]] * 8)
    masked, labels = mlm_mask(toks, rng, mask_token=3, vocab_size=300)
    sel = labels != -100
    assert sel.any()
    # specials never masked
    assert (labels[:, 0] == -100).all() and (labels[:, -1] == -100).all()
    # labels store original tokens
    assert (toks[sel] == labels[sel]).all()


def test_path_builder_shapes_and_labels(world, items):
    b = PathDataBuilder(world, max_steps=6, max_gmap=20, max_txt=32,
                        vocab_size=300)
    batch = b.sap_batch(items[:4])
    B, S, P = 4, 6, world.tables.max_candidates + 36
    assert batch["traj_view_fts"].shape == (B, S, P, 16)
    assert batch["gmap_masks"].shape == (B, 20)
    # mem token conventions match the navigator
    assert (~batch["gmap_masks"][:, 1]).all()
    assert batch["gmap_visited_masks"][:, 1].all()
    # sap labels point at real tokens or stop
    for i in range(B):
        g = batch["sap_global_label"][i]
        assert g == 0 or (g >= 2 and batch["gmap_masks"][i, g])


def test_full_path_ends_with_stop_label(world, items):
    b = PathDataBuilder(world, max_steps=6, max_gmap=20, max_txt=32,
                        vocab_size=300)
    batch = b.collate(items[:4], end_steps=[len(it["path_idx"]) - 1
                                            for it in items[:4]])
    assert (batch["sap_global_label"] == 0).all()
    assert (batch["sap_local_label"] == 0).all()


def test_pretrain_training_reduces_loss(world, items):
    cfg = _cfg()
    tr = PretrainTrainer(cfg, world, image_prob_size=50,
                         builder_kwargs=dict(max_steps=5, max_gmap=16,
                                             max_txt=32))
    batch = tr.builder.sap_batch(items[:4])
    batch = tr._fill("sap", batch)
    first = tr.train_step("sap", batch)
    for _ in range(9):
        last = tr.train_step("sap", batch)
    assert np.isfinite(first["loss"]) and last["loss"] < first["loss"]


def test_pretrain_meta_loop_and_validate(world, items):
    cfg = _cfg(kdl=True)
    tr = PretrainTrainer(cfg, world, image_prob_size=50,
                         builder_kwargs=dict(max_steps=5, max_gmap=16,
                                             max_txt=32))
    hist = tr.fit(items, iters=5)
    tasks = {h["task"] for h in hist}
    assert tasks <= {"mlm", "mrc", "sap", "cfp"}
    assert all(np.isfinite(h["loss"]) for h in hist)
    assert all("kd" in h for h in hist)
    val = tr.validate(items, num_batches=1)
    for k in ("mlm_acc", "mrc_acc", "sap_gacc", "sap_lacc", "sap_facc",
              "cfp_acc"):
        assert k in val and 0.0 <= val[k] <= 1.0


def test_mrc_task_trains_and_converges(world, items):
    """MRC reachable end-to-end from the training loop (the reference wires
    an MRC dataloader + validate_mrc, train_r2r_magic.py:50-52,419-420,476)."""
    cfg = _cfg()
    tr = PretrainTrainer(cfg, world, image_prob_size=50,
                         builder_kwargs=dict(max_steps=5, max_gmap=16,
                                             max_txt=32))
    hist = tr.fit(items, iters=6, task_ratios={"mrc": 1})
    assert {h["task"] for h in hist} == {"mrc"}
    assert all(np.isfinite(h["loss"]) for h in hist)
    batch = tr._fill("mrc", tr.builder.mrc_batch(items[:4]))
    m1 = tr.train_step("mrc", batch)
    for _ in range(9):
        m = tr.train_step("mrc", batch)
    assert m["loss"] < m1["loss"]
    assert 0.0 <= m["mrc_acc"] <= 1.0


def test_og_task(world, items):
    cfg = _cfg()
    tr = PretrainTrainer(cfg, world, image_prob_size=50,
                         builder_kwargs=dict(max_steps=5, max_gmap=16,
                                             max_txt=32))
    batch = tr.builder.og_batch(items[:4])
    batch = tr._fill("og", batch)
    m1 = tr.train_step("og", batch)
    for _ in range(9):
        m = tr.train_step("og", batch)
    assert np.isfinite(m["loss"]) and m["loss"] < m1["loss"]
    assert 0.0 <= m["og_acc"] <= 1.0


def test_endpoint_sampling_scheme(world, items):
    """Reference endpoint draws (tasks.py:203-211,343-351; dataset.py
    get_input): SAP mixes pos 0.2 / neg 0.8; pos ends at the gt endpoint
    with stop labels, negs end mid-path with next-hop labels."""
    b = PathDataBuilder(world, max_steps=6, max_gmap=24, max_txt=32,
                        vocab_size=300, seed=7)
    types = b._sample_end_types(4000, 0.2, neg_in_gt_ratio=0.6)
    frac = {t: types.count(t) / len(types) for t in set(types)}
    assert frac["pos"] == pytest.approx(0.2, abs=0.03)
    assert frac["neg_in_gt_path"] == pytest.approx(0.4, abs=0.03)
    assert frac["neg_others"] == pytest.approx(0.4, abs=0.03)

    it = items[0]
    k = len(it["path_idx"])
    row = b.build_item(it, end_vp_type="pos")
    assert int(row["final_step"]) == k - 1
    assert int(row["sap_global_label"]) == 0 and int(row["sap_local_label"]) == 0
    # negatives end strictly before the endpoint and supervise the next hop
    for _ in range(8):
        row = b.build_item(it, end_vp_type="neg_in_gt_path")
        s = int(row["final_step"])
        assert s < k - 1
        g = int(row["sap_global_label"])
        nxt = int(it["path_idx"][s + 1])
        assert g != 0   # never labeled stop
        if g != -100:
            assert int(row["gmap_src_step"][g] >= 0)
    # R2R collapses neg_others to neg_in_gt_path (R2RTextPathData override)
    row = b.build_item(it, end_vp_type="neg_others")
    assert int(row["final_step"]) < k - 1


def test_reverie_endpoint_sampling(world, items):
    """REVERIE items (pos_vps) sample pos endpoints from pos_vps, take
    off-path neg_others with shortest-path trajectories, and use the
    SPL-expert labels (dataset.py:322-346,359-372)."""
    b = PathDataBuilder(world, max_steps=6, max_gmap=24, max_txt=32,
                        vocab_size=300, seed=3)
    it = dict(items[0])
    goal = int(it["path_idx"][-1])
    it["pos_vps_idx"] = [goal]
    row = b.build_item(it, end_vp_type="pos")
    assert int(row["sap_global_label"]) == 0
    seen_offpath = False
    for _ in range(10):
        row = b.build_item(it, end_vp_type="neg_others")
        g = int(row["sap_global_label"])
        assert g != 0  # endpoint is off the pos set
        seen_offpath = True
    assert seen_offpath


def test_envedit_coin_flip(world, items):
    aug = np.asarray(world.tables.features) + 100.0
    b = PathDataBuilder(world, max_steps=6, max_gmap=24, max_txt=32,
                        vocab_size=300, seed=11, aug_features=aug)
    rows = [b.build_item(items[0], end_vp_type="pos") for _ in range(10)]
    # per-step per-fetch coin flip: across rows/steps both the original
    # (max < 50) and augmented (shifted by +100) features must appear
    step_maxes = [float(r["traj_view_fts"][s].max())
                  for r in rows for s in range(int(r["final_step"]) + 1)]
    assert any(m > 50 for m in step_maxes)
    assert any(m < 50 for m in step_maxes)


def test_sap_training_still_converges(world, items):
    cfg = _cfg()
    tr = PretrainTrainer(cfg, world,
                         builder_kwargs=dict(max_steps=6, max_gmap=24))
    losses = []
    for i in range(12):
        batch = tr.builder.sap_batch(items[:4])
        batch = tr._fill("sap", batch)
        losses.append(tr.train_step("sap", batch)["loss"])
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


def test_reverie_object_ingestion(world):
    """End-to-end REVERIE object grounding: store -> builder -> labels.
    Labels are the gt objId's index among the endpoint's objects
    (get_obj_label, reference dataset.py:307-319), -100 when absent."""
    from vln_magic_tpu.data import HashObjectStore
    from vln_magic_tpu.env.synthetic import make_synthetic_reverie_items

    store = HashObjectStore(obj_feat_size=16, max_objects=6, seed=5)
    items = make_synthetic_reverie_items(
        world, 12, np.random.default_rng(8), store, vocab_size=300,
        min_path=2, max_path=4)
    assert all("pos_vps_idx" in it and "objId" in it for it in items)

    b = PathDataBuilder(world, max_steps=6, max_gmap=24, max_txt=32,
                        vocab_size=300, seed=2, obj_db=store)
    batch = b.og_batch(items[:8])
    B, M = 8, 6
    assert batch["obj_fts"].shape == (B, M, 16)
    assert batch["obj_loc_fts"].shape == (B, M, b.afs + 3)
    labeled = absent = 0
    for i in range(B):
        lab = int(batch["og_labels"][i])
        if lab == -100:
            absent += 1
            continue
        labeled += 1
        assert batch["obj_masks"][i, lab]
        # the label indexes the gt object: re-fetch and compare features
        it = items[i]
        g = world.graphs[it["scan_idx"]]
        vp = g.node_ids[int(batch["end_node"][i])]
        fts, attrs = store.get(g.scan, vp)
        assert attrs["obj_ids"][lab] == it["objId"]
        np.testing.assert_allclose(batch["obj_fts"][i, lab], fts[lab])
    assert labeled >= 1   # most items ground a real object


def test_soon_mode(world):
    """SOON-variant semantics (reference SoonTextPathData, pretrain_src/
    data/dataset.py:775-816): 'pos' endpoints are the annotated gt path end
    even when pos_vps exist, labels come from obj_pseudo_label (clamped to
    -100 past the object budget), boxes normalize by 600x600."""
    from vln_magic_tpu.data import HashObjectStore
    from vln_magic_tpu.env.synthetic import make_synthetic_reverie_items

    store = HashObjectStore(obj_feat_size=16, max_objects=6, seed=5)
    items = make_synthetic_reverie_items(
        world, 10, np.random.default_rng(8), store, vocab_size=300,
        min_path=2, max_path=4)
    for j, it in enumerate(items):
        it["obj_pseudo_label"] = {"idx": j}   # 0..9; >=6 must become -100

    b = PathDataBuilder(world, max_steps=6, max_gmap=24, max_txt=32,
                        vocab_size=300, seed=2, obj_db=store).soon_mode()
    assert b.obj_image_wh == (600.0, 600.0)
    # pos endpoint = gt path end, not a pos_vps sample
    for it in items[:4]:
        path, end_step, _ = b.sample_endpoint(it, "pos")
        gt = [int(v) for v in np.asarray(it["path_idx"])]
        assert path == gt and end_step == len(gt) - 1
    # REVERIE negatives still work under soon_mode
    path, end_step, pos_set = b.sample_endpoint(items[0], "neg_others")
    assert path[end_step] not in pos_set

    batch = b.og_batch(items[:10])
    for i in range(10):
        expect = i if i < 6 else -100
        assert int(batch["og_labels"][i]) == expect


def test_reverie_og_pretraining_converges(world):
    from vln_magic_tpu.data import HashObjectStore
    from vln_magic_tpu.env.synthetic import make_synthetic_reverie_items

    store = HashObjectStore(obj_feat_size=16, max_objects=5, seed=9)
    items = make_synthetic_reverie_items(
        world, 10, np.random.default_rng(3), store, vocab_size=300,
        min_path=2, max_path=4)
    cfg = _cfg()
    tr = PretrainTrainer(cfg, world, image_prob_size=50,
                         builder_kwargs=dict(max_steps=5, max_gmap=16,
                                             max_txt=32, obj_db=store))
    batch = tr._fill("og", tr.builder.og_batch(items[:4]))
    m1 = tr.train_step("og", batch)
    for _ in range(9):
        m = tr.train_step("og", batch)
    assert np.isfinite(m["loss"]) and m["loss"] < m1["loss"]
    # og joins the task mix and the validators when an obj_db is attached
    hist = tr.fit(items, iters=6)
    assert {h["task"] for h in hist} <= {"mlm", "mrc", "sap", "cfp", "og"}
    val = tr.validate(items, num_batches=1)
    assert "og_acc" in val and 0.0 <= val["og_acc"] <= 1.0


def test_pretrain_gradient_accumulation(world, items):
    """gradient_accumulation_steps: k micro-steps apply once on the averaged
    gradients (reference MetaLoader accum_steps, loader.py:22-55), and the
    MetaLoader holds the task fixed within each accumulation window."""
    import dataclasses

    from vln_magic_tpu.pretrain.loader import MetaLoader
    from vln_magic_tpu.utils.checkpoint import flatten_params

    # identical micro-batches + no dropout -> accumulated == big-batch step
    base = _cfg()
    model = dataclasses.replace(base.model, hidden_dropout=0.0,
                                attention_dropout=0.0)
    mk = lambda accum: dataclasses.replace(
        base, model=model,
        train=dataclasses.replace(base.train, accum_steps=accum,
                                  optim="sgd", lr=1e-3))
    bk = dict(max_steps=5, max_gmap=16, max_txt=32)

    acc = PretrainTrainer(mk(2), world, image_prob_size=50, builder_kwargs=bk)
    batch = acc._fill("sap", acc.builder.sap_batch(items[:4]))
    p0 = flatten_params(acc.params)
    acc.train_step("sap", batch)
    mid = flatten_params(acc.params)
    for k in p0:
        np.testing.assert_array_equal(p0[k], mid[k])
    acc.train_step("sap", batch)
    p_acc = flatten_params(acc.params)

    big = PretrainTrainer(mk(1), world, image_prob_size=50, builder_kwargs=bk)
    dbl = {k: np.concatenate([np.asarray(v)] * 2, axis=0)
           for k, v in batch.items()}
    big.train_step("sap", dbl)
    p_big = flatten_params(big.params)
    for k in p0:
        np.testing.assert_allclose(p_acc[k], p_big[k], atol=2e-5, err_msg=k)

    # MetaLoader task windows
    ml = MetaLoader({"a": lambda: {}, "b": lambda: {}}, seed=0, accum_steps=3)
    seq = [next(ml)[0] for _ in range(12)]
    for i in range(0, 12, 3):
        assert len(set(seq[i:i + 3])) == 1
    assert len(set(seq)) == 2   # both tasks eventually drawn
