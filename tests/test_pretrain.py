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
    hist = tr.fit(items, iters=4)
    tasks = {h["task"] for h in hist}
    assert tasks <= {"mlm", "sap", "cfp"}
    assert all(np.isfinite(h["loss"]) for h in hist)
    assert all("kd" in h for h in hist)
    val = tr.validate(items, num_batches=1)
    for k in ("mlm_acc", "sap_gacc", "sap_lacc", "sap_facc", "cfp_acc"):
        assert k in val and 0.0 <= val[k] <= 1.0


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
