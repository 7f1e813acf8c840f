"""Reference flag-surface compatibility: the public args format
(BASELINE.md) means the reference's own scripts must parse AND their flags
must actually fire — not vanish into parse_known_args."""

import numpy as np
import pytest

from vln_magic_tpu.cli.main_nav import parse_args
from vln_magic_tpu.config import from_reference_flags


# the flag block of the reference's run_r2r_kdl_valid.sh, paths dummied
KDL_VALID_FLAGS = (
    "--root_dir /nonexistent --dataset r2r --output_dir /tmp/flags_out "
    "--world_size 1 --seed 0 --tokenizer roberta --name flagtest "
    "--mode valid --enc_full_graph --graph_sprels --fusion dynamic "
    "--expert_policy spl --train_alg dagger --num_l_layers 6 "
    "--num_x_layers 3 --num_pano_layers 2 --max_action_len 15 "
    "--max_instr_len 200 --batch_size 16 --lr 4e-5 --iters 100000 "
    "--log_every 1000 --optim adamW --features clip768 "
    "--image_feat_size 768 --angle_feat_size 4 --ml_weight 0.2 "
    "--feat_dropout 0.3 --dropout 0.1 --gamma 0. "
    "--cat_file /nonexistent/category_mapping.tsv --adaptive_pano_fusion "
    "--do_back_txt --do_back_img --do_back_txt_type type_2 "
    "--do_back_imgobj_type type_1 --do_add_method door --z_instr_update "
    "--do_front_txt --do_front_img --do_front_his --front_n_clusters 24 "
    "--train_kdl --kdl_temperature 2 --kdl_alpha 0.5 "
    "--kdl_feat_loss mse --kdl_attn_loss mse --kdl_logit_loss kd "
    "--kdl_dkd_alpha 1 --kdl_dkd_beta 4 --teacher_hidden_size 768 "
    "--teacher_num_l_layers 6 --teacher_num_pano_layers 2 "
    "--teacher_num_x_layers 3 --teacher_mlp_ratio 4 "
    "--student_num_l_layers 6 --student_num_x_layers 3 "
    "--student_num_pano_layers 2 --student_hidden_size 384 "
    "--student_mlp_ratio 4 --kdl_adaptive_ability_weight "
    "--kdl_adaptive_ability_weight_type RW --rw_temp 4 "
    "--teacher_sample_hard_mining --t_sample_preprocess exp "
    "--t_sample_preprocess_exp_decay 0.7 --submit"
).split()


def test_reference_valid_script_flags_land():
    args = parse_args(KDL_VALID_FLAGS)
    cfg = from_reference_flags(vars(args))
    assert cfg.model.fusion == "dynamic"
    assert cfg.model.hidden_size == 384 and cfg.model.num_l_layers == 6
    assert cfg.teacher_model.hidden_size == 768
    assert cfg.teacher_model.num_attention_heads == 12
    assert cfg.model.image_feat_size == 768
    assert cfg.distill.train_kdl and cfg.distill.rw_temp == 4.0
    assert cfg.distill.temperature == 2.0 and cfg.distill.dkd_beta == 4.0
    assert cfg.train.feat_dropout == pytest.approx(0.3)
    assert cfg.train.gamma == 0.0
    assert cfg.model.do_back_txt and cfg.model.do_front_his
    assert cfg.env.max_action_len == 15


def test_per_role_dims_and_aliases():
    args = parse_args(
        "--mode valid --name a --output_dir /tmp/flags_out "
        "--student_hidden_size 128 --student_num_l_layers 2 "
        "--teacher_intermediate_size 1536 --teacher_hidden_size 768 "
        "--featdropout 0.33 --decay 0.01 --fusion avg --loadOptim".split())
    cfg = from_reference_flags(vars(args))
    assert cfg.model.num_l_layers == 2 and cfg.model.hidden_size == 128
    # intermediate_size spells mlp_ratio: 1536 // 768 = 2
    assert cfg.teacher_model is None or cfg.teacher_model.mlp_ratio == 2
    assert cfg.train.feat_dropout == pytest.approx(0.33)  # legacy alias
    assert cfg.model.fusion == "avg" and not cfg.model.glocal_fuse
    assert args.resume_optimizer  # --loadOptim alias


@pytest.fixture(scope="module")
def world():
    from vln_magic_tpu.env import make_synthetic_world

    return make_synthetic_world(num_scans=1, nodes_per_scan=14, feat_dim=16,
                                seed=31)


@pytest.fixture(scope="module")
def items(world):
    from vln_magic_tpu.env.synthetic import make_synthetic_instructions

    return make_synthetic_instructions(world, 8, np.random.default_rng(2),
                                       vocab_size=300, min_path=2, max_path=4)


def _cfg(world, **model_kw):
    from vln_magic_tpu.config import (EnvConfig, MagicConfig, ModelConfig,
                                      TrainConfig)

    env_kw = {k: model_kw.pop(k) for k in
              ("act_visited_nodes", "expl_max_ratio") if k in model_kw}
    train_kw = {k: model_kw.pop(k) for k in
                ("fix_lang_embedding", "fix_local_branch",
                 "fix_pano_embedding") if k in model_kw}
    return MagicConfig(
        model=ModelConfig(vocab_size=300, hidden_size=32,
                          num_attention_heads=2, num_l_layers=1,
                          num_pano_layers=1, num_x_layers=1,
                          image_feat_size=16, max_position_embeddings=80,
                          **model_kw),
        env=EnvConfig(max_instr_len=32, max_action_len=4, max_gmap_len=16,
                      **env_kw),
        train=TrainConfig(batch_size=4, lr=1e-3, train_alg="imitation",
                          **train_kw),
    )


@pytest.mark.parametrize("fusion", ["global", "local", "avg"])
def test_fusion_modes_navigate(world, items, fusion):
    """--fusion global/local/avg actually changes the policy source and
    still produces valid trajectories (reference parser.py:16; local swaps
    the action space to viewpoint candidates, agent.py:1044)."""
    from vln_magic_tpu.agent import Navigator

    nav = Navigator(_cfg(world, fusion=fusion), world)
    (avg, _), preds = nav.evaluate(items, batch_size=4)
    assert np.isfinite(avg["sr"]) and np.isfinite(avg["nDTW"])
    for p in preds:
        # every hop in the predicted trajectory is a real graph move
        g = world.graphs[p["scan_idx"]]
        path = [i for seg in p["trajectory_idx"] for i in seg]
        for a, b in zip(path[:-1], path[1:]):
            assert a == b or g.adjacency[a, b], (a, b)


def test_fusion_local_trains(world, items):
    from vln_magic_tpu.agent.trainer import Trainer

    tr = Trainer(_cfg(world, fusion="local"), world)
    first = tr.train_step(items[:4])
    for _ in range(7):
        m = tr.train_step(items[:4])
    assert np.isfinite(m["loss"]) and m["loss"] < first["loss"]


def test_act_visited_nodes_keeps_nodes_selectable(world, items):
    from vln_magic_tpu.agent import Navigator

    nav = Navigator(_cfg(world, act_visited_nodes=True), world)
    (avg, _), preds = nav.evaluate(items, batch_size=4)
    assert np.isfinite(avg["sr"])


def test_expl_sample_feedback_runs(world, items):
    """expl_sample used to crash: EnvConfig had no expl_max_ratio."""
    from vln_magic_tpu.agent import Navigator

    nav = Navigator(_cfg(world, expl_max_ratio=0.5), world)
    state, aux = nav.run_items(items[:4], feedback="expl_sample")
    assert np.asarray(aux["actions"]).shape[1] == 4


def test_fix_flags_freeze_parameters(world, items):
    from flax import traverse_util

    from vln_magic_tpu.agent.trainer import Trainer

    tr = Trainer(_cfg(world, fix_lang_embedding=True,
                      fix_pano_embedding=True), world)
    before = traverse_util.flatten_dict(
        __import__("jax").tree_util.tree_map(np.asarray, tr.params))
    for _ in range(3):
        tr.train_step(items[:4])
    after = traverse_util.flatten_dict(
        __import__("jax").tree_util.tree_map(np.asarray, tr.params))
    frozen = changed = 0
    for k in before:
        name = "/".join(str(p) for p in k)
        same = np.array_equal(before[k], after[k])
        if ("lang_encoder" in name and ("embeddings" in name
                                        or "emb_norm" in name)) \
                or "pano_encoder" in name:
            assert same, f"frozen param {name} changed"
            frozen += 1
        elif not same:
            changed += 1
    assert frozen > 0 and changed > 0


def test_backdoor_tsv_roundtrip(tmp_path):
    from vln_magic_tpu.agent.interventions import (Zdict, load_backdoor_tsv,
                                                   save_backdoor_tsv)

    rng = np.random.default_rng(0)
    dicts = {
        "direction": Zdict(rng.standard_normal((3, 8)).astype(np.float32),
                           np.array([0.5, 0.3, 0.2]),
                           ["left", "right", "forward"]),
        "landmark": Zdict(rng.standard_normal((2, 8)).astype(np.float32),
                          np.array([0.6, 0.4]), ["table", "door"]),
    }
    p = str(tmp_path / "zdict.tsv")
    save_backdoor_tsv(p, dicts)
    loaded = load_backdoor_tsv(p, 8)
    for kind in ("direction", "landmark"):
        assert loaded[kind].keys == dicts[kind].keys
        np.testing.assert_allclose(loaded[kind].features,
                                   dicts[kind].features, rtol=1e-6)
    # prefix-less rows (reference-written dicts) classify by word list
    import base64, csv

    q = str(tmp_path / "ref_style.tsv")
    with open(q, "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        for word in ("left", "sofa"):
            w.writerow([word, 0.5, base64.b64encode(
                np.ones(8, np.float32).tobytes()).decode()])
    loaded = load_backdoor_tsv(q, 8)
    assert loaded["direction"].keys == ["left"]
    assert loaded["landmark"].keys == ["sofa"]


def test_reference_pretrain_json_schema_lands():
    """The reference pretrain JSON (r2r_magic_pretrain.json schema: nested
    kdl block with its own key spellings, train_datasets tasks/mix_ratio
    lists) translates into the config tree."""
    from vln_magic_tpu.cli.train_pretrain import reference_pretrain_flags

    blob = {
        "train_batch_size": 48, "learning_rate": 5e-5,
        "num_train_steps": 200000, "warmup_steps": 10000,
        "grad_norm": 5.0, "max_txt_len": 200, "optim": "adamw",
        "weight_decay": 0.01, "seed": 0,
        "train_datasets": {"R2R": {"tasks": ["mlm", "sap", "cfp"],
                                   "mix_ratio": [1, 2, 1]}},
        "kdl": {"knowledge_distillation": True, "train_teacher": False,
                "kd_alpha": 0.5, "kd_temperature": 2, "kd_loss": "mse",
                "kdl_attn_loss": "mse", "kdl_logits_loss": "kd",
                "kdl_adaptive_ability_weight": True,
                "kdl_adaptive_ability_weight_type": "RW", "rw_temp": 4,
                "teacher_sample_hard_mining": True,
                "t_sample_preprocess": "exp",
                "t_sample_preprocess_exp_decay": 0.7},
    }
    flags, ratios = reference_pretrain_flags(blob)
    assert ratios == {"mlm": 1, "sap": 2, "cfp": 1}
    cfg = from_reference_flags(flags)
    assert cfg.distill.train_kdl and not cfg.distill.train_teacher
    assert cfg.distill.alpha == 0.5 and cfg.distill.temperature == 2
    assert cfg.distill.logit_loss == "kd" and cfg.distill.rw_temp == 4
    assert cfg.distill.teacher_sample_hard_mining
    assert cfg.train.lr == 5e-5 and cfg.train.iters == 200000
    assert cfg.train.warmup_iters == 10000 and cfg.train.grad_clip == 5.0
    assert cfg.train.weight_decay == 0.01
    assert cfg.env.max_instr_len == 200
