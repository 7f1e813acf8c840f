import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_magic_tpu.config import EnvConfig, MagicConfig, ModelConfig, TrainConfig
from vln_magic_tpu.agent import Navigator, episodes_from_items
from vln_magic_tpu.env import make_synthetic_world
from vln_magic_tpu.env.synthetic import make_synthetic_instructions
from vln_magic_tpu.utils.debug import (NanGuard, assert_finite, grad_health,
                                       nonfinite_report, param_fingerprint)
from vln_magic_tpu.utils.profiling import StepTimer


@pytest.fixture(scope="module")
def setup():
    world = make_synthetic_world(num_scans=1, nodes_per_scan=16, feat_dim=16,
                                 seed=51)
    cfg = MagicConfig(
        model=ModelConfig(vocab_size=300, hidden_size=32,
                          num_attention_heads=2, num_l_layers=1,
                          num_pano_layers=1, num_x_layers=1,
                          image_feat_size=16, max_position_embeddings=64),
        env=EnvConfig(max_action_len=5, max_gmap_len=16, max_instr_len=32,
                      expert_policy="ndtw"),
        train=TrainConfig(batch_size=4),
    )
    nav = Navigator(cfg, world, rng=jax.random.PRNGKey(0))
    items = make_synthetic_instructions(world, 4, np.random.default_rng(8),
                                        vocab_size=300, min_path=3, max_path=5)
    return world, cfg, nav, items


def test_trajectory_buffer_tracks_expanded_path(setup):
    world, cfg, nav, items = setup
    state, aux = nav.run_items(items, feedback="teacher")
    tn = np.asarray(state.traj_nodes)
    tl = np.asarray(state.traj_len)
    for b, it in enumerate(items):
        walked = tn[b, : tl[b]].tolist()
        gt = list(np.asarray(it["path_idx"]))
        assert walked == gt, f"traj buffer {walked} != gt {gt}"


def test_ndtw_expert_points_toward_gt(setup):
    """At step 0 on the gt start, the nDTW expert should prefer the gt next
    hop over any neighbor strictly off the path."""
    world, cfg, nav, items = setup
    state = episodes_from_items(nav.tables, world, items,
                                nav.rollout.model_dims)
    gmap = nav.rollout.assemble_gmap(state, "student")
    scores = np.asarray(nav.rollout._ndtw_scores(state, gmap))
    token_node = np.asarray(gmap["token_node"])
    valid = np.asarray(gmap["token_valid"])
    a = np.asarray(nav.rollout.teacher_action(state, gmap, 0, imitation=False))
    for b, it in enumerate(items):
        gt = list(np.asarray(it["path_idx"]))
        assert a[b] >= 2
        chosen = token_node[b, a[b] - 2]
        g = world.graphs[it["scan_idx"]]
        # the chosen node's ndtw must be the max over eligible tokens
        vis = np.asarray(state.visited)[b]
        elig = valid[b] & ~vis[token_node[b]]
        assert scores[b, a[b] - 2] == pytest.approx(
            scores[b][elig].max(), rel=1e-5)


def test_ensemble_eval_runs(setup):
    world, cfg, nav, items = setup
    (avg1, _), p1 = nav.evaluate(items, batch_size=4, ensemble_n=1)
    (avg3, _), p3 = nav.evaluate(items, batch_size=4, ensemble_n=3)
    assert np.isfinite(avg3["nDTW"])


def test_nan_tools():
    tree = {"a": jnp.ones(3), "b": jnp.array([1.0, jnp.nan])}
    bad = nonfinite_report(tree)
    assert bad == ["b"]
    with pytest.raises(FloatingPointError, match="b"):
        assert_finite(tree, "test")
    h = grad_health({"g": jnp.array([3.0, 4.0])})
    assert float(h["grad_norm"]) == pytest.approx(5.0)
    assert int(h["grad_nonfinite"]) == 0

    guard = NanGuard()
    ok = guard(lambda x: x * 2)
    assert float(ok(jnp.ones(()))) == 2.0
    nanfn = guard(lambda x: x * jnp.nan)
    with pytest.raises(FloatingPointError):
        nanfn(jnp.ones(()))


def test_param_fingerprint_distinguishes():
    p1 = {"w": np.ones((2, 2), np.float32)}
    p2 = {"w": np.ones((2, 2), np.float32) * 2}
    assert param_fingerprint(p1) == param_fingerprint(p1)
    assert param_fingerprint(p1) != param_fingerprint(p2)


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(3):
        with t:
            pass
    assert t.mean >= 0 and t.count == 3


def test_grad_ability_weights(setup):
    """update_ability_grads produces 5 finite magnitudes and the grad-mode
    training step consumes them."""
    import dataclasses

    world, cfg, nav, items = setup
    from vln_magic_tpu.agent.trainer import Trainer
    from vln_magic_tpu.config import DistillConfig

    cfg2 = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, kd_heads=True, kd_target_size=48),
        teacher_model=dataclasses.replace(cfg.model, hidden_size=48),
        env=dataclasses.replace(cfg.env, expert_policy="spl"),
        train=dataclasses.replace(cfg.train, train_alg="imitation", lr=1e-4),
        distill=DistillConfig(train_kdl=True, adaptive_ability_weight=True,
                              adaptive_ability_weight_type="grad"),
    )
    tr = Trainer(cfg2, world)
    g = tr.update_ability_grads(items)
    assert g.shape == (5,) and np.isfinite(g).all() and (g >= 0).all()
    m = tr.train_step(items)
    assert np.isfinite(m["loss"])


def test_a2c_branch_trains(setup):
    import dataclasses

    world, cfg, nav, items = setup
    from vln_magic_tpu.agent.trainer import Trainer

    cfg2 = dataclasses.replace(
        cfg,
        env=dataclasses.replace(cfg.env, expert_policy="spl"),
        train=dataclasses.replace(cfg.train, train_alg="a2c", lr=1e-4,
                                  ml_weight=0.2),
    )
    tr = Trainer(cfg2, world)
    c_before = np.asarray(
        jax.tree_util.tree_leaves(tr.critic_params)[0]).copy()
    m = tr.train_step(items)
    assert np.isfinite(m["loss"]) and "rl/loss" in m
    c_after = np.asarray(jax.tree_util.tree_leaves(tr.critic_params)[0])
    assert not np.array_equal(c_before, c_after), "critic must update"


def test_trainer_save_load_roundtrip(setup, tmp_path):
    import dataclasses

    world, cfg, nav, items = setup
    from vln_magic_tpu.agent.trainer import Trainer

    cfg2 = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, expert_policy="spl"),
        train=dataclasses.replace(cfg.train, train_alg="imitation", lr=1e-4))
    tr = Trainer(cfg2, world)
    tr.train_step(items)
    p = str(tmp_path / "latest.pt")
    tr.save(p, save_optimizer=True)
    tr2 = Trainer(cfg2, world, rng=jax.random.PRNGKey(123))
    epoch, missing, unexpected = tr2.load(p, resume_optimizer=True)
    assert epoch == 1 and not missing and not unexpected
    a = jax.tree_util.tree_leaves(tr.params)[0]
    b = jax.tree_util.tree_leaves(tr2.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dist_utils_single_process():
    from vln_magic_tpu.utils.dist import (gather_predictions,
                                          merge_dist_results, shard_items)

    preds = [{"instr_id": "a"}, {"instr_id": "b"}]
    assert gather_predictions(preds) == preds
    merged = merge_dist_results([[{"instr_id": "a"}], [{"instr_id": "a"},
                                                      {"instr_id": "c"}]])
    assert [p["instr_id"] for p in merged] == ["a", "c"]
    items = list(range(10))
    shards = [shard_items(items, 3, i) for i in range(3)]
    assert sum(len(s) for s in shards) == 10
    assert shards[2][-1] == 9
