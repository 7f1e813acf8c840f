import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_magic_tpu.config import EnvConfig, MagicConfig, ModelConfig, TrainConfig
from vln_magic_tpu.agent import Navigator, episodes_from_items
from vln_magic_tpu.agent.rollout import Tables, UNOBS
from vln_magic_tpu.env import make_synthetic_world
from vln_magic_tpu.env.synthetic import make_synthetic_instructions


@pytest.fixture(scope="module")
def setup():
    world = make_synthetic_world(num_scans=2, nodes_per_scan=18, feat_dim=32,
                                 seed=5)
    cfg = MagicConfig(
        model=ModelConfig(vocab_size=300, hidden_size=64, num_attention_heads=4,
                          num_l_layers=2, num_pano_layers=1, num_x_layers=2,
                          image_feat_size=32, max_position_embeddings=64),
        env=EnvConfig(max_action_len=8, max_gmap_len=24, max_candidates=16),
        train=TrainConfig(batch_size=4),
    )
    nav = Navigator(cfg, world, rng=jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    items = make_synthetic_instructions(world, 8, rng, vocab_size=300,
                                        min_path=3, max_path=6)
    return world, cfg, nav, items


def test_episode_init_observes_start(setup):
    world, cfg, nav, items = setup
    state = episodes_from_items(nav.tables, world, items[:4],
                                nav.rollout.model_dims)
    b = 0
    start = items[b]["path_idx"][0]
    assert bool(state.visited[b, start])
    assert int(state.obs_order[b, start]) == 0
    # start's candidates observed in slot order
    g = world.graphs[items[b]["scan_idx"]]
    nbrs = g.neighbors(int(start))
    for nb in nbrs:
        assert int(state.obs_order[b, nb]) < int(UNOBS)


def test_greedy_eval_end_to_end(setup):
    world, cfg, nav, items = setup
    (avg, per), preds = nav.evaluate(items, batch_size=4)
    assert len(preds) == len(items)
    for k in ("sr", "spl", "nDTW", "SDTW", "CLS", "nav_error", "oracle_error"):
        assert k in avg and np.isfinite(avg[k])
    # trajectories are connected paths starting at gt start
    for p, it in zip(preds, items):
        g = world.graphs[p["scan_idx"]]
        flat = [n for seg in p["trajectory_idx"] for n in seg]
        assert flat[0] == it["path_idx"][0]
        for a, b in zip(flat[:-1], flat[1:]):
            assert g.adjacency[a, b], "trajectory must follow graph edges"


def test_greedy_eval_deterministic(setup):
    world, cfg, nav, items = setup
    (_, per1), preds1 = nav.evaluate(items[:4], batch_size=4)
    (_, per2), preds2 = nav.evaluate(items[:4], batch_size=4)
    for p1, p2 in zip(preds1, preds2):
        assert p1["trajectory_idx"] == p2["trajectory_idx"]


def test_teacher_forcing_follows_gt(setup):
    """With feedback='teacher', the agent must walk exactly the gt path."""
    world, cfg, nav, items = setup
    chunk = items[:4]
    state, aux = nav.run_items(chunk, feedback="teacher")
    actions = np.asarray(aux["actions"])  # [T, B]
    for b, it in enumerate(chunk):
        gt = list(np.asarray(it["path_idx"]))
        walked = [gt[0]]
        for t in range(actions.shape[0]):
            if actions[t, b] >= 0:
                walked.append(int(actions[t, b]))
        assert walked == gt, f"teacher forcing diverged: {walked} vs {gt}"
        # final position is the gt goal
        assert int(np.asarray(aux["final_cur"])[b]) == gt[-1]


def test_imitation_loss_positive(setup):
    world, cfg, nav, items = setup
    fn = nav._run_fn("teacher", 1.0, True)
    import vln_magic_tpu.agent.navigator as N

    txt_ids, txt_masks = N.pad_instructions(items[:4], cfg.env.max_instr_len)
    state = episodes_from_items(nav.tables, world, items[:4],
                                nav.rollout.model_dims)
    state, aux = fn(nav.params, nav.tables, state, jnp.asarray(txt_ids),
                    jnp.asarray(txt_masks), jax.random.PRNGKey(0), {})
    assert float(aux["ml_loss"]) > 0


def test_expert_action_is_optimal(setup):
    """The spl expert must pick a gmap node minimizing d(cur,n)+d(n,goal)."""
    world, cfg, nav, items = setup
    chunk = items[:4]
    state = episodes_from_items(nav.tables, world, chunk,
                                nav.rollout.model_dims)
    gmap = nav.rollout.assemble_gmap(state, "student")
    a = nav.rollout.teacher_action(state, gmap, 0, imitation=False)
    a = np.asarray(a)
    token_node = np.asarray(gmap["token_node"])
    valid = np.asarray(gmap["token_valid"])
    for b, it in enumerate(chunk):
        g = world.graphs[it["scan_idx"]]
        cur = int(it["path_idx"][0])
        goal = int(it["path_idx"][-1])
        if cur == goal:
            assert a[b] == 0
            continue
        costs = []
        for j in range(token_node.shape[1]):
            n = token_node[b, j]
            if valid[b, j] and not (n == cur):
                if not bool(np.asarray(state.visited)[b, n]):
                    costs.append((g.dist[cur, n] + g.dist[n, goal], j + 2))
        best = min(costs)[1]
        assert a[b] == best


def test_scan_unroll_equivalence(setup):
    """scan_unroll is an execution-strategy knob only: unrolled greedy
    decode must produce the trajectories of the rolled loop exactly."""
    import dataclasses

    world, cfg, nav, items = setup
    (_, _), preds1 = nav.evaluate(items[:4], batch_size=4)
    cfg_u = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, scan_unroll=4))
    nav_u = Navigator(cfg_u, world, rng=jax.random.PRNGKey(0))
    (_, _), preds2 = nav_u.evaluate(items[:4], batch_size=4)
    for p1, p2 in zip(preds1, preds2):
        assert p1["trajectory_idx"] == p2["trajectory_idx"]


def test_envedit_aug_feature_selection(setup):
    """Episodes flagged aug must see the alternate feature table."""
    from vln_magic_tpu.agent.rollout import Tables, init_episodes
    import vln_magic_tpu.agent.navigator as N

    world, cfg, nav, items = setup
    aug_feats = np.asarray(world.tables.features) * 0.0 + 7.0
    tables = Tables.from_world(world.tables, aug_features=aug_feats)
    roll = type(nav.rollout)(tables, cfg.env, nav.model)
    chunk = items[:4]
    tg = 24
    scan = np.array([it["scan_idx"] for it in chunk], np.int32)
    start = np.array([it["path_idx"][0] for it in chunk], np.int32)
    heading = np.zeros(4, np.float32)
    gt = np.full((4, tg), -1, np.int32)
    gl = np.zeros(4, np.int32)
    for i, it in enumerate(chunk):
        p = np.asarray(it["path_idx"])
        gt[i, : len(p)] = p
        gl[i] = len(p)
    aug = np.array([True, False, True, False])
    state = init_episodes(tables, scan, start, heading, gt, gl,
                          roll.model_dims, aug=aug)
    pano = roll.assemble_pano(state)
    fts = np.asarray(pano["view_img_fts"])
    # aug episodes see the constant-7 table; normal episodes don't
    assert (np.abs(fts[0][np.asarray(pano["pano_masks"][0])] - 7.0) < 1e-6).all()
    assert not (np.abs(fts[1][np.asarray(pano["pano_masks"][1])] - 7.0) < 1e-6).all()
    assert (np.abs(fts[2][np.asarray(pano["pano_masks"][2])] - 7.0) < 1e-6).all()
