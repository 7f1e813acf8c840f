"""Episode-machine fuzz: sampled rollouts replayed through a python oracle.

The device rollout's action space, observation bookkeeping, and transitions
must match a straightforward host reimplementation of the rules for ANY
action sequence — not just teacher-forced ones.
"""

import jax
import numpy as np
import pytest

from vln_magic_tpu.config import EnvConfig, MagicConfig, ModelConfig, TrainConfig
from vln_magic_tpu.agent import Navigator
from vln_magic_tpu.env import make_synthetic_world
from vln_magic_tpu.env.synthetic import make_synthetic_instructions


@pytest.mark.parametrize("seed", [0, 1])
def test_sampled_rollout_respects_env_rules(seed):
    world = make_synthetic_world(num_scans=1, nodes_per_scan=16, feat_dim=16,
                                 seed=81 + seed)
    cfg = MagicConfig(
        model=ModelConfig(vocab_size=300, hidden_size=32,
                          num_attention_heads=2, num_l_layers=1,
                          num_pano_layers=1, num_x_layers=1,
                          image_feat_size=16, max_position_embeddings=64),
        env=EnvConfig(max_action_len=7, max_gmap_len=18, max_instr_len=32),
        train=TrainConfig(batch_size=4),
    )
    nav = Navigator(cfg, world, rng=jax.random.PRNGKey(seed))
    items = make_synthetic_instructions(world, 4, np.random.default_rng(seed),
                                        vocab_size=300, min_path=3, max_path=5)
    # sampled (stochastic) policy rollout
    fn = nav._run_fn("sample", 1.0, True)
    import jax.numpy as jnp
    from vln_magic_tpu.agent.navigator import episodes_from_items, pad_instructions

    txt_ids, txt_masks = pad_instructions(items, cfg.env.max_instr_len)
    state0 = episodes_from_items(nav.tables, world, items,
                                 nav.rollout.model_dims)
    state, aux = fn(nav.params, nav.tables, state0, jnp.asarray(txt_ids),
                    jnp.asarray(txt_masks), jax.random.PRNGKey(seed + 99), {})
    actions = np.asarray(aux["actions"])
    g = world.graphs[0]

    for b, it in enumerate(items):
        # python oracle of the observation rules
        cur = int(it["path_idx"][0])
        visited = {cur}
        observed = {cur} | set(g.neighbors(cur).tolist())
        for t in range(actions.shape[0]):
            tgt = int(actions[t, b])
            if tgt < 0:
                continue
            # chosen targets must be observed frontier nodes
            assert tgt in observed, f"b{b} t{t}: target {tgt} never observed"
            assert tgt not in visited, f"b{b} t{t}: target {tgt} already visited"
            cur = tgt
            visited.add(cur)
            observed |= {cur} | set(g.neighbors(cur).tolist())
        assert int(np.asarray(aux["final_cur"])[b]) == cur
        # device visited set matches the oracle
        dev_visited = set(np.flatnonzero(
            np.asarray(state.visited)[b, : g.num_nodes]).tolist())
        assert dev_visited == visited
        # stop node must be a visited node
        assert int(np.asarray(aux["stop_node"])[b]) in visited
