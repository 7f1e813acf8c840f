"""Golden-trajectory regression tests.

The parity contract (BASELINE.md: action-identical greedy decode) needs a
regression net inside this repo: a seeded tiny model's greedy decode on the
seeded synthetic world is pinned here.  Any refactor that changes rollout
semantics (token ordering, masking, geometry, fusion) breaks these exact
action sequences and must be deliberate.
"""

import json
import os

import jax
import numpy as np
import pytest

from vln_magic_tpu.config import EnvConfig, MagicConfig, ModelConfig, TrainConfig
from vln_magic_tpu.agent import Navigator
from vln_magic_tpu.env import make_synthetic_world
from vln_magic_tpu.env.synthetic import make_synthetic_instructions

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_decode.json")


def _decode():
    world = make_synthetic_world(num_scans=2, nodes_per_scan=20, feat_dim=24,
                                 seed=777)
    cfg = MagicConfig(
        model=ModelConfig(vocab_size=400, hidden_size=64,
                          num_attention_heads=2, num_l_layers=2,
                          num_pano_layers=1, num_x_layers=2,
                          image_feat_size=24, max_position_embeddings=64),
        env=EnvConfig(max_action_len=8, max_gmap_len=24, max_instr_len=48),
        train=TrainConfig(batch_size=8),
    )
    nav = Navigator(cfg, world, rng=jax.random.PRNGKey(777))
    items = make_synthetic_instructions(world, 8, np.random.default_rng(777),
                                        vocab_size=400, min_path=3, max_path=6)
    (_, _), preds = nav.evaluate(items, batch_size=8)
    return [p["trajectory_idx"] for p in preds]


def test_greedy_decode_matches_golden():
    got = _decode()
    if not os.path.exists(GOLDEN):
        with open(GOLDEN, "w") as f:
            json.dump(got, f)
        pytest.skip("golden file created on first run")
    with open(GOLDEN) as f:
        want = json.load(f)
    assert got == want, (
        "greedy decode diverged from the pinned golden trajectories — "
        "rollout semantics changed; regenerate tests/golden_decode.json "
        "only if the change is intentional")


GOLDEN_PARITY = os.path.join(os.path.dirname(__file__),
                             "golden_decode_parity.json")


def test_parity_decode_matches_golden():
    import dataclasses

    world = make_synthetic_world(num_scans=2, nodes_per_scan=20, feat_dim=24,
                                 seed=777)
    cfg = MagicConfig(
        model=ModelConfig(vocab_size=400, hidden_size=64,
                          num_attention_heads=2, num_l_layers=2,
                          num_pano_layers=1, num_x_layers=2,
                          image_feat_size=24, max_position_embeddings=64),
        env=EnvConfig(max_action_len=8, max_gmap_len=24, max_instr_len=48,
                      observed_graph_parity=True),
        train=TrainConfig(batch_size=8),
    )
    nav = Navigator(cfg, world, rng=jax.random.PRNGKey(777))
    items = make_synthetic_instructions(world, 8, np.random.default_rng(777),
                                        vocab_size=400, min_path=3, max_path=6)
    (_, _), preds = nav.evaluate(items, batch_size=8)
    got = [p["trajectory_idx"] for p in preds]
    if not os.path.exists(GOLDEN_PARITY):
        with open(GOLDEN_PARITY, "w") as f:
            json.dump(got, f)
        pytest.skip("parity golden created on first run")
    with open(GOLDEN_PARITY) as f:
        want = json.load(f)
    assert got == want, "parity-mode greedy decode diverged from golden"


GOLDEN_LOCAL = os.path.join(os.path.dirname(__file__),
                            "golden_decode_local.json")


def test_local_fusion_decode_matches_golden():
    """Pins the fusion='local' action space (viewpoint-candidate slots,
    no visited masking) the same way the dynamic/parity decodes are pinned."""
    world = make_synthetic_world(num_scans=2, nodes_per_scan=20, feat_dim=24,
                                 seed=777)
    cfg = MagicConfig(
        model=ModelConfig(vocab_size=400, hidden_size=64,
                          num_attention_heads=2, num_l_layers=2,
                          num_pano_layers=1, num_x_layers=2,
                          image_feat_size=24, max_position_embeddings=64,
                          fusion="local"),
        env=EnvConfig(max_action_len=8, max_gmap_len=24, max_instr_len=48),
        train=TrainConfig(batch_size=8),
    )
    nav = Navigator(cfg, world, rng=jax.random.PRNGKey(777))
    items = make_synthetic_instructions(world, 8, np.random.default_rng(777),
                                        vocab_size=400, min_path=3, max_path=6)
    (_, _), preds = nav.evaluate(items, batch_size=8)
    got = [p["trajectory_idx"] for p in preds]
    if not os.path.exists(GOLDEN_LOCAL):
        with open(GOLDEN_LOCAL, "w") as f:
            json.dump(got, f)
        pytest.skip("local-fusion golden created on first run")
    with open(GOLDEN_LOCAL) as f:
        want = json.load(f)
    assert got == want, "fusion='local' greedy decode diverged from golden"
