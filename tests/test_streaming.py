"""Continuous-batching (streaming) eval: per-episode decode equivalence.

The streamed decoder (agent/streaming.py) refills ended lanes from an episode
queue at compiled-chunk boundaries inside one device-resident while_loop;
these tests pin it byte-identical, per
episode, to the batch evaluator — trajectories, stop nodes, metrics — across
fusion modes, queue sizes that don't divide the lane count, and queues
smaller than the lanes.
"""

import jax
import numpy as np
import pytest

from vln_magic_tpu.agent import Navigator
from vln_magic_tpu.config import (EnvConfig, MagicConfig, ModelConfig,
                                  TrainConfig)
from vln_magic_tpu.env import make_synthetic_world
from vln_magic_tpu.env.synthetic import make_synthetic_instructions


def _setup(fusion="dynamic", seed=7, lanes=4):
    world = make_synthetic_world(num_scans=2, nodes_per_scan=18, feat_dim=24,
                                 seed=seed)
    cfg = MagicConfig(
        model=ModelConfig(vocab_size=300, hidden_size=32,
                          num_attention_heads=2, num_l_layers=1,
                          num_pano_layers=1, num_x_layers=1,
                          image_feat_size=24, max_position_embeddings=64,
                          fusion=fusion),
        env=EnvConfig(max_action_len=6, max_gmap_len=20, max_instr_len=32),
        train=TrainConfig(batch_size=lanes),
    )
    nav = Navigator(cfg, world, rng=jax.random.PRNGKey(seed))
    return world, cfg, nav


def _items(world, n, seed=5, instr_len=32):
    rng = np.random.default_rng(seed)
    items = make_synthetic_instructions(world, n, rng, vocab_size=300,
                                        min_path=3, max_path=5)
    # FIXED instruction length: the batch path buckets L per chunk while the
    # stream bank uses one global L; equal lengths make the comparison exact
    # by construction (padded positions are masked out either way)
    for it in items:
        it["instr_encoding"] = rng.integers(4, 300, instr_len).astype(np.int32)
    return items


@pytest.mark.parametrize("fusion", ["dynamic", "local"])
def test_stream_matches_batch_decode(fusion):
    world, cfg, nav = _setup(fusion=fusion)
    items = _items(world, 10)
    (avg_b, per_b), preds_b = nav.evaluate(items, batch_size=4, stream=False)
    (avg_s, per_s), preds_s = nav.evaluate(items, batch_size=4, stream=True)
    for pb, ps in zip(preds_b, preds_s):
        assert pb["trajectory_idx"] == ps["trajectory_idx"]
        assert pb["instr_id"] == ps["instr_id"]
    for k, v in avg_b.items():
        assert avg_s[k] == pytest.approx(v), k


def test_stream_outputs_per_episode():
    """Raw streaming outputs equal the batch rollout's per-episode columns."""
    from vln_magic_tpu.agent.navigator import episodes_from_items

    world, cfg, nav = _setup()
    items = _items(world, 9)   # 9 episodes over 4 lanes: uneven refill
    se = nav.stream_eval(4)
    out = se.run(nav.params, nav.tables, items, cfg.env.max_instr_len)
    assert out["actions"].shape == (9, cfg.env.max_action_len)
    assert out["chunks"] >= 2   # the queue forced at least one refill wave
    # batch reference, chunked exactly like evaluate(stream=False)
    for i in range(0, 8, 4):
        chunk = items[i : i + 4]
        _, aux = nav.run_items(chunk)
        acts = np.asarray(aux["actions"]).T           # [B, T]
        np.testing.assert_array_equal(out["actions"][i : i + 4], acts)
        np.testing.assert_array_equal(out["stop_node"][i : i + 4],
                                      np.asarray(aux["stop_node"]))
        np.testing.assert_array_equal(out["final_cur"][i : i + 4],
                                      np.asarray(aux["final_cur"]))


def test_stream_queue_smaller_than_lanes():
    world, cfg, nav = _setup()
    items = _items(world, 2)   # fewer episodes than lanes: queue pads
    (_, _), preds_b = nav.evaluate(items, batch_size=4, stream=False)
    (_, _), preds_s = nav.evaluate(items, batch_size=4, stream=True)
    for pb, ps in zip(preds_b, preds_s):
        assert pb["trajectory_idx"] == ps["trajectory_idx"]


def test_stream_auto_gating():
    """stream=None auto-enables only on the eligible path; explicit
    stream=True on an ineligible config raises."""
    world, cfg, nav = _setup()
    items = _items(world, 6)
    with pytest.raises(ValueError):
        nav.evaluate(items, batch_size=4, stream=True, detailed_output=True)
    # parity mode rejects streaming outright
    cfg2 = MagicConfig(
        model=cfg.model,
        env=EnvConfig(max_action_len=6, max_gmap_len=20, max_instr_len=32,
                      observed_graph_parity=True),
        train=cfg.train)
    nav2 = Navigator(cfg2, world, rng=jax.random.PRNGKey(7))
    with pytest.raises(ValueError):
        nav2.evaluate(items, batch_size=4, stream=True)


def test_stream_prepared_bank_reuse():
    """prepare() once + run(prepared=) twice equals run(items) — the
    eval-every-K-iters pattern reuses the params-independent item bank."""
    world, cfg, nav = _setup()
    items = _items(world, 6)
    se = nav.stream_eval(4)
    ref = se.run(nav.params, nav.tables, items, cfg.env.max_instr_len)
    prep = se.prepare(items, cfg.env.max_instr_len)
    for _ in range(2):
        out = se.run(nav.params, nav.tables, prepared=prep)
        np.testing.assert_array_equal(out["actions"], ref["actions"])
        np.testing.assert_array_equal(out["stop_node"], ref["stop_node"])
        assert out["semantic_steps"] == ref["semantic_steps"]
    with pytest.raises(ValueError):
        se.run(nav.params, nav.tables)   # neither items nor prepared


def test_stream_semantic_accounting():
    """Semantic steps equal the batch path's total live-step count, and the
    streamed pipeline runs FEWER scan iterations than the batch waves."""
    world, cfg, nav = _setup()
    items = _items(world, 12)
    se = nav.stream_eval(4)
    out = se.run(nav.params, nav.tables, items, cfg.env.max_instr_len)
    sem_batch = 0
    for i in range(0, 12, 4):
        _, aux = nav.run_items(items[i : i + 4])
        sem_batch += int(aux["semantic_steps"])
    assert out["semantic_steps"] == sem_batch
    # the streamed pipeline needs no more scan iterations than the 3 batch
    # waves plus drain/group rounding (it typically needs fewer; at this
    # toy scale the bound is what's deterministic)
    assert out["scan_steps"] <= (3 + 2) * cfg.env.max_action_len
