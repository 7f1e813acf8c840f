"""Observed-subgraph parity mode: the reference's GraphMap computes
distances/paths over incrementally observed edges (an edge exists iff one
endpoint has been visited).  These tests validate the incremental all-pairs
updates against a networkx oracle built from the same observation rule."""

import dataclasses

import jax
import numpy as np
import pytest

from vln_magic_tpu.config import EnvConfig, MagicConfig, ModelConfig, TrainConfig
from vln_magic_tpu.agent import Navigator, episodes_from_items
from vln_magic_tpu.env import make_synthetic_world
from vln_magic_tpu.env.synthetic import make_synthetic_instructions


@pytest.fixture(scope="module")
def setup():
    world = make_synthetic_world(num_scans=1, nodes_per_scan=18, feat_dim=16,
                                 seed=71)
    cfg = MagicConfig(
        model=ModelConfig(vocab_size=300, hidden_size=32,
                          num_attention_heads=2, num_l_layers=1,
                          num_pano_layers=1, num_x_layers=1,
                          image_feat_size=16, max_position_embeddings=64),
        env=EnvConfig(max_action_len=6, max_gmap_len=20, max_instr_len=32,
                      observed_graph_parity=True),
        train=TrainConfig(batch_size=4),
    )
    nav = Navigator(cfg, world, rng=jax.random.PRNGKey(1))
    items = make_synthetic_instructions(world, 4, np.random.default_rng(11),
                                        vocab_size=300, min_path=3, max_path=5)
    return world, cfg, nav, items


def _observed_oracle(g, visited_nodes):
    """networkx shortest paths over edges with a visited endpoint."""
    import networkx as nx

    G = nx.Graph()
    G.add_nodes_from(range(g.num_nodes))
    vis = set(visited_nodes)
    for i in range(g.num_nodes):
        for j in g.neighbors(i):
            if i in vis or int(j) in vis:
                G.add_edge(i, int(j), weight=float(g.edge_dist[i, j]))
    return G


def test_incremental_apsp_matches_oracle(setup):
    import networkx as nx

    world, cfg, nav, items = setup
    g = world.graphs[0]
    state, aux = nav.run_items(items, feedback="teacher")
    obs_dist = np.asarray(state.obs_dist)
    visited = np.asarray(state.visited)
    for b, it in enumerate(items):
        vis_nodes = np.flatnonzero(visited[b, : g.num_nodes])
        G = _observed_oracle(g, vis_nodes)
        lengths = dict(nx.all_pairs_dijkstra_path_length(G))
        # every observed node pair must match the oracle
        observed = sorted({n for e in G.edges for n in e})
        for i in observed[:12]:
            for j in observed[:12]:
                want = lengths.get(i, {}).get(j, None)
                got = obs_dist[b, i, j]
                if want is None:
                    assert got > 1e8, (b, i, j, got)
                else:
                    assert got == pytest.approx(want, rel=1e-4), (b, i, j)


def test_observed_never_shorter_than_full(setup):
    world, cfg, nav, items = setup
    g = world.graphs[0]
    state, aux = nav.run_items(items, feedback="teacher")
    obs = np.asarray(state.obs_dist)[:, : g.num_nodes, : g.num_nodes]
    full = np.asarray(g.dist)[None]
    finite = obs < 1e8
    assert (obs[finite] >= full.repeat(len(items), 0)[finite] - 1e-4).all()


def test_parity_eval_end_to_end(setup):
    world, cfg, nav, items = setup
    (avg, _), preds = nav.evaluate(items, batch_size=4)
    assert np.isfinite(avg["nDTW"])
    for p, it in zip(preds, items):
        g = world.graphs[p["scan_idx"]]
        flat = [n for seg in p["trajectory_idx"] for n in seg]
        assert flat[0] == it["path_idx"][0]
        for a, b in zip(flat[:-1], flat[1:]):
            assert g.adjacency[a, b], "observed-mode trajectory must be connected"


def test_parity_teacher_forcing_still_exact(setup):
    world, cfg, nav, items = setup
    state, aux = nav.run_items(items, feedback="teacher")
    fc = np.asarray(aux["final_cur"])
    goals = np.array([it["path_idx"][-1] for it in items])
    assert (fc == goals).all()
