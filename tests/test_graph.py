import numpy as np
import pytest

from vln_magic_tpu.env.graph import INF, NavGraph, _floyd_warshall
from vln_magic_tpu.env.synthetic import make_synthetic_world


def _line_graph(n=5):
    pos = np.stack([np.arange(n, dtype=np.float32),
                    np.zeros(n, np.float32),
                    np.zeros(n, np.float32)], axis=1)
    adj = np.zeros((n, n), dtype=bool)
    for i in range(n - 1):
        adj[i, i + 1] = adj[i + 1, i] = True
    edge = np.where(adj, 1.0, INF).astype(np.float32)
    return NavGraph("line", [f"v{i}" for i in range(n)], pos, adj, edge)


def test_line_graph_distances_and_paths():
    g = _line_graph(5)
    assert g.distance("v0", "v4") == pytest.approx(4.0)
    assert g.path("v0", "v3") == ["v0", "v1", "v2", "v3"]
    assert g.path("v4", "v1") == ["v4", "v3", "v2", "v1"]
    assert g.steps[0, 4] == 4


def test_floyd_warshall_matches_networkx():
    import networkx as nx

    world = make_synthetic_world(num_scans=1, nodes_per_scan=30, feat_dim=8, seed=3)
    g = world.graphs[0]
    G = nx.Graph()
    for i in range(g.num_nodes):
        for j in g.neighbors(i):
            G.add_edge(i, int(j), weight=float(g.edge_dist[i, j]))
    nx_dist = dict(nx.all_pairs_dijkstra_path_length(G))
    for i in range(g.num_nodes):
        for j in range(g.num_nodes):
            assert g.dist[i, j] == pytest.approx(nx_dist[i][j], rel=1e-5)


def test_path_reconstruction_cost_is_shortest():
    world = make_synthetic_world(num_scans=1, nodes_per_scan=30, feat_dim=8, seed=4)
    g = world.graphs[0]
    rng = np.random.default_rng(0)
    for _ in range(20):
        a, b = rng.integers(g.num_nodes, size=2)
        p = g.path_indices(int(a), int(b))
        assert p[0] == a and p[-1] == b
        cost = sum(g.edge_dist[x, y] for x, y in zip(p[:-1], p[1:]))
        assert cost == pytest.approx(g.dist[a, b], rel=1e-5)
        for x, y in zip(p[:-1], p[1:]):
            assert g.adjacency[x, y]


def test_disconnected_marked_unreachable():
    edge = np.full((3, 3), INF, np.float32)
    edge[0, 1] = edge[1, 0] = 1.0
    d, s, nxt = _floyd_warshall(edge)
    assert d[0, 2] >= INF and s[0, 2] == -1 and nxt[0, 2] == -1
    assert d[0, 1] == 1.0 and nxt[0, 1] == 1
