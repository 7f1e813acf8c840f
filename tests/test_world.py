import numpy as np

from vln_magic_tpu.env import make_synthetic_world
from vln_magic_tpu.env.synthetic import make_synthetic_instructions


def test_world_tables_shapes(tiny_world):
    t = tiny_world.tables
    S, N, C = t.num_scans, t.max_nodes, t.max_candidates
    assert t.positions.shape == (S, N, 3)
    assert t.dist.shape == (S, N, N)
    assert t.features.shape == (S, N, 36, 32)
    assert t.cand_ids.shape == (S, N, C)
    assert (t.cand_mask == (t.cand_ids >= 0)).all()


def test_candidates_match_adjacency(tiny_world):
    t = tiny_world.tables
    for si, g in enumerate(tiny_world.graphs):
        for i in range(g.num_nodes):
            cands = set(t.cand_ids[si, i][t.cand_mask[si, i]].tolist())
            assert cands == set(g.neighbors(i).tolist())
            # views in range, headings point at the neighbor
            views = t.cand_view[si, i][t.cand_mask[si, i]]
            assert ((views >= 0) & (views < 36)).all()


def test_features_deterministic():
    w1 = make_synthetic_world(num_scans=1, nodes_per_scan=10, feat_dim=16, seed=7)
    w2 = make_synthetic_world(num_scans=1, nodes_per_scan=10, feat_dim=16, seed=7)
    np.testing.assert_array_equal(w1.tables.features, w2.tables.features)


def test_expand_jumps_matches_reference_traj_format(tiny_world):
    # reference traj: [[start]] then each action appends path(cur, tgt)
    # excluding cur (map_nav_src/r2r/agent.py:384)
    g = tiny_world.graphs[0]
    a, b = 0, g.num_nodes - 1
    mid = g.path_indices(a, b)[1] if g.steps[a, b] > 1 else b
    segs = tiny_world.expand_jumps(0, [a, mid, b])
    flat = sum(segs, [])
    assert flat[0] == a and flat[-1] == b
    for x, y in zip(flat[:-1], flat[1:]):
        assert g.adjacency[x, y]


def test_synthetic_instructions(tiny_world, rng):
    items = make_synthetic_instructions(tiny_world, 8, rng)
    assert len(items) == 8
    for it in items:
        g = tiny_world.graphs[it["scan_idx"]]
        p = it["path_idx"]
        assert 3 <= len(p) - 1 + 1 <= 8
        for x, y in zip(p[:-1], p[1:]):
            assert g.adjacency[x, y]


def test_bf16_feature_table():
    """feat_dtype=bfloat16 halves the [S, N, 36, D] table; rollout casts to
    f32 at the read (assemble_pano), so decodes are unaffected on small
    worlds."""
    import ml_dtypes

    from vln_magic_tpu.env import make_synthetic_world

    w32 = make_synthetic_world(num_scans=1, nodes_per_scan=10, feat_dim=8,
                               seed=3)
    wbf = make_synthetic_world(num_scans=1, nodes_per_scan=10, feat_dim=8,
                               seed=3, feat_dtype=ml_dtypes.bfloat16)
    assert wbf.tables.features.dtype == ml_dtypes.bfloat16
    assert wbf.tables.features.nbytes * 2 == w32.tables.features.nbytes
    # same underlying values up to bf16 rounding
    np.testing.assert_allclose(
        np.asarray(wbf.tables.features, np.float32), w32.tables.features,
        atol=0.01, rtol=0.01)
