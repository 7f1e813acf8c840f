import math

import numpy as np
import pytest

from vln_magic_tpu.env import geometry as G


def test_angle_feature_matches_reference_formula():
    # reference: map_nav_src/utils/data.py:127-130
    h, e = 0.7, -0.3
    got = G.angle_feature(h, e, 4)
    want = np.array([math.sin(h), math.cos(h), math.sin(e), math.cos(e)], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # tiling to 128-d speaker features
    got128 = G.angle_feature(h, e, 128)
    assert got128.shape == (128,)
    np.testing.assert_allclose(got128[:4], want, rtol=1e-6)
    np.testing.assert_allclose(got128[4:8], want, rtol=1e-6)


def test_get_angle_fts_vectorized():
    hs = np.array([0.0, 1.0, -2.0])
    es = np.array([0.5, -0.5, 0.0])
    out = G.get_angle_fts(hs, es, 8)
    assert out.shape == (3, 8)
    np.testing.assert_allclose(out[1, :4],
                               [math.sin(1), math.cos(1), math.sin(-0.5), math.cos(-0.5)],
                               rtol=1e-6)


def test_view_rel_angles_structure():
    # reference: map_nav_src/utils/data.py:184-201 — views are 30deg apart,
    # 12 headings x 3 elevation rows (down/horizon/up).
    rel = G.get_view_rel_angles(0)
    assert rel.shape == (36, 2)
    # base view 0 also sits on the bottom row, so rel-to-self is (0, 0)
    assert rel[0, 0] == 0 and rel[0, 1] == 0
    assert rel[1, 0] == pytest.approx(math.radians(30))
    assert rel[13, 0] == pytest.approx(math.radians(30))
    assert rel[13, 1] == pytest.approx(math.radians(30))
    rel12 = G.get_view_rel_angles(12)  # base at horizon row
    assert rel12[12, 0] == 0 and rel12[12, 1] == 0
    assert rel12[0, 1] == pytest.approx(-math.radians(30))


def test_rel_pos_features_axis_quirk():
    # reference map_nav_src/utils/data.py:157-174: heading = arcsin(dx/xy),
    # reflected when dy < 0 (the simulator's transposed x-y convention).
    a = np.zeros(3)
    h, e, d = G.rel_pos_features(a, np.array([1.0, 0.0, 0.0]))
    assert h == pytest.approx(math.pi / 2)
    h, _, _ = G.rel_pos_features(a, np.array([0.0, 1.0, 0.0]))
    assert h == pytest.approx(0.0)
    h, _, _ = G.rel_pos_features(a, np.array([0.0, -1.0, 0.0]))
    assert h == pytest.approx(math.pi)
    h, e, d = G.rel_pos_features(a, np.array([0.0, 1.0, 1.0]))
    assert e == pytest.approx(math.asin(1.0 / math.sqrt(2)))
    assert d == pytest.approx(math.sqrt(2))


def test_nearest_view_index():
    # straight north at horizon => view 12 (first horizon view, heading 0)
    assert G.nearest_view_index(0.0, 0.0) == 12
    # heading 90deg at horizon => view 15
    assert G.nearest_view_index(math.pi / 2, 0.0) == 15
    # heading wrap: 350deg ~ -10deg => view 12 again
    assert G.nearest_view_index(math.radians(350), 0.0) == 12
    # looking down => bottom row
    assert G.nearest_view_index(0.0, -math.radians(30)) == 0


def test_gmap_pos_features_layout():
    cur = np.zeros(3)
    nodes = np.array([[3.0, 4.0, 0.0], [0.0, 6.0, 0.0]])
    sd = np.array([7.0, 6.0])
    st = np.array([2, 1])
    out = G.gmap_pos_features(cur, nodes, sd, st, 0.0, 0.0)
    assert out.shape == (2, 7)
    np.testing.assert_allclose(out[0, 4:], [5 / 30, 7 / 30, 2 / 10], rtol=1e-6)
    np.testing.assert_allclose(out[1, 4:], [6 / 30, 6 / 30, 1 / 10], rtol=1e-6)
