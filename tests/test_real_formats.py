"""Real Matterport/R2R file-format fixtures (VERDICT r3 missing #4).

The loaders (`env/graph.py load_connectivity`, `env/world.py
load_scanvp_candidates`, `data/annotations.py construct_instrs`) parse the
REAL dataset schemas — pose matrices, `unobstructed`/`included` lists
(reference map_nav_src/utils/data.py:79-104), the
`scanvp_candview_relangles.json` candidate-view file (parser.py:261,
pretrain_src/data/dataset.py:440-469), and the R2R annotation format — but
until this file no test fabricated those formats, so their first contact
with the real schema would have been on mounted assets.  These fixtures
write byte-faithful fragments and drive the CLI's real-data branch
(`build_dataset` with a mounted tree) end-to-end through a greedy decode.
"""

import json
import math
import os

import numpy as np
import pytest

SCAN = "17DRP5sb8fy"   # a real Matterport scan id, for path realism
VPS = ["0e92a69a50414253a23043758f111cec",
       "286b78a2b3e54f8bb8a8e30c8f5cf1e2",
       "5b9b2794954e4694a45fc424a8643391",
       "deadbeefdeadbeefdeadbeefdeadbeef"]   # [3] is included=False


def _pose(x, y, z):
    """Row-major 4x4 camera pose; position lives at indices 3, 7, 11
    (reference utils/data.py:95: pose[3], pose[7], pose[11])."""
    p = np.eye(4, dtype=np.float64).ravel().tolist()
    p[3], p[7], p[11] = x, y, z
    return p


@pytest.fixture(scope="module")
def dataset_tree(tmp_path_factory):
    """A minimal R2R dataset tree in the REAL formats: connectivity JSON,
    scanvp_candview_relangles.json, R2R_{split}.json annotations."""
    root = tmp_path_factory.mktemp("r2r_tree")
    conn_dir = root / "R2R" / "connectivity"
    anno_dir = root / "R2R" / "annotations"
    conn_dir.mkdir(parents=True)
    anno_dir.mkdir(parents=True)

    # 4 nodes on a line, ~2m apart; node 3 is included=False; the 0<->2
    # unobstructed flags are asymmetric (0->2 True, 2->0 False) so NO edge
    # may result (reference data.py:100-104 requires mutual unobstructed)
    positions = [(0.0, 0.0, 1.5), (2.0, 0.0, 1.5), (4.0, 0.0, 1.5),
                 (6.0, 0.0, 1.5)]
    unob = [
        [False, True, True, False],
        [True, False, True, False],
        [False, True, False, True],
        [False, False, True, False],
    ]
    items = []
    for i, vp in enumerate(VPS):
        items.append({
            "image_id": vp,
            "pose": _pose(*positions[i]),
            "included": i != 3,
            "visible": unob[i],
            "unobstructed": unob[i],
            "height": 1.5,
        })
    with open(conn_dir / f"{SCAN}_connectivity.json", "w") as f:
        json.dump(items, f)

    # candidate-view file fragment: {scan_vp: {cand_vp: [view_idx,
    # angle_dist, rel_heading, rel_elevation]}} (dataset.py:440,463-469)
    deg30 = math.radians(30)
    relangles = {
        f"{SCAN}_{VPS[0]}": {
            VPS[1]: [14, 0.2, 0.1, 0.05],      # view 14: heading 2*30deg
        },
        f"{SCAN}_{VPS[1]}": {
            VPS[0]: [20, 0.1, -0.2, 0.0],
            VPS[2]: [13, 0.3, 0.15, -0.1],
            # a candidate NOT in connectivity adjacency is tolerated (the
            # excluded node): it must be dropped, not crash
            VPS[3]: [2, 0.1, 0.0, 0.0],
        },
        # VPS[2] intentionally absent: falls back to synthesized candidates
    }
    with open(anno_dir / "scanvp_candview_relangles.json", "w") as f:
        json.dump(relangles, f)

    # R2R annotation schema (one item, 3 instructions -> 3 flat items with
    # instr_id "{path_id}_{j}", reference data_utils.py:105-150)
    anno = [{
        "distance": 4.0,
        "scan": SCAN,
        "path_id": 4332,
        "path": [VPS[0], VPS[1], VPS[2]],
        "heading": 0.523,
        "instructions": ["Walk forward to the hall .",
                         "Go straight past the table .",
                         "Head to the far doorway ."],
    }]
    for split in ("train", "val_seen", "val_unseen"):
        with open(anno_dir / f"R2R_{split}.json", "w") as f:
            json.dump(anno, f)
    return root, deg30


def test_connectivity_schema(dataset_tree):
    from vln_magic_tpu.env.graph import load_connectivity

    root, _ = dataset_tree
    g = load_connectivity(str(root / "R2R" / "connectivity"), SCAN)
    # excluded node dropped entirely
    assert g.node_ids == VPS[:3]
    # positions from pose[3], pose[7], pose[11]
    np.testing.assert_allclose(g.positions[1], [2.0, 0.0, 1.5])
    # mutual unobstructed -> edge; asymmetric (0<->2) -> NO edge
    assert g.adjacency[0, 1] and g.adjacency[1, 0]
    assert g.adjacency[1, 2] and g.adjacency[2, 1]
    assert not g.adjacency[0, 2] and not g.adjacency[2, 0]
    # Euclidean edge weights + APSP through the middle node
    assert g.distance(VPS[0], VPS[1]) == pytest.approx(2.0)
    assert g.distance(VPS[0], VPS[2]) == pytest.approx(4.0)
    assert g.path(VPS[0], VPS[2]) == VPS[:3]


def test_scanvp_candidates_override_geometry(dataset_tree):
    from vln_magic_tpu.env.graph import load_connectivity
    from vln_magic_tpu.env.world import World, load_scanvp_candidates

    root, deg30 = dataset_tree
    g = load_connectivity(str(root / "R2R" / "connectivity"), SCAN)
    cands = load_scanvp_candidates(
        str(root / "R2R" / "annotations" / "scanvp_candview_relangles.json"))
    feat = lambda scan, ids: np.zeros((len(ids), 36, 8), np.float32)
    world = World([g], feat, 8, scanvp_cands=cands)
    t = world.tables

    # node 0: file entry [view 14, rel_heading 0.1, rel_elevation 0.05]
    assert t.cand_ids[0, 0, 0] == 1 and not t.cand_mask[0, 0, 1:].any()
    assert t.cand_view[0, 0, 0] == 14
    assert t.cand_heading[0, 0, 0] == pytest.approx(2 * deg30 + 0.1, rel=1e-5)
    assert t.cand_elevation[0, 0, 0] == pytest.approx(0.0 + 0.05, abs=1e-6)
    assert t.cand_dist[0, 0, 0] == pytest.approx(2.0)

    # node 1: the excluded-node candidate is dropped, two survive
    row = t.cand_ids[0, 1][t.cand_mask[0, 1]]
    assert sorted(row.tolist()) == [0, 2]

    # node 2 (absent from the file): synthesized from geometry
    assert t.cand_mask[0, 2, 0]
    assert t.cand_ids[0, 2, 0] == 1


def test_annotations_and_cli_real_branch_decode(dataset_tree, tmp_path):
    """The CLI's real-data branch (build_dataset with a mounted tree) must
    consume the fabricated formats end-to-end: annotations split per
    instruction, tokenizer fallback, candidate file, then a greedy decode."""
    from vln_magic_tpu.cli.main_nav import main

    root, _ = dataset_tree
    results = main([
        "--mode", "valid", "--name", "realfmt", "--output_dir", str(tmp_path),
        "--root_dir", str(root),
        "--student_hidden_size", "32", "--student_num_attention_heads", "2",
        "--num_l_layers", "1", "--num_pano_layers", "1", "--num_x_layers", "1",
        "--batch_size", "3", "--max_instr_len", "32", "--max_action_len", "3",
        "--max_gmap_len", "16",
    ])
    assert set(results) >= {"val_seen", "val_unseen"}
    for avg in results.values():
        assert np.isfinite(avg["sr"]) and np.isfinite(avg["nDTW"])

    # the annotation loader split 1 item x 3 instructions
    from vln_magic_tpu.data import HashTokenizer, construct_instrs

    items = construct_instrs(str(root / "R2R" / "annotations"), "r2r",
                             ["train"], HashTokenizer(2000), 32)
    assert [it["instr_id"] for it in items] == ["4332_0", "4332_1", "4332_2"]
    assert items[0]["path"] == VPS[:3]
