import json
import os

import numpy as np
import pytest

from vln_magic_tpu.data import HashFeatureStore, ImageFeatureStore, construct_instrs
from vln_magic_tpu.data.features import write_tsv_features
from vln_magic_tpu.data.tokenizer import HashTokenizer, get_tokenizer


def test_r2r_annotation_splitting(tmp_path):
    anno = [{
        "path_id": 42, "scan": "scanA", "heading": 1.5,
        "path": ["a", "b", "c"],
        "instructions": ["go left", "turn right then stop"],
    }]
    with open(tmp_path / "R2R_val_seen.json", "w") as f:
        json.dump(anno, f)
    tok = HashTokenizer(1000)
    items = construct_instrs(str(tmp_path), "r2r", ["val_seen"], tok,
                             max_instr_len=50)
    assert len(items) == 2
    assert items[0]["instr_id"] == "42_0" and items[1]["instr_id"] == "42_1"
    assert items[0]["path"] == ["a", "b", "c"]
    assert items[0]["instr_encoding"][0] == tok.bos_token_id


def test_rxr_english_filter(tmp_path):
    rows = [
        {"instruction_id": 1, "scan": "s", "path": ["a"], "language": "en-US",
         "instruction": "walk"},
        {"instruction_id": 2, "scan": "s", "path": ["a"], "language": "hi-IN",
         "instruction": "चलो"},
    ]
    with open(tmp_path / "RxR_val_seen_guide_enc_xlmr.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    items = construct_instrs(str(tmp_path), "rxr", ["val_seen"],
                             HashTokenizer(1000))
    assert len(items) == 1 and items[0]["instr_id"] == "1"
    # multilingual: explicit langs keep the Hindi split; None keeps all
    items = construct_instrs(str(tmp_path), "rxr", ["val_seen"],
                             HashTokenizer(1000), langs=("en", "hi"))
    assert len(items) == 2
    assert {it["language"] for it in items} == {"en-US", "hi-IN"}
    items = construct_instrs(str(tmp_path), "rxr", ["val_seen"],
                             HashTokenizer(1000), langs=None)
    assert len(items) == 2


def test_tsv_feature_roundtrip(tmp_path):
    feats = {"scanX_vp1": np.random.default_rng(0)
             .standard_normal((36, 8)).astype(np.float32)}
    path = str(tmp_path / "f.tsv")
    write_tsv_features(path, feats)
    store = ImageFeatureStore(path, 8, file_type="tsv")
    got = store.get("scanX", "vp1")
    np.testing.assert_allclose(got, feats["scanX_vp1"], rtol=1e-6)


def test_hash_store_deterministic():
    s1 = HashFeatureStore(16, seed=3)
    s2 = HashFeatureStore(16, seed=3)
    np.testing.assert_array_equal(s1.get("a", "b"), s2.get("a", "b"))
    assert not np.array_equal(s1.get("a", "b"), s1.get("a", "c"))


def test_hash_tokenizer():
    tok = get_tokenizer(None, vocab_size=500)
    ids = tok.encode("hello world hello")
    assert ids[0] == 0 and ids[-1] == 2
    assert ids[1] == ids[3]
    assert all(0 <= i < 500 for i in ids)


def test_cli_parser_accepts_reference_flags():
    from vln_magic_tpu.cli.main_nav import parse_args

    args = parse_args([
        "--mode", "valid", "--train_kdl", "--student_hidden_size", "128",
        "--kdl_adaptive_ability_weight", "--expert_policy", "ndtw",
        "--output_dir", "/tmp/_cli_parse_test",
        "--some_unknown_flag", "zzz",          # tolerated like the reference
    ])
    assert args.train_kdl and args.student_hidden_size == 128
    assert args.expert_policy == "ndtw"


def test_object_store_hdf5_roundtrip(tmp_path):
    """ObjectFeatureStore reads back write_hdf5_object_features exactly,
    including id/direction/size attrs and the max_objects truncation
    (reference obj store contract, pretrain_src/data/dataset.py:845-884)."""
    import numpy as np

    from vln_magic_tpu.data.features import (ObjectFeatureStore,
                                             write_hdf5_object_features)

    rng = np.random.default_rng(0)
    objs = {}
    for key in ("scanA_vp0", "scanA_vp1"):
        n = int(rng.integers(3, 7))
        objs[key] = (rng.standard_normal((n, 8)).astype(np.float32),
                     [str(i * 7) for i in range(n)],
                     rng.uniform(-1, 1, (n, 2)).astype(np.float32),
                     rng.uniform(10, 300, (n, 2)).astype(np.float32))
    path = str(tmp_path / "objs.h5")
    write_hdf5_object_features(path, objs)

    store = ObjectFeatureStore(path, obj_feat_size=8, max_objects=4)
    fts, attrs = store.get("scanA", "vp0")
    want_fts, want_ids, want_dirs, want_sizes = objs["scanA_vp0"]
    m = min(4, len(want_fts))
    assert fts.shape == (m, 8)
    np.testing.assert_allclose(fts, want_fts[:m])
    assert attrs["obj_ids"] == want_ids[:m]
    np.testing.assert_allclose(attrs["directions"], want_dirs[:m])
    np.testing.assert_allclose(attrs["sizes"], want_sizes[:m])
    # missing key -> empty objects, not an error
    fts2, attrs2 = store.get("scanA", "vp_missing")
    assert fts2.shape == (0, 8) and attrs2["obj_ids"] == []
