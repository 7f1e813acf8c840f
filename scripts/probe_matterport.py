"""Matterport-scale smoke probe: build the FULL-scale world, report table
memory, and run one eval batch end-to-end.

With a mounted dataset tree (``--connectivity_dir``/``--img_ft_file``) this
drives the real R2R assets; without one it builds a synthetic stand-in at the
same scale (default 61 train scans x 345 nodes x 36 views x 768-d CLIP
features — the shape the reference trains on, readme.md dataset table) so
scan-count-dependent paths (feature table residency, parity-mode walks) are
exercised before assets ever mount.

Usage:
    python scripts/probe_matterport.py                  # synthetic, f32
    python scripts/probe_matterport.py --feat_dtype bfloat16
    python scripts/probe_matterport.py --parity --scans 61 --nodes 345
    python scripts/probe_matterport.py --connectivity_dir <dir> \
        --img_ft_file <hdf5>                            # real assets
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--connectivity_dir", default="datasets/R2R/connectivity")
    ap.add_argument("--img_ft_file", default="")
    ap.add_argument("--anno_dir", default="datasets/R2R/annotations")
    ap.add_argument("--scans", type=int, default=61)
    ap.add_argument("--nodes", type=int, default=345)
    ap.add_argument("--feat_dim", type=int, default=768)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--feat_dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--parity", action="store_true",
                    help="observed-subgraph (GraphMap) semantics")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.environ.get("VLN_JAX_CACHE_DIR",
                           "/tmp/vln_magic_tpu_jax_cache")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)

    import ml_dtypes
    import numpy as np

    from vln_magic_tpu.config import (EnvConfig, MagicConfig, ModelConfig,
                                      TrainConfig)
    from vln_magic_tpu.agent.navigator import Navigator

    feat_dtype = (ml_dtypes.bfloat16 if args.feat_dtype == "bfloat16"
                  else np.float32)
    t0 = time.time()
    if os.path.isdir(args.connectivity_dir):
        from vln_magic_tpu.data import (ImageFeatureStore, construct_instrs,
                                        get_tokenizer)
        from vln_magic_tpu.data.annotations import attach_path_indices
        from vln_magic_tpu.data.features import HashFeatureStore
        from vln_magic_tpu.env.graph import load_connectivity
        from vln_magic_tpu.env.world import World

        tok = get_tokenizer("datasets/pretrained/roberta")
        items = construct_instrs(args.anno_dir, "r2r", ["val_unseen"], tok,
                                 200, for_debug=False)
        scans = sorted({it["scan"] for it in items})
        store = (ImageFeatureStore(args.img_ft_file, args.feat_dim)
                 if args.img_ft_file and os.path.exists(args.img_ft_file)
                 else HashFeatureStore(args.feat_dim))
        graphs = [load_connectivity(args.connectivity_dir, s) for s in scans]
        scanvp_cands = None
        cands_path = os.path.join(args.anno_dir,
                                  "scanvp_candview_relangles.json")
        if os.path.exists(cands_path):
            from vln_magic_tpu.env.world import load_scanvp_candidates

            scanvp_cands = load_scanvp_candidates(cands_path)
        world = World(graphs, store.feature_fn(), args.feat_dim,
                      feat_dtype=feat_dtype, scanvp_cands=scanvp_cands)
        items = attach_path_indices(items, world)[: args.batch]
        source = f"real ({len(scans)} scans)"
    else:
        from vln_magic_tpu.env.synthetic import (make_synthetic_instructions,
                                                 make_synthetic_world)

        world = make_synthetic_world(
            num_scans=args.scans, nodes_per_scan=args.nodes,
            feat_dim=args.feat_dim, seed=0, feat_dtype=feat_dtype)
        items = make_synthetic_instructions(
            world, args.batch, np.random.default_rng(0), min_path=4,
            max_path=7)
        source = f"synthetic stand-in ({args.scans} scans x {args.nodes})"
    build_s = time.time() - t0

    t = world.tables
    feat_gb = t.features.nbytes / 1e9
    aux_gb = sum(getattr(t, f).nbytes for f in
                 ("dist", "steps", "next_hop", "cand_ids", "cand_dist",
                  "cand_view", "cand_heading", "cand_elevation", "cand_mask",
                  "positions", "node_mask")) / 1e9
    print(f"world: {source}, built in {build_s:.1f}s", file=sys.stderr)
    print(f"feature table {tuple(t.features.shape)} {t.features.dtype}: "
          f"{feat_gb:.2f} GB; graph/geometry tables: {aux_gb:.2f} GB",
          file=sys.stderr)

    cfg = MagicConfig(
        model=ModelConfig(hidden_size=128, num_attention_heads=2,
                          num_l_layers=6, num_pano_layers=2, num_x_layers=3,
                          image_feat_size=args.feat_dim),
        env=EnvConfig(max_action_len=15, max_gmap_len=128, max_instr_len=200,
                      observed_graph_parity=args.parity),
        train=TrainConfig(batch_size=args.batch, compute_dtype="bfloat16"),
    )
    nav = Navigator(cfg, world)
    rng = np.random.default_rng(0)
    for it in items:
        it["instr_encoding"] = rng.integers(4, 1000, 200).astype(np.int32)

    t0 = time.time()
    (avg, _), _ = nav.evaluate(items, batch_size=args.batch)
    wall = time.time() - t0
    steps = args.batch * cfg.env.max_action_len
    print(f"one eval batch ({args.batch} episodes): {wall:.1f}s incl. "
          f"compile; gmap_overflow={int(avg.get('gmap_overflow', 0))}",
          file=sys.stderr)

    t0 = time.time()
    (avg, _), _ = nav.evaluate(items, batch_size=args.batch)
    warm = time.time() - t0
    print(json.dumps({
        "scans": int(t.features.shape[0]),
        "nodes": int(t.features.shape[1]),
        "feat_dtype": str(t.features.dtype),
        "feature_table_gb": round(feat_gb, 2),
        "graph_tables_gb": round(aux_gb, 2),
        "parity": bool(args.parity),
        "warm_eval_steps_per_sec": round(steps / warm, 1),
        "sr": round(float(avg["sr"]), 2),
    }))


if __name__ == "__main__":
    main()
