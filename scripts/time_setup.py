"""Phase-timing probe for large-world setup costs (docs/PERF.md).

Times world build (host Floyd-Warshall), Navigator init (table transfer),
and episode-state build at parity shapes.  Usage:
    python scripts/time_setup.py [--scans 61] [--batch 256]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=61)
    ap.add_argument("--nodes", type=int, default=320)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--feat_dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.environ.get("VLN_JAX_CACHE_DIR", "/tmp/vln_magic_tpu_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from vln_magic_tpu.agent import Navigator
    from vln_magic_tpu.agent.navigator import episodes_from_items
    from vln_magic_tpu.config import EnvConfig, MagicConfig, ModelConfig, TrainConfig
    from vln_magic_tpu.env import make_synthetic_world
    from vln_magic_tpu.env.synthetic import make_synthetic_instructions

    import ml_dtypes

    feat_dtype = (ml_dtypes.bfloat16 if args.feat_dtype == "bfloat16"
                  else np.float32)
    t0 = time.perf_counter()
    world = make_synthetic_world(num_scans=args.scans,
                                 nodes_per_scan=args.nodes,
                                 feat_dim=768, seed=0, feat_dtype=feat_dtype)
    print(f"world build: {time.perf_counter() - t0:.1f} s", flush=True)

    cfg = MagicConfig(
        model=ModelConfig(hidden_size=128, num_attention_heads=2,
                          num_l_layers=6, num_pano_layers=2, num_x_layers=3,
                          image_feat_size=768),
        env=EnvConfig(max_action_len=15, max_gmap_len=128, max_instr_len=200,
                      observed_graph_parity=True),
        train=TrainConfig(batch_size=args.batch, compute_dtype="bfloat16"),
    )
    t0 = time.perf_counter()
    nav = Navigator(cfg, world)
    print(f"navigator init: {time.perf_counter() - t0:.1f} s", flush=True)

    rng = np.random.default_rng(0)
    items = make_synthetic_instructions(world, args.batch, rng,
                                        min_path=4, max_path=7)
    t0 = time.perf_counter()
    state0 = episodes_from_items(nav.tables, world, items,
                                 nav.rollout.model_dims, observed_parity=True)
    jax.block_until_ready(state0)
    print(f"episode-state build (compile+run): {time.perf_counter() - t0:.1f} s",
          flush=True)
    t0 = time.perf_counter()
    state0 = episodes_from_items(nav.tables, world, items,
                                 nav.rollout.model_dims, observed_parity=True)
    jax.block_until_ready(state0)
    print(f"episode-state build (warm): {time.perf_counter() - t0:.2f} s",
          flush=True)
    # the feature-table H2D transfer streams async from early in world build;
    # episode init never reads it, so drain it explicitly — the first rollout
    # step would block here
    t0 = time.perf_counter()
    jax.block_until_ready(nav.tables.features)
    print(f"feature-table transfer drain: {time.perf_counter() - t0:.1f} s",
          flush=True)


if __name__ == "__main__":
    main()
