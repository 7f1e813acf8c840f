"""Rollout throughput benchmark.

Measures MAGIC-S (student, 128-d) greedy navigation throughput in
nav steps/sec/chip — one nav step = one full per-step pipeline (panorama
forward, gmap update + token assembly, dual-scale cross-modal forward, action
selection, environment transition) for one episode.  The driver's north-star
is >= 5,000 nav steps/sec/chip on TPU v5e (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

BASELINE_STEPS_PER_SEC = 5000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny CPU run")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--pallas", action="store_true", default=False,
                    help="fused pallas attention (wins for many-head models; "
                         "the 2-head MAGIC-S is faster on plain XLA)")
    ap.add_argument("--parity", action="store_true", default=False,
                    help="observed-subgraph graph semantics (GraphMap parity)")
    ap.add_argument("--profile", default=None,
                    help="capture a jax.profiler trace into this directory")
    args = ap.parse_args()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from vln_magic_tpu.config import EnvConfig, MagicConfig, ModelConfig, TrainConfig
    from vln_magic_tpu.agent import Navigator
    from vln_magic_tpu.agent.navigator import episodes_from_items, pad_instructions
    from vln_magic_tpu.env import make_synthetic_world
    from vln_magic_tpu.env.synthetic import make_synthetic_instructions

    if args.smoke:
        scans, nodes, feat, hidden, heads, layers = 1, 16, 32, 32, 2, 1
        batch = args.batch or 4
        iters = args.iters or 2
        max_gmap, t_steps, txt_len = 16, 4, 32
    else:
        # MAGIC-S: hidden 128, 6 lang + 2 pano + 3 cross layers, CLIP-768
        # features (reference parser.py:186-192, model config)
        scans, nodes, feat, hidden, heads, layers = 4, 96, 768, 128, 2, 6
        batch = args.batch or 128
        iters = args.iters or 8
        max_gmap, t_steps, txt_len = 64, 15, 64

    cfg = MagicConfig(
        model=ModelConfig(
            hidden_size=hidden, num_attention_heads=heads,
            num_l_layers=layers, num_pano_layers=2,
            num_x_layers=3 if not args.smoke else 1,
            image_feat_size=feat,
            use_pallas_attention=args.pallas and not args.smoke,
        ),
        env=EnvConfig(max_action_len=t_steps, max_gmap_len=max_gmap,
                      max_instr_len=txt_len,
                      observed_graph_parity=args.parity),
        train=TrainConfig(batch_size=batch, compute_dtype=args.dtype),
    )
    world = make_synthetic_world(num_scans=scans, nodes_per_scan=nodes,
                                 feat_dim=feat, seed=0)
    nav = Navigator(cfg, world)
    rng = np.random.default_rng(0)
    items = make_synthetic_instructions(world, batch, rng, min_path=3,
                                        max_path=6)
    # fixed-length instructions at the max to avoid bucket variance
    for it in items:
        it["instr_encoding"] = rng.integers(4, 1000, txt_len).astype(np.int32)

    txt_ids, txt_masks = pad_instructions(items, cfg.env.max_instr_len)
    state0 = episodes_from_items(nav.tables, world, items,
                                 nav.rollout.model_dims,
                                 observed_parity=args.parity)
    fn = nav._run_fn("argmax", None, True)
    key = jax.random.PRNGKey(0)

    # compile + warmup
    out = fn(nav.params, state0, jnp.asarray(txt_ids), jnp.asarray(txt_masks),
             key, {})
    jax.block_until_ready(out)

    if args.profile:
        jax.profiler.start_trace(args.profile)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(nav.params, state0, jnp.asarray(txt_ids),
                 jnp.asarray(txt_masks), key, {})
    jax.block_until_ready(out)
    wall = time.perf_counter() - t0
    if args.profile:
        jax.profiler.stop_trace()

    nav_steps = batch * t_steps * iters
    sps = nav_steps / wall
    print(json.dumps({
        "metric": "nav_steps_per_sec_per_chip",
        "value": round(sps, 1),
        "unit": "steps/s/chip",
        "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
