"""Measure the streaming auto-gate crossover (VERDICT r4 next #2).

``Navigator.evaluate`` auto-enables the continuous-batching decoder on the
assertion (docs/PERF.md round 4) that TRAINED agents run at a live fraction
~0.45 where lane refill wins; the only measurement so far was the bench's
untrained model at 0.79 where streaming LOSES (23.6k vs 29.7k).  This script
produces the missing number: train the synthetic agent with the README's IL
recipe, record its ACTUAL live fraction, and A/B ``evaluate`` with
stream=False (waves) vs stream=True (refill) at that regime.

Run on the TPU:  python scripts/measure_stream_gate.py [--iters 600]
CPU smoke:       python scripts/measure_stream_gate.py --smoke
Prints one JSON line: live fractions + steps/s for both paths + the winner.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=600,
                    help="IL training iterations (README recipe: 600)")
    ap.add_argument("--smoke", action="store_true", help="tiny CPU run")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--qmult", type=int, default=4,
                    help="episode queue = qmult x lanes")
    args = ap.parse_args()

    import os

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    cache = os.environ.get("VLN_JAX_CACHE_DIR", "/tmp/vln_magic_tpu_jax_cache")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from vln_magic_tpu.agent import Navigator
    from vln_magic_tpu.agent.trainer import Trainer
    from vln_magic_tpu.config import (EnvConfig, MagicConfig, ModelConfig,
                                      TrainConfig)
    from vln_magic_tpu.env import make_synthetic_world
    from vln_magic_tpu.env.synthetic import make_synthetic_instructions

    if args.smoke:
        scans, nodes, feat = 1, 16, 32
        hidden, heads, layers, xl, pl = 32, 2, 1, 1, 1
        max_gmap, t_steps, txt_len = 16, 4, 32
        lanes, train_bs = 4, 4
        iters = min(args.iters, 20)
    else:
        # the honest R2R bench shape (bench.py build_cfg)
        scans, nodes, feat = 3, 320, 768
        hidden, heads, layers, xl, pl = 128, 2, 6, 3, 2
        max_gmap, t_steps, txt_len = 128, 15, 200
        lanes, train_bs = 256, 16
        iters = args.iters

    cfg = MagicConfig(
        model=ModelConfig(hidden_size=hidden, num_attention_heads=heads,
                          num_l_layers=layers, num_pano_layers=pl,
                          num_x_layers=xl, image_feat_size=feat),
        env=EnvConfig(max_action_len=t_steps, max_gmap_len=max_gmap,
                      max_instr_len=txt_len),
        train=TrainConfig(batch_size=train_bs, compute_dtype="bfloat16",
                          train_alg="imitation", ml_weight=1.0, lr=1e-4,
                          remat=not args.smoke),
    )
    world = make_synthetic_world(num_scans=scans, nodes_per_scan=nodes,
                                 feat_dim=feat, seed=0)
    rng = np.random.default_rng(0)

    def mk_items(n, seed):
        r = np.random.default_rng(seed)
        its = make_synthetic_instructions(
            world, n, r, min_path=3 if args.smoke else 4,
            max_path=4 if args.smoke else 7)
        for it in its:
            it["instr_encoding"] = r.integers(4, 1000, txt_len) \
                .astype(np.int32)
        return its

    train_items = mk_items(64 if args.smoke else 2048, 1)
    q = lanes * args.qmult
    eval_items = mk_items(q, 2)

    # ---- train: the README's synthetic IL recipe ----
    trainer = Trainer(cfg, world)
    t0 = time.perf_counter()
    hist = trainer.fit(train_items, iters,
                       callback=lambda it, m: print(
                           f"  iter {it}: loss={m['loss']:.3f}",
                           file=sys.stderr),
                       log_every=max(iters // 6, 1))
    train_wall = time.perf_counter() - t0
    print(f"trained {iters} IL iters in {train_wall:.0f}s "
          f"(loss {hist[0]['loss']:.2f} -> {hist[-1]['loss']:.2f})",
          file=sys.stderr)

    nav = Navigator(cfg, world)
    nav.params = trainer.params

    # ---- live fraction of the TRAINED agent (batch path aux) ----
    import jax.numpy as jnp

    from vln_magic_tpu.agent.navigator import (episodes_from_items,
                                               pad_instructions)

    fn = nav._run_fn("argmax", None, True)
    key = jax.random.PRNGKey(0)

    def batch_block(measure_live=False):
        sem = 0
        out = None
        for i in range(0, q, lanes):
            chunk = eval_items[i : i + lanes]
            txt_ids, txt_masks = pad_instructions(chunk, txt_len)
            state0 = episodes_from_items(nav.tables, world, chunk,
                                         nav.rollout.model_dims)
            out = fn(nav.params, nav.tables, state0, jnp.asarray(txt_ids),
                     jnp.asarray(txt_masks), key, {})
            if measure_live:
                sem += int(out[1]["semantic_steps"])
        jax.block_until_ready(out)
        return sem

    sem = batch_block(measure_live=True)   # also compiles/warms
    live_frac = sem / (q * t_steps)
    print(f"trained live fraction: {live_frac:.3f} "
          f"({sem} semantic of {q * t_steps} pipeline steps)",
          file=sys.stderr)

    walls = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        batch_block()
        walls.append(time.perf_counter() - t0)
    batch_sps = sem / float(np.median(walls))

    # ---- streamed path, same trained params, same corpus ----
    se = nav.stream_eval(lanes)
    prep = se.prepare(eval_items, txt_len)
    out = se.run(nav.params, nav.tables, prepared=prep)   # compile + warm
    s_walls = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        out = se.run(nav.params, nav.tables, prepared=prep)
        s_walls.append(time.perf_counter() - t0)
    s_sem = int(out["semantic_steps"])
    stream_sps = s_sem / float(np.median(s_walls))
    stream_live = s_sem / (int(out["scan_steps"]) * lanes)

    print(json.dumps({
        "metric": "stream_gate_ab",
        "trained_iters": iters,
        "live_fraction_batch": round(live_frac, 3),
        "live_fraction_stream": round(stream_live, 3),
        "batch_steps_per_sec": round(batch_sps, 1),
        "stream_steps_per_sec": round(stream_sps, 1),
        "stream_over_batch": round(stream_sps / batch_sps, 3),
        "winner": "stream" if stream_sps > batch_sps else "batch",
        "shape": {"lanes": lanes, "queue": q, "T": t_steps, "scans": scans,
                  "nodes": nodes, "hidden": hidden, "feat_dim": feat},
    }))


if __name__ == "__main__":
    main()
