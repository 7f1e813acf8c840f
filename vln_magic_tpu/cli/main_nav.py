"""Navigation train/valid orchestration CLI.

Drop-in counterpart of the reference entry point (reference:
map_nav_src/r2r/main_nav.py + parser.py): accepts the reference's public flag
names verbatim (unknown flags are tolerated, as upstream does via
``parse_known_args``), builds the dataset envs, and runs
``--mode train|valid``.  Model selection follows the reference: spl+sr for
R2R, nDTW+SDTW for RxR (main_nav.py:473-486).

When the Matterport dataset tree is absent, the synthetic world backend is
used so the full pipeline remains exercisable (SURVEY §4's fake-backend
strategy).

Usage:
    python -m vln_magic_tpu.cli.main_nav --mode train --name exp1 ...
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="vln_magic_tpu navigation")
    # identity / IO (reference parser.py:8-31)
    p.add_argument("--root_dir", type=str, default="")
    p.add_argument("--dataset", type=str, default="r2r", choices=["r2r", "rxr"])
    p.add_argument("--output_dir", type=str, default="runs")
    p.add_argument("--name", type=str, default="debug")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mode", type=str, required=True)
    p.add_argument("--tokenizer", default="roberta")
    # RxR language filter; the reference hard-codes English
    # (data_utils.py:163-178).  "en hi te" or "all" keeps multilingual
    # splits (RxR ships XLM-R encodings, so no retokenization needed).
    p.add_argument("--langs", nargs="+", default=["en"])
    p.add_argument("--iters", type=int, default=200000)
    p.add_argument("--log_every", type=int, default=1000)
    p.add_argument("--eval_first", action="store_true", default=False)
    # data (parser.py:33-36)
    p.add_argument("--max_instr_len", type=int, default=200)
    p.add_argument("--max_action_len", type=int, default=15)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--ignoreid", type=int, default=-100)
    p.add_argument("--for_debug", action="store_true", default=False)
    # checkpoints (parser.py:38-44)
    p.add_argument("--resume_file", default=None)
    p.add_argument("--teacher_resume_file", default=None)
    p.add_argument("--bert_ckpt_file", default=None)
    p.add_argument("--aug", default=None)
    # optimization (parser.py:73-101)
    p.add_argument("--ml_weight", type=float, default=0.2)
    p.add_argument("--optim", type=str, default="adamW")
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--train_alg", choices=["imitation", "dagger"],
                   default="dagger")
    p.add_argument("--dagger_sample", default="sample")
    p.add_argument("--feedback", type=str, default="sample")
    p.add_argument("--expert_policy", default="spl", choices=["spl", "ndtw"])
    p.add_argument("--use_lr_sch", action="store_true", default=False)
    p.add_argument("--lr_sch", type=str, default="polynomial")
    p.add_argument("--test", action="store_true", default=False)
    p.add_argument("--submit", action="store_true", default=False)
    # model dims (parser.py:56-58, 173-195)
    p.add_argument("--num_l_layers", type=int, default=6)
    p.add_argument("--num_pano_layers", type=int, default=2)
    p.add_argument("--num_x_layers", type=int, default=3)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--feat_dropout", type=float, default=0.4)
    p.add_argument("--features", type=str, default="clip768")
    p.add_argument("--angle_feat_size", type=int, default=4)
    p.add_argument("--student_hidden_size", type=int, default=384)
    p.add_argument("--student_num_attention_heads", type=int, default=6)
    p.add_argument("--teacher_hidden_size", type=int, default=768)
    p.add_argument("--teacher_num_attention_heads", type=int, default=12)
    # distillation (parser.py:145-197)
    p.add_argument("--train_kdl", action="store_true", default=False)
    p.add_argument("--train_kdl_noFeat", action="store_true", default=False)
    p.add_argument("--train_kdl_noAttn", action="store_true", default=False)
    p.add_argument("--train_kdl_noLogit", action="store_true", default=False)
    p.add_argument("--kd_ability_types", nargs="+", type=str,
                   default=["txt", "img", "local", "global", "action"])
    p.add_argument("--kdl_feat_loss", type=str, default="mse")
    p.add_argument("--kdl_attn_loss", type=str, default="mse")
    p.add_argument("--kdl_logit_loss", type=str, default="kd")
    p.add_argument("--kdl_temperature", type=float, default=1)
    p.add_argument("--kdl_alpha", type=float, default=0.5)
    p.add_argument("--kdl_dkd_alpha", type=float, default=1.0)
    p.add_argument("--kdl_dkd_beta", type=float, default=8.0)
    p.add_argument("--kd_loss_type", type=str, default="sum")
    p.add_argument("--train_kdl_teacher", action="store_true", default=False)
    p.add_argument("--t_lr", type=float, default=5e-6)
    p.add_argument("--t_kdl_alpha", type=float, default=0.5)
    p.add_argument("--kdl_adaptive_ability_weight", action="store_true",
                   default=False)
    p.add_argument("--kdl_adaptive_ability_weight_type", type=str, default="RW")
    p.add_argument("--rw_temp", type=float, default=1.0)
    p.add_argument("--aw_update_iter", type=int, default=3000)
    p.add_argument("--teacher_sample_hard_mining", action="store_true",
                   default=False)
    p.add_argument("--t_sample_preprocess", type=str, default="exp")
    p.add_argument("--t_sample_preprocess_exp_decay", type=float, default=0.7)
    # causal learning (parser.py:128-143)
    p.add_argument("--do_back_img", action="store_true", default=False)
    p.add_argument("--do_back_txt", action="store_true", default=False)
    p.add_argument("--do_front_img", action="store_true", default=False)
    p.add_argument("--do_front_his", action="store_true", default=False)
    p.add_argument("--do_front_txt", action="store_true", default=False)
    p.add_argument("--do_back_txt_type", type=str, default="type_2")
    p.add_argument("--do_add_method", type=str, default="door")
    p.add_argument("--z_instr_update", action="store_true", default=False)
    p.add_argument("--update_iter", type=int, default=3000)
    p.add_argument("--front_n_clusters", type=int, default=24)
    # remaining reference flags, verbatim names (map_nav_src/r2r/parser.py).
    # Wired ones are consumed below / via config._FLAG_MAP; the rest are
    # accepted no-ops whose reference role the TPU design absorbs (ranks ->
    # one mesh; dataloader workers -> device tables; etc.)
    p.add_argument("--world_size", type=int, default=1)       # dp size hint
    p.add_argument("--local_rank", type=int, default=-1)      # mesh replaces ranks
    p.add_argument("--node_rank", type=int, default=0)
    # multi-chip mesh (framework flags; the reference's counterpart is
    # torch.distributed.launch + DDP, main_nav.py:681, agent_base.py:114).
    # --dp default: every local device on an accelerator backend, 1 on CPU
    # (virtual CPU meshes are a test artifact — opt in with an explicit
    # --dp).  --batch_size stays PER-CHIP, DDP semantics: the global batch
    # is batch_size x dp.
    p.add_argument("--dp", type=int, default=None,
                   help="data-parallel mesh axis (episode-batch sharding); "
                        "default: jax.device_count()/mp on TPU, 1 on CPU")
    p.add_argument("--mp", type=int, default=1,
                   help="tensor/model-parallel mesh axis (Megatron-style "
                        "column/row kernel splits, parallel/sharding.py)")
    p.add_argument("--num_workers", type=int, default=0)      # tables, no loaders
    p.add_argument("--enc_full_graph", action="store_true", default=True)
    p.add_argument("--fusion", default="dynamic",
                   choices=["global", "local", "avg", "dynamic"])
    p.add_argument("--expl_max_ratio", type=float, default=0.6)
    p.add_argument("--gamma", type=float, default=0.9)
    p.add_argument("--entropy_loss_weight", type=float, default=0.01)
    p.add_argument("--cat_file", type=str, default=None)      # landmark categories
    p.add_argument("--featdropout", type=float, default=None) # legacy alias
    p.add_argument("--image_feat_size", type=int, default=None)
    p.add_argument("--views", type=int, default=36)
    p.add_argument("--ensemble_n", type=int, default=1)       # MC-dropout eval
    p.add_argument("--save_optimizer", action="store_true", default=False)
    p.add_argument("--resume_optimizer", action="store_true", default=False)
    p.add_argument("--loadOptim", dest="load_optim", action="store_const",
                   default=False, const=True)                 # legacy alias
    p.add_argument("--do_back_img_type", type=str, default="type_1")
    p.add_argument("--act_visited_nodes", action="store_true", default=False)
    p.add_argument("--fix_lang_embedding", action="store_true", default=False)
    p.add_argument("--fix_local_branch", action="store_true", default=False)
    p.add_argument("--fix_pano_embedding", action="store_true", default=False)
    p.add_argument("--accumulateGrad", dest="accumulate_grad",
                   action="store_const", default=False, const=True)
    p.add_argument("--epsilon", type=float, default=0.1)
    p.add_argument("--decay", dest="weight_decay", type=float, default=0.0)
    # per-role dims (parser.py:173-195); None -> the shared --num_* values
    for role in ("student", "teacher"):
        p.add_argument(f"--{role}_num_l_layers", type=int, default=None)
        p.add_argument(f"--{role}_num_pano_layers", type=int, default=None)
        p.add_argument(f"--{role}_num_x_layers", type=int, default=None)
        p.add_argument(f"--{role}_mlp_ratio", type=int, default=None)
        p.add_argument(f"--{role}_intermediate_size", type=int, default=None)
        p.add_argument(f"--{role}_bert_ckpt_file", default=None)
    # intervention dictionary files (parser.py:236-259): when provided, the
    # z-dicts load from these TSVs instead of being rebuilt from the model
    p.add_argument("--backdoor_dict_file", default=None)
    p.add_argument("--s_backdoor_dict_file", default=None)
    p.add_argument("--t_backdoor_dict_file", default=None)
    p.add_argument("--frontdoor_dict_file", default=None)
    p.add_argument("--s_frontdoor_dict_file", default=None)
    p.add_argument("--t_frontdoor_dict_file", default=None)
    # speaker / back-translation (parser.py:103-126)
    p.add_argument("--speaker", default=None)                 # speaker ckpt
    p.add_argument("--use_transpeaker", action="store_true", default=False)
    p.add_argument("--use_drop", action="store_true", default=False)
    p.add_argument("--speaker_dropout", type=float, default=0.2)
    p.add_argument("--speaker_angle_size", type=int, default=128)
    p.add_argument("--speaker_layer_num", type=int, default=3)
    p.add_argument("--speaker_head_num", type=int, default=4)
    p.add_argument("--maxDecode", dest="max_decode", type=int, default=120)
    p.add_argument("--wemb", type=int, default=256)
    p.add_argument("--hDim", dest="h_dim", type=int, default=512)
    p.add_argument("--proj_hidden", type=int, default=1024)
    p.add_argument("--aemb", type=int, default=64)
    p.add_argument("--subout", dest="sub_out", type=str, default="tanh")
    p.add_argument("--use_aug_env", action="store_true", default=False)
    p.add_argument("--env_edit", action="store_true", default=False)
    p.add_argument("--obj_features", type=str, default="vitbase")
    p.add_argument("--obj_ft_dim", type=int, default=768)
    # env shape (framework addition: the reference pads gmaps to the batch
    # max; fixed shapes need the budget explicit and raisable per dataset)
    p.add_argument("--max_gmap_len", type=int, default=None,
                   help="gmap token budget; default 128 (r2r) / 208 (rxr: "
                        "28 actions can observe ~170 nodes)")
    p.add_argument("--feat_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="view-feature table storage dtype; bfloat16 halves "
                        "its HBM (~1.7 vs ~3.4 GB at 90 scans), compute "
                        "stays f32")
    p.add_argument("--aug_times", type=int, default=1)
    p.add_argument("--detailed_output", action="store_true", default=False)
    # preemption safety (SURVEY §5.3 rebuild item): resume from the latest
    # emergency/periodic train state automatically
    p.add_argument("--auto_resume", action="store_true", default=False)
    # synthetic fallback knobs (framework addition)
    p.add_argument("--synthetic_scans", type=int, default=2)
    p.add_argument("--synthetic_nodes", type=int, default=24)
    p.add_argument("--synthetic_items", type=int, default=64)
    # None sentinel: --mode serve must NOT silently shrink a production
    # model just because no dataset tree is mounted (robot deployments have
    # none); the rewrite applies only when set explicitly there
    p.add_argument("--synthetic_feat_dim", type=int, default=None)
    # --mode serve knobs (online robot control loop, agent/serving.py)
    p.add_argument("--serve_max_nodes", type=int, default=None,
                   help="node-slot budget of an online serving session; "
                        "default follows the dataset's --max_gmap_len")
    p.add_argument("--serve_bundle", type=str, default=None,
                   help="load the serving endpoint from an AOT deployment "
                        "bundle directory (NavServer.export_bundle).  The "
                        "bundle pins the FULL config and slot budgets: "
                        "--resume_file, --serve_max_nodes/--serve_max_cands, "
                        "--fusion and every other model/env flag are ignored "
                        "(a warning is printed if passed)")
    p.add_argument("--export_serve_bundle", type=str, default=None,
                   help="write an AOT serving bundle to this directory and "
                        "exit (use with --mode serve; --resume_file supplies "
                        "the weights)")
    p.add_argument("--serve_bundle_int8", action="store_true", default=False,
                   help="store the exported bundle's weights per-channel "
                        "int8 (~4x smaller artifact; dequantized at load)")
    p.add_argument("--serve_bundle_platforms", type=str, default=None,
                   help="comma-separated lowering targets for "
                        "--export_serve_bundle (e.g. 'cpu,tpu'); default "
                        "pins the bundle to THIS process's backend "
                        "(recorded in meta.json — a mismatched robot host "
                        "refuses the bundle with a diagnosable error)")
    p.add_argument("--serve_max_cands", type=int, default=10,
                   help="candidate-slot budget per node in serving mode")

    args, _ = p.parse_known_args(argv)
    import sys as _sys

    args._raw_argv = list(argv) if argv is not None else _sys.argv[1:]
    # legacy aliases
    args.resume_optimizer = args.resume_optimizer or args.load_optim
    out_root = os.path.join(args.output_dir,
                            "navigator" if "train" in args.mode else "test",
                            args.name)
    args.ckpt_dir = os.path.join(out_root, "ckpts")
    args.log_dir = os.path.join(out_root, "logs")
    args.pred_dir = os.path.join(out_root, "preds")
    for d in (args.ckpt_dir, args.log_dir, args.pred_dir):
        os.makedirs(d, exist_ok=True)
    args.connectivity_dir = os.path.join(args.root_dir, "R2R", "connectivity")
    args.anno_dir = os.path.join(args.root_dir, "R2R", "annotations")
    args.img_ft_file = os.path.join(args.root_dir, "R2R", "features",
                                    "CLIP-ViT-B-16-views.hdf5")
    # EnvEdit-augmented feature table (reference postprocess_args:220-227)
    args.aug_img_ft_file = os.path.join(
        args.root_dir, "EnvEdit", "hamt_features",
        "CLIP-ViT-B-16-views-st-samefilter.hdf5")
    return args


def build_dataset(args, cfg):
    """World + per-split item lists; real data when mounted, synthetic
    otherwise (main_nav.py:31-163 equivalent)."""
    from ..env.world import World
    from ..env.graph import load_connectivity

    feat_dim = cfg.model.image_feat_size
    # bf16 halves the [S, N, 36, D] feature-table HBM (~3.4 GB f32 at 90
    # Matterport scans x 768-d CLIP); compute casts to f32 at the read
    # (rollout.assemble_pano)
    import ml_dtypes

    feat_dtype = (ml_dtypes.bfloat16 if getattr(args, "feat_dtype", "float32")
                  == "bfloat16" else np.float32)
    if os.path.isdir(args.connectivity_dir):
        from ..data import ImageFeatureStore, construct_instrs, get_tokenizer
        from ..data.annotations import attach_path_indices
        from ..data.features import HashFeatureStore

        tok = get_tokenizer(os.path.join(args.root_dir, "pretrained", "roberta"))
        splits = {}
        # the test env exists for leaderboard submission (main_nav.py:617-622)
        names = ["train", "val_seen", "val_unseen"]
        if args.test or args.submit:
            names.append("test")
        for split in names:
            try:
                splits[split] = construct_instrs(
                    args.anno_dir, args.dataset, [split], tok,
                    args.max_instr_len, args.for_debug,
                    langs=None if "all" in args.langs else tuple(args.langs))
            except FileNotFoundError:
                continue
        # EnvEdit/aug annotation file for the aug-alternation env
        # (--aug, main_nav.py aug env; reference parser.py:41)
        if args.aug and os.path.exists(args.aug):
            splits["aug"] = construct_instrs(
                os.path.dirname(args.aug), args.dataset,
                [os.path.basename(args.aug)], tok, args.max_instr_len,
                args.for_debug)
        scans = sorted({it["scan"] for items in splits.values() for it in items})
        store = ImageFeatureStore(args.img_ft_file, feat_dim) \
            if os.path.exists(args.img_ft_file) else HashFeatureStore(feat_dim)
        graphs = [load_connectivity(args.connectivity_dir, s) for s in scans]
        # precomputed candidate views/angles (parser.py:261); synthesized
        # from connectivity geometry when the file is absent
        scanvp_cands = None
        cands_path = os.path.join(args.anno_dir,
                                  "scanvp_candview_relangles.json")
        if os.path.exists(cands_path):
            from ..env.world import load_scanvp_candidates

            scanvp_cands = load_scanvp_candidates(cands_path)
        world = World(graphs, store.feature_fn(), feat_dim,
                      feat_dtype=feat_dtype, scanvp_cands=scanvp_cands)
        splits = {k: attach_path_indices(v, world) for k, v in splits.items()}
        aug_features = None
        if args.env_edit or args.use_aug_env:
            # EnvEdit alternate feature table, same [S, N, 36, D] layout
            aug_store = (ImageFeatureStore(args.aug_img_ft_file, feat_dim)
                         if os.path.exists(args.aug_img_ft_file)
                         else HashFeatureStore(feat_dim, seed=1))
            aug_features = _build_aug_table(world, aug_store)
        return world, splits, aug_features

    # synthetic fallback
    from ..env.synthetic import make_synthetic_instructions, make_synthetic_world

    world = make_synthetic_world(
        num_scans=args.synthetic_scans, nodes_per_scan=args.synthetic_nodes,
        feat_dim=feat_dim, seed=args.seed, feat_dtype=feat_dtype)
    rng = np.random.default_rng(args.seed)
    n = args.synthetic_items
    splits = {
        "train": make_synthetic_instructions(world, n, rng),
        "val_seen": make_synthetic_instructions(world, max(n // 4, 4), rng),
        "val_unseen": make_synthetic_instructions(world, max(n // 4, 4), rng),
    }
    if args.test or args.submit:
        splits["test"] = make_synthetic_instructions(world, max(n // 4, 4), rng)
    if args.aug:
        splits["aug"] = make_synthetic_instructions(world, n, rng)
    aug_features = None
    if args.env_edit or args.use_aug_env:
        from ..data.features import HashFeatureStore

        aug_features = _build_aug_table(
            world, HashFeatureStore(feat_dim, seed=args.seed + 1))
    return world, splits, aug_features


def _build_aug_table(world, store):
    """Materialize an alternate per-scan view-feature table matching
    world.tables.features (the EnvEdit aug DB, reference env.py:39,78)."""
    t = world.tables
    aug = np.zeros_like(np.asarray(t.features))
    fn = store.feature_fn()
    for si, g in enumerate(world.graphs):
        aug[si, : g.num_nodes] = fn(g.scan, g.node_ids)
    return aug


def _score(avg, dataset):
    # best-model criterion (main_nav.py:473-486)
    if dataset == "rxr":
        return avg["nDTW"] + avg["SDTW"]
    return avg["spl"] + avg["sr"]


def _make_cfp_builder(cfg, world):
    from ..pretrain.tasks import PathDataBuilder

    return PathDataBuilder(
        world, max_steps=min(cfg.env.max_action_len + 1, 20),
        max_gmap=cfg.env.max_gmap_len, max_txt=cfg.env.max_instr_len,
        angle_feat_size=cfg.model.angle_feat_size,
        vocab_size=cfg.model.vocab_size, seed=cfg.train.seed)


def refresh_intervention_dicts(args, cfg, trainer, world, items, it,
                               record=None):
    """Backdoor z-dict + frontdoor CFP dictionary refresh.

    The reference refreshes at iter 0, every ``update_iter``, and on each
    new-best (main_nav.py:218-222,439-444,488-494 via agent.update_z_dict and
    KMeansPicker.random_pick_front_features).  Rebuilds ``trainer.zdicts``
    in place; returns it.  Per-role jitted forwards are cached on the trainer
    so periodic refreshes reuse their compiles.
    """
    import dataclasses
    from types import SimpleNamespace

    import jax

    from ..agent.interventions import (KMeansPicker, WordPicker,
                                       build_rollout_zdicts,
                                       extract_cfp_features, save_cfp_tsv,
                                       update_backdoor_dict)
    from ..utils.logging import write_to_record_file

    cache = getattr(trainer, "_zrefresh_cache", None)
    if cache is None:
        cache = trainer._zrefresh_cache = {}

    roles = [("student", trainer.model, trainer.params, cfg.model)]
    if trainer.kdl and cfg.teacher_model is not None:
        roles.append(("teacher", trainer.teacher_model, trainer.t_params,
                      cfg.teacher_model))

    zd_all = {}
    for role, model, params, mcfg in roles:
        shim = SimpleNamespace(model=model, params=params,
                               cfg=dataclasses.replace(cfg, model=mcfg))
        back = front = None
        if mcfg.do_back_txt and args.z_instr_update:
            key = f"lang/{role}"
            if key not in cache:
                cache[key] = jax.jit(
                    lambda p, ids, mask, m=model: m.apply(
                        p, ids, mask, method=type(m).language))
            back = update_backdoor_dict(
                shim, items,
                WordPicker(cat_file=args.cat_file if args.cat_file
                           and os.path.exists(args.cat_file) else None),
                lang_fn=cache[key])
        if mcfg.do_front_txt or mcfg.do_front_img or mcfg.do_front_his:
            if "builder" not in cache:
                cache["builder"] = _make_cfp_builder(cfg, world)
            feats, ids = extract_cfp_features(shim, items, cache["builder"])
            save_cfp_tsv(os.path.join(
                args.ckpt_dir, f"cfp_features_{role}_{it}.tsv"), feats, ids)
            km = KMeansPicker(feats, args.front_n_clusters,
                              seed=cfg.train.seed)
            front = km.random_pick_front_features(
                np.random.default_rng(cfg.train.seed + it))
        z = build_rollout_zdicts(back, front, pad_entries=81)
        if z:
            zd_all[role] = z
    trainer.zdicts = zd_all
    if record and zd_all:
        write_to_record_file(
            f"iter {it}: refreshed intervention dicts for "
            f"{sorted(zd_all)}", record)
    return zd_all


def load_intervention_dict_files(args, cfg):
    """Load backdoor/frontdoor dictionaries from the reference's TSV files
    when their flags are given (parser.py:236-259; valid-script plumbing
    main_nav.py:574-592).  Returns {role: rollout-zdict} for roles with at
    least one file present; rebuild-from-model covers the rest."""
    from ..agent.interventions import (KMeansPicker, build_rollout_zdicts,
                                       load_backdoor_tsv, load_cfp_tsv)

    out = {}
    role_files = {
        "student": (args.s_backdoor_dict_file or args.backdoor_dict_file,
                    args.s_frontdoor_dict_file or args.frontdoor_dict_file),
        "teacher": (args.t_backdoor_dict_file or args.backdoor_dict_file,
                    args.t_frontdoor_dict_file or args.frontdoor_dict_file),
    }
    dims = {"student": cfg.model.hidden_size,
            "teacher": (cfg.teacher_model.hidden_size
                        if cfg.teacher_model else cfg.model.hidden_size)}
    for role, (back_f, front_f) in role_files.items():
        back = front = None
        if back_f and os.path.exists(back_f):
            back = load_backdoor_tsv(back_f, dims[role])
        if front_f and os.path.exists(front_f):
            feats, _ = load_cfp_tsv(front_f, dims[role])
            front = KMeansPicker(
                feats, args.front_n_clusters,
                seed=cfg.train.seed).random_pick_front_features(
                np.random.default_rng(cfg.train.seed))
        z = build_rollout_zdicts(back, front, pad_entries=81)
        if z:
            out[role] = z
    return out


def train(args, cfg, world, splits, aug_features=None, mesh=None):
    import signal

    from ..agent.navigator import Navigator
    from ..agent.trainer import Trainer
    from ..utils.checkpoint import load_torch_checkpoint, save_torch_checkpoint
    from ..utils.logging import MetricsLogger, write_to_record_file

    record = os.path.join(args.log_dir, "train.txt")
    logger = MetricsLogger(args.log_dir)
    with open(os.path.join(args.log_dir, "training_args.json"), "w") as f:
        json.dump({k: v for k, v in vars(args).items()
                   if isinstance(v, (int, float, str, bool, list, type(None)))},
                  f, indent=2)

    trainer = Trainer(cfg, world, aug_features=aug_features)
    resumed = False
    if args.auto_resume:
        # preemption recovery: pick up the full train state (params, both
        # optimizers, iteration, rng) written periodically / on SIGTERM
        resumed = trainer.load_state(args.ckpt_dir)
        if resumed:
            write_to_record_file(
                f"auto-resumed train state at iter {trainer.iteration}",
                record)
    if args.resume_file and not resumed:
        trainer.params, epoch, miss, unexp = load_torch_checkpoint(
            args.resume_file, template=trainer.params)
        trainer.iteration = epoch
        write_to_record_file(
            f"resumed {args.resume_file} (epoch {epoch}, "
            f"{len(miss)} missing, {len(unexp)} unexpected)", record)
        if args.resume_optimizer:
            # --resume_optimizer / legacy --loadOptim (parser.py:40,116)
            from ..utils.checkpoint import CheckpointManager

            mgr = CheckpointManager(args.resume_file + ".opt")
            if mgr.has("opt_state"):
                trainer.opt_state = mgr.restore("opt_state",
                                                template=trainer.opt_state)
                write_to_record_file("restored optimizer state", record)
    if args.teacher_resume_file and trainer.t_params is not None and not resumed:
        trainer.t_params, _, _, _ = load_torch_checkpoint(
            args.teacher_resume_file, template=trainer.t_params,
            drop_kd_heads=not cfg.distill.train_teacher)
    # pretraining trunk checkpoints: strip the bert. prefix, drop task heads
    # (parser.py:44 --bert_ckpt_file; per-role student/teacher variants)
    s_bert = args.student_bert_ckpt_file or args.bert_ckpt_file
    if s_bert and not resumed:
        from ..utils.checkpoint import pretrain_to_nav_key_map

        trainer.params, _, miss, _ = load_torch_checkpoint(
            s_bert, template=trainer.params,
            key_map=pretrain_to_nav_key_map)
        write_to_record_file(
            f"loaded pretrain trunk {s_bert} "
            f"({len(miss)} params left at init)", record)
    if args.teacher_bert_ckpt_file and trainer.t_params is not None \
            and not resumed:
        from ..utils.checkpoint import pretrain_to_nav_key_map

        trainer.t_params, _, _, _ = load_torch_checkpoint(
            args.teacher_bert_ckpt_file, template=trainer.t_params,
            key_map=pretrain_to_nav_key_map)
    if mesh is not None:
        # after every load: use_mesh shards whatever state the checkpoints
        # left (params TP/replicated, optimizer state alongside, tables
        # replicated); train_step dp-shards each episode batch
        trainer.use_mesh(mesh)
        write_to_record_file(
            f"mesh: dp={mesh.shape['dp']} x mp={mesh.shape['mp']}, global "
            f"batch {cfg.train.batch_size}", record)

    # SIGTERM (preemption) -> emergency train-state checkpoint, then exit.
    # Params/opt-state attributes are only rebound between steps, so the
    # handler always sees a consistent state (SURVEY §5.3 rebuild item; the
    # reference's GracefulKiller sets a flag nothing consumes,
    # speaker_utils.py:387-396).
    def _on_sigterm(signum, frame):
        path = trainer.save_state(args.ckpt_dir)
        write_to_record_file(
            f"SIGTERM at iter {trainer.iteration}: emergency train state "
            f"saved to {path}", record)
        raise SystemExit(143)

    prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
    # the preemption-safety contract is live from here on (and testable
    # before the first train-step compile lands)
    write_to_record_file("training loop armed (SIGTERM-safe)", record)

    nav = Navigator(cfg, world, params=trainer.params)
    if mesh is not None:
        nav.use_mesh(mesh)   # dp-sharded validation decodes
    grad_aw = (cfg.distill.adaptive_ability_weight
               and cfg.distill.adaptive_ability_weight_type == "grad"
               and trainer.kdl)
    needs_dicts = args.z_instr_update or cfg.model.do_front_txt \
        or cfg.model.do_front_img or cfg.model.do_front_his
    # dictionaries from files first (--*_backdoor/frontdoor_dict_file); the
    # iter-0 / periodic refresh overwrites them when z_instr_update is on
    file_dicts = load_intervention_dict_files(args, cfg)
    if file_dicts:
        trainer.zdicts = file_dicts
        write_to_record_file(
            f"loaded intervention dicts from files for "
            f"{sorted(file_dicts)}", record)

    # back-translation speaker for the aug alternation (--use_transpeaker;
    # the reference's self-train path, agent.py:737-752)
    speaker = speaker_tok = None
    if args.use_transpeaker and splits.get("aug"):
        from ..agent.speaker import Speaker, SpeakerTokenizer

        speaker_tok = SpeakerTokenizer.build(splits["train"])
        speaker = Speaker(
            world, feat_dim=cfg.model.image_feat_size,
            vocab_size=speaker_tok.vocab_size,
            max_steps=cfg.env.max_action_len,
            max_len=min(args.max_decode, 80), hidden=args.h_dim,
            layers=args.speaker_layer_num, heads=args.speaker_head_num,
            word_size=args.wemb,
            feat_dropout=args.featdropout or cfg.train.feat_dropout)
        if args.speaker:
            # pretrained speaker checkpoint (main_nav.py loads --speaker
            # into the aug path; format transpeaker.py:322-344; optimizer
            # state only under --loadOptim, transpeaker.py:349-351)
            ep = speaker.load(args.speaker, load_optim=args.load_optim)
            write_to_record_file(
                f"loaded speaker checkpoint {args.speaker} (epoch {ep})",
                record)

    def run_validation(it, save_best=True):
        nav.params = trainer.params
        new_best = False
        zd = ({"student": trainer.zdicts["student"]}
              if "student" in trainer.zdicts else None)
        for split, items in splits.items():
            if not split.startswith("val") or not items:
                continue
            (avg, _), _ = nav.evaluate(items, zdicts=zd)
            logger.log(it, {f"{split}/{k}": v for k, v in avg.items()
                            if isinstance(v, float)})
            write_to_record_file(
                f"  {split}: sr={avg['sr']:.1f} spl={avg['spl']:.1f} "
                f"nDTW={avg['nDTW']:.1f}", record)
            if avg.get("gmap_overflow"):
                write_to_record_file(
                    f"  WARNING: {split}: {int(avg['gmap_overflow'])} "
                    f"episodes overflowed max_gmap_len="
                    f"{cfg.env.max_gmap_len} (gmap tokens truncated); "
                    f"raise --max_gmap_len", record)
            score = _score(avg, args.dataset)
            if save_best and score > best[split]:
                best[split] = score
                new_best = True
                save_torch_checkpoint(
                    trainer.params,
                    os.path.join(args.ckpt_dir, f"best_{split}.pt"), epoch=it)
        return new_best

    best = {s: -1.0 for s in splits if s.startswith("val")}
    t0 = time.time()
    it = trainer.iteration

    # iter-0 dictionary build + optional pre-train validation
    # (main_nav.py:218-222 / --eval_first :229-284)
    if needs_dicts:
        refresh_intervention_dicts(args, cfg, trainer, world, splits["train"],
                                   it, record)
    if grad_aw:
        trainer.update_ability_grads(
            splits["train"][: cfg.train.batch_size])
    if args.eval_first:
        run_validation(it, save_best=False)

    aug_items = splits.get("aug")
    try:
        while it < args.iters:
            interval = min(args.log_every, args.iters - it)
            hist = trainer.fit(splits["train"], interval,
                               aug_items=aug_items,
                               speaker=speaker, speaker_tok=speaker_tok,
                               aug_times=args.aug_times if aug_items else 0)
            prev_it, it = it, it + interval
            mean = {k: float(np.mean([h[k] for h in hist if k in h]))
                    for k in hist[-1]}
            logger.log(it, {f"loss/{k}": v for k, v in mean.items()})
            if grad_aw:
                logger.log(it, {f"ability_grad/{i}": float(g) for i, g in
                                enumerate(trainer.ability_grads)})
            write_to_record_file(
                f"iter {it}/{args.iters} loss={mean.get('loss', 0):.3f} "
                f"({time.time() - t0:.0f}s)", record)
            ovf = sum(v for k, v in mean.items()
                      if k.endswith("gmap_overflow"))
            if ovf > 0:
                write_to_record_file(
                    f"  WARNING: ~{ovf:.1f} episodes/step overflowed "
                    f"max_gmap_len={cfg.env.max_gmap_len} (gmap tokens "
                    f"truncated); raise --max_gmap_len", record)

            # periodic refreshes on their own cadences
            # (main_nav.py:439-455)
            if needs_dicts and args.update_iter and \
                    prev_it // args.update_iter != it // args.update_iter:
                refresh_intervention_dicts(args, cfg, trainer, world,
                                           splits["train"], it, record)
            if grad_aw and args.aw_update_iter and \
                    prev_it // args.aw_update_iter != it // args.aw_update_iter:
                trainer.update_ability_grads(
                    splits["train"][: cfg.train.batch_size])

            new_best = run_validation(it)
            if new_best and needs_dicts:
                # new-best refresh (main_nav.py:488-494)
                refresh_intervention_dicts(args, cfg, trainer, world,
                                           splits["train"], it, record)
            # latest .pt (+ teacher_ prefix when co-training, + optimizer
            # sidecar under --save_optimizer) and the resumable train state
            trainer.save(os.path.join(args.ckpt_dir, "latest_dict.pt"),
                         save_optimizer=args.save_optimizer)
            trainer.save_state(args.ckpt_dir)
            if speaker is not None:
                # speaker snapshot in the transpeaker container format so a
                # later run can resume it via --speaker
                speaker.save(it, os.path.join(args.ckpt_dir,
                                              "speaker_latest.pt"))
    finally:
        signal.signal(signal.SIGTERM, prev_handler)
        logger.close()
    return trainer


def valid(args, cfg, world, splits, mesh=None):
    from ..agent.evaluator import Evaluator, submission_format
    from ..agent.navigator import Navigator
    from ..utils.checkpoint import load_torch_checkpoint
    from ..utils.dist import gather_predictions, is_primary, shard_items
    from ..utils.logging import write_to_record_file

    record = os.path.join(args.log_dir, "valid.txt")
    nav = Navigator(cfg, world)
    if args.resume_file:
        nav.params, epoch, _, _ = load_torch_checkpoint(
            args.resume_file, template=nav.params)
        write_to_record_file(f"loaded {args.resume_file} (epoch {epoch})",
                             record)
    if mesh is not None:
        # dp-sharded eval batches over the local mesh; multi-HOST sharding
        # stays the shard_items + gather_predictions path below
        nav.use_mesh(mesh)
        write_to_record_file(
            f"mesh: dp={mesh.shape['dp']} x mp={mesh.shape['mp']}", record)

    # intervention dictionaries: prefer the reference's TSV files when their
    # flags point at existing paths (main_nav.py:574-592), else rebuild them
    # from the loaded checkpoint (equivalent and dataset-free)
    zdicts = None
    file_dicts = load_intervention_dict_files(args, cfg)
    if "student" in file_dicts:
        zdicts = {"student": file_dicts["student"]}
    elif (cfg.model.do_back_txt or cfg.model.do_front_txt
            or cfg.model.do_front_img or cfg.model.do_front_his) \
            and splits.get("train"):
        from ..agent.interventions import (KMeansPicker, WordPicker,
                                           build_rollout_zdicts,
                                           extract_cfp_features,
                                           update_backdoor_dict)

        picker = WordPicker(cat_file=args.cat_file if args.cat_file
                            and os.path.exists(args.cat_file) else None)
        back = update_backdoor_dict(nav, splits["train"], picker) \
            if cfg.model.do_back_txt else None
        front = None
        if cfg.model.do_front_txt or cfg.model.do_front_img \
                or cfg.model.do_front_his:
            feats, _ = extract_cfp_features(
                nav, splits["train"], _make_cfp_builder(cfg, world))
            front = KMeansPicker(
                feats, args.front_n_clusters,
                seed=cfg.train.seed).random_pick_front_features(
                np.random.default_rng(cfg.train.seed))
        z = build_rollout_zdicts(back, front, pad_entries=81)
        zdicts = {"student": z} if z else None

    def eval_model(tag, navigator, zd=None):
        out = {}
        for split, items in splits.items():
            if split in ("train", "aug") or not items:
                continue
            t0 = time.time()
            # multi-host: contiguous eval shards per process, predictions
            # merged over the collective (reference sel_data_idxs +
            # all_gather, env.py:126-134, main_nav.py:606-607)
            my_items = shard_items(items)
            (local_avg, _), preds = navigator.evaluate(
                my_items, zdicts=zd, detailed_output=args.detailed_output,
                ensemble_n=args.ensemble_n)
            if local_avg.get("gmap_overflow"):
                write_to_record_file(
                    f"WARNING: {split}: {int(local_avg['gmap_overflow'])} "
                    f"episodes overflowed max_gmap_len="
                    f"{cfg.env.max_gmap_len} (gmap tokens truncated); "
                    f"raise --max_gmap_len", record)
            preds = gather_predictions(preds)
            if args.submit and tag == "" and is_primary():
                with open(os.path.join(args.pred_dir,
                                       f"submit_{split}.json"), "w") as f:
                    json.dump(submission_format(preds), f)
            if split == "test":
                # leaderboard split has no ground truth: submission only
                # (main_nav.py:617-622)
                write_to_record_file(
                    f"{tag}test: {len(preds)} predictions written "
                    f"(cost time: {time.time() - t0:.1f}s)", record)
                continue
            avg, _ = Evaluator(world, items).eval_metrics(preds)
            write_to_record_file(
                f"{tag}{split}: "
                f"{json.dumps({k: round(v, 2) for k, v in avg.items()})} "
                f"(cost time: {time.time() - t0:.1f}s)", record)
            out[split] = avg
        return out

    results = eval_model("", nav, zdicts)
    # the reference also validates the teacher model (main_nav.py:624-667)
    if args.train_kdl and args.teacher_resume_file and cfg.teacher_model:
        import dataclasses

        t_cfg = dataclasses.replace(cfg, model=cfg.teacher_model)
        t_nav = Navigator(t_cfg, world)
        t_nav.params, _, _, _ = load_torch_checkpoint(
            args.teacher_resume_file, template=t_nav.params,
            drop_kd_heads=True)
        if mesh is not None:
            t_nav.use_mesh(mesh)
        results.update({f"teacher_{k}": v
                        for k, v in eval_model("teacher ", t_nav).items()})
    return results


def extract_cfp(args, cfg, world, splits):
    """--mode extract_cfp_features: dump the frontdoor CFP feature TSV for
    the train split (reference main_nav.py:669-677 -> agent.py:1516-1561,
    consumed later by KMeansPicker for the frontdoor dictionaries)."""
    from ..agent.interventions import extract_cfp_features, save_cfp_tsv
    from ..agent.navigator import Navigator
    from ..utils.checkpoint import load_torch_checkpoint
    from ..utils.logging import write_to_record_file

    record = os.path.join(args.log_dir, "extract.txt")
    nav = Navigator(cfg, world)
    epoch = 0
    if args.resume_file:
        nav.params, epoch, _, _ = load_torch_checkpoint(
            args.resume_file, template=nav.params)
    feats, ids = extract_cfp_features(nav, splits["train"],
                                      _make_cfp_builder(cfg, world))
    out = os.path.join(args.pred_dir, f"cfp_features_{epoch}.tsv")
    save_cfp_tsv(out, feats, ids)
    write_to_record_file(
        f"extracted CFP features for {len(ids)} trajectories -> {out}",
        record)
    return out


def serve(args, cfg):
    """``--mode serve``: the online robot control loop as a JSON-lines
    protocol over stdin/stdout (agent/serving.py; the reference's
    "real-time efficiency" deployment claim, readme.md:4, with an actual
    endpoint).  Messages, one JSON object per line:

      -> {"type": "session", "instruction": [token ids]}
      <- {"type": "ready"}
      -> {"type": "observation", "node": str, "position": [x, y, z],
          "heading": float, "pano_feats": [[36 x D floats]] | base64(f32le),
          "candidates": [{"node", "position", "dist",
                          "heading"?, "elevation"?, "view"?}, ...]}
      <- {"type": "decision", "stop": bool, "target": str|null,
          "path": [node...], "latency_ms": float}
      -> {"type": "finish"}
      <- {"type": "final", "stop_node": str, "trajectory": [...], "steps": N}
      -> {"type": "save", "path": str}        # persist the live session
      <- {"type": "saved", "path": str, "steps": N}
      -> {"type": "restore", "path": str}     # resume a saved session
      <- {"type": "ready", "resumed": true, "steps": N}
      -> {"type": "quit"}

    The model compiles once at startup; every episode session reuses it.
    ``save``/``restore`` are the crash-recovery face of SURVEY §5.3: a robot
    control process can checkpoint its episode mid-flight and a restarted
    server continues it with identical decisions (NavSession.save/restore).
    """
    import base64
    import sys as _sys

    import jax
    import jax.numpy as jnp

    from ..agent.serving import Candidate, NavServer, NavSession, Observation
    from ..models import DualScaleVLNBert
    from ..models.vlnbert import dummy_step_batch
    from ..utils.checkpoint import load_torch_checkpoint

    if args.serve_bundle:
        # AOT path: programs + params + config come from the bundle; the
        # flax model is never traced (robot-host startup).  The bundle pins
        # the full config + slot budgets — warn on flags it will ignore.
        overridden = [f for f in (
            "--resume_file", "--serve_max_nodes", "--serve_max_cands",
            "--fusion", "--max_gmap_len", "--max_instr_len",
            "--student_hidden_size") if f in getattr(args, "_raw_argv", [])]
        if overridden:
            print(json.dumps({
                "type": "warning",
                "message": f"--serve_bundle pins the full config and slot "
                           f"budgets from meta.json; ignoring "
                           f"{' '.join(overridden)}"}), flush=True)
        server = NavServer.from_bundle(args.serve_bundle)
        cfg = server.cfg
        print(json.dumps({"type": "loaded", "bundle": args.serve_bundle}),
              flush=True)
    else:
        model = DualScaleVLNBert(cfg.model,
                                 dtype=jnp.dtype(cfg.train.compute_dtype))
        batch = dummy_step_batch(cfg.model, batch_size=1, txt_len=8,
                                 pano_len=args.serve_max_cands + 36,
                                 gmap_len=cfg.env.max_gmap_len)
        params = jax.jit(model.init)(jax.random.PRNGKey(cfg.train.seed),
                                     batch)
        if args.resume_file:
            params, epoch, _, _ = load_torch_checkpoint(args.resume_file,
                                                        template=params)
            print(json.dumps({"type": "loaded", "ckpt": args.resume_file,
                              "epoch": epoch}), flush=True)
        server = NavServer(cfg, params, max_nodes=args.serve_max_nodes,
                           max_cands=args.serve_max_cands, model=model)
    if args.export_serve_bundle:
        plats = (tuple(s.strip() for s in
                       args.serve_bundle_platforms.split(",") if s.strip())
                 if args.serve_bundle_platforms else None)
        server.export_bundle(args.export_serve_bundle,
                             platforms=plats,
                             quantize=args.serve_bundle_int8)
        print(json.dumps({"type": "exported",
                          "bundle": args.export_serve_bundle}), flush=True)
        return
    server.warmup()   # no mid-episode compiles in a robot control loop
    d = cfg.model.image_feat_size

    def _feats(x):
        if isinstance(x, str):
            return np.frombuffer(base64.b64decode(x),
                                 np.float32).reshape(36, d)
        return np.asarray(x, np.float32)

    sess = None
    for line in _sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            msg = json.loads(line)
            kind = msg.get("type")
            if kind == "session":
                sess = server.new_session(
                    np.asarray(msg["instruction"], np.int32))
                print(json.dumps({"type": "ready"}), flush=True)
            elif kind == "observation":
                dec = sess.step(Observation(
                    node=msg["node"], position=tuple(msg["position"]),
                    heading=float(msg.get("heading", 0.0)),
                    pano_feats=_feats(msg["pano_feats"]),
                    candidates=[Candidate(
                        node=c["node"], position=tuple(c["position"]),
                        dist=float(c["dist"]), heading=c.get("heading"),
                        elevation=c.get("elevation"), view=c.get("view"))
                        for c in msg["candidates"]]))
                print(json.dumps({
                    "type": "decision", "stop": dec.stop,
                    "target": dec.target, "path": dec.path,
                    "latency_ms": round(dec.latency_ms, 2)}), flush=True)
            elif kind == "finish":
                print(json.dumps({"type": "final", **sess.finish()}),
                      flush=True)
                sess = None
            elif kind == "save":
                sess.save(msg["path"])
                print(json.dumps({"type": "saved", "path": msg["path"],
                                  "steps": sess.t_step}), flush=True)
            elif kind == "restore":
                sess = NavSession.restore(server, msg["path"])
                print(json.dumps({"type": "ready", "resumed": True,
                                  "steps": sess.t_step}), flush=True)
            elif kind == "quit":
                break
            else:
                raise ValueError(f"unknown message type {kind!r}")
        except Exception as e:  # protocol errors must not kill the server
            print(json.dumps({"type": "error", "message": str(e)}),
                  flush=True)


def build_mesh(args):
    """Device mesh for --mode train/valid: dp x mp over the local devices
    (the reference's init_distributed + DDP wrap, main_nav.py:681).  Returns
    None for a 1x1 mesh (single device — no sharding machinery).  On a CPU
    backend the dp default is 1: virtual host devices exist for tests, and
    sharding over them on a 1-core box only adds overhead unless asked."""
    import jax

    from ..parallel import make_mesh

    mp = max(args.mp, 1)
    if args.dp is not None:
        dp = args.dp
    elif getattr(args, "world_size", 1) > 1:   # reference flag as a dp hint
        dp = args.world_size
    elif jax.default_backend() == "cpu":
        dp = 1
    else:
        dp = max(jax.device_count() // mp, 1)
    if dp * mp <= 1:
        return None
    n_dev = jax.device_count()
    if dp * mp > n_dev:
        raise SystemExit(
            f"--dp {dp} x --mp {mp} needs {dp * mp} devices; "
            f"{n_dev} visible")
    return make_mesh(dp * mp, mp=mp)


def default_max_gmap_len(dataset: str) -> int:
    """RxR trajectories are ~2x longer (28 actions, run_rxr_*.sh) and can
    observe well past 128 nodes; silent truncation there would surface only
    as gmap_overflow warnings."""
    return 208 if dataset == "rxr" else 128


def main(argv=None):
    args = parse_args(argv)
    from ..config import from_reference_flags

    if args.max_gmap_len is None:
        args.max_gmap_len = default_max_gmap_len(args.dataset)
    cfg = from_reference_flags(vars(args))
    explicit_synth = args.synthetic_feat_dim is not None
    if args.synthetic_feat_dim is None:
        args.synthetic_feat_dim = 64
    if not os.path.isdir(args.connectivity_dir) and \
            (args.mode != "serve" or explicit_synth):
        # synthetic fallback needs matching dims
        import dataclasses

        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, image_feat_size=args.synthetic_feat_dim,
                vocab_size=min(cfg.model.vocab_size, 2000)))
        if cfg.teacher_model is not None:
            cfg = dataclasses.replace(
                cfg, teacher_model=dataclasses.replace(
                    cfg.teacher_model,
                    image_feat_size=args.synthetic_feat_dim,
                    vocab_size=min(cfg.teacher_model.vocab_size, 2000)))
    if args.mode == "serve":
        return serve(args, cfg)
    mesh = build_mesh(args) if args.mode in ("train", "valid") else None
    if mesh is not None:
        # DDP semantics: --batch_size is per chip; scale the global batch by
        # the dp axis (reference: each rank rolls out batch_size episodes)
        import dataclasses

        dp = mesh.shape["dp"]
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, batch_size=cfg.train.batch_size * dp))
        print(f"mesh: dp={dp} x mp={mesh.shape['mp']} "
              f"(global batch {cfg.train.batch_size})")
    world, splits, aug_features = build_dataset(args, cfg)
    if args.mode == "train":
        return train(args, cfg, world, splits, aug_features, mesh=mesh)
    if args.mode == "valid":
        return valid(args, cfg, world, splits, mesh=mesh)
    if args.mode == "extract_cfp_features":
        return extract_cfp(args, cfg, world, splits)
    raise SystemExit(f"unknown mode {args.mode}")


if __name__ == "__main__":
    main()
