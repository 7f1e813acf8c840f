"""Pretraining loop: task-sampled MLM/MRC/SAP/CFP steps with in-step
teacher->student distillation.

Reconstructs the training loop the reference release omitted
(reference: pretrain_src/train_r2r_magic.py:398-410 jumps from setup straight
to validation; SURVEY §0.1): sample task -> forward -> supervised loss +
KD -> clip -> AdamW step, with the validators of train_r2r_magic.py:440-587.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import MagicConfig
from ..agent.losses import kd_loss, mse_loss
from .loader import ItemSampler, MetaLoader
from .model import (GlocalTextPathCMTPretrain, cfp_loss, mlm_loss, mrc_loss,
                    sap_loss)
from .tasks import PathDataBuilder


class PretrainTrainer:
    def __init__(self, cfg: MagicConfig, world, image_prob_size: int = 1000,
                 rng=None, builder_kwargs=None):
        self.cfg = cfg
        self.world = world
        if rng is None:
            rng = jax.random.PRNGKey(cfg.train.seed)
        k_s, k_t, self.rng = jax.random.split(rng, 3)
        self.model = GlocalTextPathCMTPretrain(cfg.model, image_prob_size)
        self.kdl = cfg.distill.train_kdl and cfg.teacher_model is not None
        self.teacher = None
        self.t_params = None
        bk = dict(angle_feat_size=cfg.model.angle_feat_size,
                  image_prob_size=image_prob_size,
                  vocab_size=cfg.model.vocab_size,
                  max_txt=cfg.env.max_instr_len)
        bk.update(builder_kwargs or {})
        self.builder = PathDataBuilder(world, **bk)
        dummy = self._dummy_batch()
        self.params = jax.jit(self.model.init)(k_s, dummy)
        if self.kdl:
            self.teacher = GlocalTextPathCMTPretrain(cfg.teacher_model,
                                                     image_prob_size)
            self.t_params = jax.jit(self.teacher.init)(k_t, dummy)
        # optimizer family + schedule by config, like the reference's
        # build_optimizer (pretrain_src/optim/misc.py: adamw/radam/
        # rangerlars selected by opts.optim, noam/warmup_linear schedules)
        from ..agent.trainer import make_optimizer

        self.opt = make_optimizer(cfg)
        # gradient_accumulation_steps (reference pretrain opts; MetaLoader
        # keeps the task fixed within each accumulation window)
        self.accum_steps = max(int(cfg.train.accum_steps), 1)
        if self.accum_steps > 1:
            self.opt = optax.MultiSteps(self.opt,
                                        every_k_schedule=self.accum_steps)
        self.opt_state = self.opt.init(self.params)
        self._steps = {}
        self.iteration = 0
        # dp mesh for sharded pretraining (the reference pretrains 2-GPU DDP,
        # run_r2r_magic.sh:4-8): batches shard over 'dp', params stay
        # tensor-parallel/replicated per parallel/sharding.py; XLA inserts
        # the gradient psum.  Set via use_mesh().
        self.mesh = None
        self._sampler = None
        self._loader = None

    def _dummy_batch(self):
        from ..env.synthetic import make_synthetic_instructions

        items = make_synthetic_instructions(
            self.world, 2, np.random.default_rng(0),
            vocab_size=self.cfg.model.vocab_size, min_path=2, max_path=3)
        b = self.builder.mrc_batch(items)
        b["mlm_labels"] = np.full_like(b["txt_ids"], -100)
        og = self.builder.og_batch(items)
        for k in ("obj_fts", "obj_loc_fts", "obj_masks", "og_labels"):
            b[k] = og[k]
        return {k: jnp.asarray(v) for k, v in b.items()}

    # ----- per-task losses -----

    def _task_loss(self, task, params, batch, rngs, model=None):
        model = model or self.model
        det = rngs is None
        if task == "mlm":
            logits = model.apply(params, batch, deterministic=det, rngs=rngs,
                                 method=type(model).mlm)
            loss, valid = mlm_loss(logits, batch["mlm_labels"])
            acc = (jnp.argmax(logits, -1) == jnp.maximum(batch["mlm_labels"], 0))
            acc = (acc * valid).sum() / jnp.maximum(valid.sum(), 1)
            return loss, logits, {"mlm_acc": acc}
        if task == "mrc":
            logits = model.apply(params, batch, deterministic=det, rngs=rngs,
                                 method=type(model).mrc)
            loss = mrc_loss(logits, batch["mrc_targets"],
                            batch["mrc_view_mask"])
            pred = jnp.argmax(logits, -1)
            tgt = jnp.argmax(batch["mrc_targets"], -1)
            m = batch["mrc_view_mask"]
            acc = ((pred == tgt) * m).sum() / jnp.maximum(m.sum(), 1)
            return loss, logits, {"mrc_acc": acc}
        if task == "sap":
            outs = model.apply(params, batch, deterministic=det, rngs=rngs,
                               method=type(model).sap)
            gl = sap_loss(outs["global_logits"], batch["sap_global_label"])
            ll = sap_loss(outs["local_logits"], batch["sap_local_label"])
            fl = sap_loss(outs["fused_logits"], batch["sap_global_label"])
            accs = {}
            for name, logit, label in (
                    ("gacc", outs["global_logits"], batch["sap_global_label"]),
                    ("lacc", outs["local_logits"], batch["sap_local_label"]),
                    ("facc", outs["fused_logits"], batch["sap_global_label"])):
                v = label != -100
                a = (jnp.argmax(logit, -1) == jnp.maximum(label, 0)) * v
                accs[f"sap_{name}"] = a.sum() / jnp.maximum(v.sum(), 1)
            return gl + ll + fl, outs["fused_logits"], accs
        if task == "og":
            logits = model.apply(params, batch, deterministic=det, rngs=rngs,
                                 method=type(model).og)
            loss = sap_loss(logits, batch["og_labels"])
            v = batch["og_labels"] != -100      # gt object absent -> ignore
            a = (jnp.argmax(logits, -1) ==
                 jnp.maximum(batch["og_labels"], 0)) * v
            return loss, logits, {"og_acc":
                                  a.sum() / jnp.maximum(v.sum(), 1)}
        if task == "cfp":
            embeds = model.apply(params, batch, deterministic=det, rngs=rngs,
                                 method=type(model).cfp)
            loss = cfp_loss(embeds, self.cfg.model.cfp_temperature)
            sim = embeds["txt"] @ embeds["fused"].T
            acc = (jnp.argmax(sim, -1) ==
                   jnp.arange(sim.shape[0])).mean()
            return loss, embeds, {"cfp_acc": acc}
        raise ValueError(task)

    def _kd_penalty(self, task, s_out, t_out, params):
        """In-step KD per task (pretrain kdl block, r2r_magic_pretrain.json;
        loss family pretrain_src/optim/kd_loss.py = nav minus loss_type).
        CFP embeddings are projected to teacher width via the student's
        txt/vp/gmap projection heads (the checkpoint-contract heads
        txt_emb_w / vp_txt_w / gmap_txt_w, agent_base.py:330)."""
        d = self.cfg.distill
        sg = jax.lax.stop_gradient
        if task == "cfp":
            if not self.cfg.model.kd_heads:
                return jnp.zeros(())
            proj = {"txt": "txt_emb_w", "vp": "vp_txt_w", "gmap": "gmap_txt_w"}
            tot = 0.0
            for k, head in proj.items():
                s_p = self.model.apply(
                    params, head, s_out[k],
                    method=type(self.model).bert_kd_project)
                tot = tot + mse_loss(s_p, sg(t_out[k]), loss_type="mean")
            return tot
        return kd_loss(s_out, sg(t_out), temperature=d.temperature,
                       loss_type="mean")

    def _make_step(self, task):
        kdl = self.kdl
        d = self.cfg.distill

        def loss_fn(params, t_params, batch, rng):
            rngs = {"dropout": rng}
            loss, s_out, metrics = self._task_loss(task, params, batch, rngs)
            if kdl:
                t_loss, t_out, _ = self._task_loss(task, t_params, batch,
                                                   None, model=self.teacher)
                kd = self._kd_penalty(task, s_out, t_out, params)
                metrics["kd"] = kd
                loss = (1 - d.alpha) * loss + d.alpha * kd
            metrics["loss"] = loss
            return loss, metrics

        # metric names are trace-time static per task; the jitted step
        # returns ONE packed f32 vector so the host pays a single device
        # round trip per step, not one per scalar (remote-tunnel lesson)
        metric_names = []

        def step(params, opt_state, t_params, batch, rng):
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, t_params, batch, rng)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            names = sorted(metrics)
            if not metric_names:
                metric_names.extend(names)
            packed = jnp.stack([jnp.asarray(metrics[k], jnp.float32)
                                for k in names])
            return params, opt_state, packed

        return jax.jit(step, donate_argnums=(0, 1)), metric_names

    def use_mesh(self, mesh):
        """Shard pretraining over a device mesh: replicate/TP the params,
        dp-shard every batch (the DDP-equivalent, SURVEY §2.4).  The
        optimizer state is param-shaped, so the same partition rules shard
        it in place — call AFTER any checkpoint restore."""
        from ..parallel import shard_params

        dp = mesh.shape.get("dp", 1)
        if self.cfg.train.batch_size % dp != 0:
            raise ValueError(
                f"global batch_size {self.cfg.train.batch_size} not "
                f"divisible by dp={dp}")
        self.mesh = mesh
        self.params = shard_params(self.params, mesh)
        if self.t_params is not None:
            self.t_params = shard_params(self.t_params, mesh)
        self.opt_state = shard_params(self.opt_state, mesh)
        return self

    def train_step(self, task, batch):
        if task not in self._steps:
            self._steps[task] = self._make_step(task)
        fn, names = self._steps[task]
        self.rng, k = jax.random.split(self.rng)
        if self.mesh is not None:
            from ..parallel import shard_batch

            batch = {k2: shard_batch(jnp.asarray(v), self.mesh)
                     for k2, v in batch.items()}
            with jax.set_mesh(self.mesh):
                self.params, self.opt_state, packed = fn(
                    self.params, self.opt_state, self.t_params, batch, k)
        else:
            batch = {k2: jnp.asarray(v) for k2, v in batch.items()}
            self.params, self.opt_state, packed = fn(
                self.params, self.opt_state, self.t_params, batch, k)
        self.iteration += 1
        # one D2H for all metrics
        return dict(zip(names, map(float, np.asarray(packed))))

    def fit(self, items, iters, task_ratios=None, batch_size=None,
            callback=None, prefetch: int = 2):
        bs = batch_size or self.cfg.train.batch_size
        # sampler/loader persist across fit() calls: a fresh pair per call
        # would replay the identical item permutation and task sequence
        # every interval
        if self._sampler is None:
            self._sampler = ItemSampler(items, bs, self.cfg.train.seed)
            sampler = self._sampler
            builders = {
                "mlm": lambda: self._fill(
                    "mlm", self.builder.mlm_batch(sampler.next_batch())),
                "mrc": lambda: self._fill(
                    "mrc", self.builder.mrc_batch(sampler.next_batch())),
                "sap": lambda: self._fill(
                    "sap", self.builder.sap_batch(sampler.next_batch())),
                "cfp": lambda: self._fill(
                    "cfp", self.builder.cfp_batch(sampler.next_batch())),
            }
            if self.builder.obj_db is not None:
                # REVERIE adds object grounding to the task mix (OGDataset)
                builders["og"] = lambda: self._fill(
                    "og", self.builder.og_batch(sampler.next_batch()))
            # all four R2R proxy tasks are in the default mix, matching the
            # reference's dataloader creation (train_r2r_magic.py:50-52).
            # An explicit task_ratios dict names the EXACT task set (the
            # reference only builds dataloaders for configured train_tasks).
            if task_ratios is None:
                ratios = {n: 1 for n in builders}
            else:
                ratios = {n: r for n, r in task_ratios.items() if r > 0}
                unknown = set(ratios) - set(builders)
                if unknown:
                    raise ValueError(f"unknown pretrain tasks: {unknown}")
                builders = {n: builders[n] for n in ratios}
            self._loader = MetaLoader(builders, ratios=ratios,
                                      seed=self.cfg.train.seed,
                                      accum_steps=self.accum_steps)
        self._sampler.items = items
        # host->device overlap: batch N+1 transfers while step N runs
        from .loader import PrefetchLoader

        stream = PrefetchLoader(self._loader, depth=prefetch)
        history = []
        for i, (task, batch) in zip(range(iters), stream):
            m = self.train_step(task, batch)
            m["task"] = task
            history.append(m)
            if callback:
                callback(i, task, m)
        return history

    def _fill(self, task, batch):
        # every task shares one jit signature family; add the keys the
        # jitted loss for that task expects
        if task != "mlm" and "mlm_labels" not in batch:
            batch["mlm_labels"] = np.full_like(batch["txt_ids"], -100)
        return batch

    # ----- validation (train_r2r_magic.py:440-587) -----

    def validate(self, items, batch_size=None, num_batches=4):
        bs = batch_size or self.cfg.train.batch_size
        sampler = ItemSampler(items, bs, 1234)
        out = {}
        # validate every proxy task like the reference (train_r2r_magic.py:
        # 419-420 validates mlm+mrc+sap; :476-501 validate_mrc)
        tasks = ("mlm", "mrc", "sap", "cfp") + (
            ("og",) if self.builder.obj_db is not None else ())
        for task in tasks:
            accs = []
            for _ in range(num_batches):
                batch = getattr(self.builder, f"{task}_batch")(
                    sampler.next_batch())
                batch = self._fill(task, batch)
                jb = {k: jnp.asarray(v) for k, v in batch.items()}
                _, _, metrics = self._task_loss(task, self.params, jb, None)
                accs.append({k: float(v) for k, v in metrics.items()})
            for k in accs[0]:
                out[k] = float(np.mean([a[k] for a in accs]))
        return out
