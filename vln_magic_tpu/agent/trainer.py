"""Training: IL / DAgger fine-tuning with fused MAKD distillation and ICoD.

Replaces the reference's train loop (reference: map_nav_src/r2r/agent_base.py:
215-296, agent.py:431-544, main_nav.py:165-541) with a single jitted train
step: both DAgger rollouts (teacher-forced at ml_weight + on-policy sample at
weight 1, run_r2r_kdl_valid.sh regime), both models, and both losses run in
one compiled program; ICoD's two backwards
(loss.backward(retain_graph=True); t_loss.backward(), agent_base.py:260-276)
become one ``jax.grad`` over a combined loss with two parameter partitions
and two optimizers (student at lr, teacher at t_lr).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import MagicConfig
from ..env.world import World
from ..models import Critic, DualScaleVLNBert
from .distill import total_kd_loss
from .navigator import episodes_from_items, pad_instructions
from .rollout import Rollout, Tables


def noam_schedule(lr: float, warmup: int = 4000) -> optax.Schedule:
    """Original Transformer schedule (reference pretrain_src/optim/
    sched.py:10-14): linear warmup then inverse-sqrt decay."""
    warmup = max(warmup, 1)

    def sched(step):
        step = jnp.maximum(step, 1).astype(jnp.float32)
        return lr * jnp.where(step <= warmup, step / warmup,
                              warmup ** 0.5 * step ** -0.5)

    return sched


def warmup_linear_schedule(lr: float, warmup: int, total: int) -> optax.Schedule:
    """BERT schedule (reference sched.py:17-21, floor 1e-8 per
    get_lr_sched:28)."""
    warmup = max(warmup, 1)

    def sched(step):
        step = step.astype(jnp.float32) if hasattr(step, "astype") \
            else jnp.float32(step)
        frac = jnp.where(
            step < warmup, step / warmup,
            jnp.maximum(0.0, (total - step) / max(total - warmup, 1)))
        return jnp.maximum(lr * frac, 1e-8)

    return sched


def make_lr_schedule(cfg) -> optax.Schedule:
    """Constant by default; warmup+cosine/linear/polynomial when use_lr_sch
    (reference agent_base.py:24-32,144-149; parser.py:203-204); plus the
    pretrain schedules noam / warmup_linear (optim/sched.py:10-30)."""
    t = cfg.train
    if not t.use_lr_sch:
        return optax.constant_schedule(t.lr)
    if t.lr_sch == "noam":
        return noam_schedule(t.lr, t.warmup_iters or 4000)
    if t.lr_sch == "warmup_linear":
        return warmup_linear_schedule(t.lr, t.warmup_iters, t.iters)
    decay_iters = max(t.iters - t.warmup_iters, 1)
    if t.lr_sch == "cosine":
        main = optax.cosine_decay_schedule(t.lr, decay_iters)
    elif t.lr_sch == "linear":
        main = optax.linear_schedule(t.lr, 0.0, decay_iters)
    else:  # polynomial (reference default when use_lr_sch)
        main = optax.polynomial_schedule(t.lr, 0.0, 1.0, decay_iters)
    if t.warmup_iters > 0:
        warm = optax.linear_schedule(0.0, t.lr, t.warmup_iters)
        return optax.join_schedules([warm, main], [t.warmup_iters])
    return main


def lookahead(inner: optax.GradientTransformation, sync_period: int = 6,
              slow_step: float = 0.5) -> optax.GradientTransformation:
    """Lookahead wrapper (reference pretrain_src/optim/rangerlars.py:97:
    Lookahead(k=6, alpha=0.5) around Ralamb) as a plain
    GradientTransformation: the slow weights live in the optimizer state so
    the param pytree is unchanged (optax.lookahead's fast/slow param pair
    would leak into every checkpoint/sharding path)."""

    def init(params):
        # a REAL copy: jnp.asarray would alias the param buffers, and an
        # aliased slow state + donate_argnums on (params, opt_state) is a
        # double donation of one buffer (XLA INVALID_ARGUMENT)
        return {"inner": inner.init(params),
                "slow": jax.tree_util.tree_map(
                    lambda p: jnp.array(p, copy=True), params),
                "count": jnp.zeros((), jnp.int32)}

    def update(grads, state, params=None):
        updates, inner_state = inner.update(grads, state["inner"], params)
        fast = optax.apply_updates(params, updates)
        count = state["count"] + 1
        sync = (count % sync_period) == 0
        new_slow = jax.tree_util.tree_map(
            lambda s, f: jnp.where(sync, s + slow_step * (f - s), s),
            state["slow"], fast)
        # on sync steps the params jump to the interpolated slow weights
        out = jax.tree_util.tree_map(
            lambda f, s, p: jnp.where(sync, s, f) - p, fast, new_slow, params)
        return out, {"inner": inner_state, "slow": new_slow, "count": count}

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg, lr=None) -> optax.GradientTransformation:
    """Optimizer families incl. the reference's vendored research optimizers
    (pretrain_src/optim/: AdamW, RAdam, RangerLars = RAdam+LARS+Lookahead),
    expressed as optax compositions."""
    t = cfg.train
    sched = make_lr_schedule(cfg) if lr is None else optax.constant_schedule(lr)

    ralamb = lambda: optax.chain(
        optax.scale_by_radam(), optax.scale_by_trust_ratio(),
        optax.scale_by_learning_rate(sched))
    opts = {
        "adamw": lambda: optax.adamw(sched, weight_decay=t.weight_decay),
        "adam": lambda: optax.adam(sched),
        "radam": lambda: optax.radam(sched),
        # RangerLars = Lookahead(Ralamb) = Lookahead(RAdam + LARS trust
        # ratio), reference rangerlars.py:14,97
        "rangerlars": lambda: lookahead(ralamb()),
        "ralamb": ralamb,
        "sgd": lambda: optax.sgd(sched),
        "rms": lambda: optax.rmsprop(sched),
    }
    return optax.chain(
        optax.clip_by_global_norm(t.grad_clip),   # clip 40 (agent.py:457-462)
        opts[t.optim.lower()](),
    )


class Trainer:
    """Owns models, optimizers, and the jitted DAgger+MAKD train step."""

    def __init__(self, cfg: MagicConfig, world: World, rng=None,
                 aug_features=None):
        self.cfg = cfg
        self.world = world
        # aug_features: EnvEdit-style alternate feature table, same layout
        # as world.tables.features; aug-marked episodes read it
        self.tables = Tables.from_world(
            world.tables, aug_features=aug_features,
            device_features=getattr(world, "device_features", None))
        if rng is None:
            rng = jax.random.PRNGKey(cfg.train.seed)
        k_s, k_t, self.rng = jax.random.split(rng, 3)

        dtype = jnp.dtype(cfg.train.compute_dtype)
        self.model = DualScaleVLNBert(cfg.model, dtype=dtype)
        self.teacher_model = None
        self.kdl = cfg.distill.train_kdl and cfg.teacher_model is not None
        if self.kdl:
            self.teacher_model = DualScaleVLNBert(cfg.teacher_model,
                                                  dtype=dtype)
        self.rollout = Rollout(self.tables, cfg.env, self.model,
                               self.teacher_model)

        self.params = self._init(self.model, cfg.model, k_s)
        self.opt = make_optimizer(cfg)
        if (cfg.train.fix_lang_embedding or cfg.train.fix_local_branch
                or cfg.train.fix_pano_embedding):
            # freeze via a zero-update mask (the reference parser declares
            # fix_* but its release never consumes them; actually frozen here)
            self.opt = optax.chain(
                self.opt,
                optax.masked(optax.set_to_zero(),
                             self._frozen_mask(self.params)))
        # gradient accumulation (--accumulateGrad / accum_steps): optax
        # MultiSteps accumulates k micro-batch gradients and applies the
        # inner chain (incl. clipping) once on their average — the gt+aug
        # pair-into-one-update behavior of main_nav.py:336-353
        accum = max(int(cfg.train.accum_steps), 1)
        if accum > 1:
            self.opt = optax.MultiSteps(self.opt, every_k_schedule=accum)
        self.opt_state = self.opt.init(self.params)
        # value head — always constructed like the reference (agent.py:39);
        # trained only on the RL branch
        self.critic = Critic(cfg.model.hidden_size, dtype=dtype)
        self.critic_params = self.critic.init(
            jax.random.PRNGKey(cfg.train.seed + 7),
            jnp.zeros((1, cfg.model.hidden_size)))
        self.critic_opt = make_optimizer(cfg)
        if accum > 1:
            self.critic_opt = optax.MultiSteps(self.critic_opt,
                                               every_k_schedule=accum)
        self.critic_opt_state = self.critic_opt.init(self.critic_params)
        self.t_params = self.t_opt = self.t_opt_state = None
        if self.kdl:
            self.t_params = self._init(self.teacher_model, cfg.teacher_model, k_t)
            if cfg.distill.train_teacher:
                self.t_opt = make_optimizer(cfg, lr=cfg.distill.t_lr)
                if accum > 1:
                    self.t_opt = optax.MultiSteps(self.t_opt,
                                                  every_k_schedule=accum)
                self.t_opt_state = self.t_opt.init(self.t_params)
        self._step_fn = None
        self._grad_fn = None
        self._metric_names = None
        self._ability_grad_fns = {}
        # device mesh for multi-chip training (the reference's default mode
        # is DDP, main_nav.py:681 init_distributed; here: episode batches
        # shard over 'dp', params Megatron-TP over 'mp'/replicated, XLA
        # inserts the gradient psum over ICI).  Set via use_mesh().
        self.mesh = None
        # per-ability gradient magnitudes for the 'grad' MKRW mode, order
        # (txt, img, local, global, action); EMA-updated every
        # aw_update_iter (main_nav.py:309-320,446-455; the accumulator
        # itself is absent upstream — reconstructed here)
        self.ability_grads = np.zeros(5, np.float32)
        self.iteration = 0
        self.logs = {}
        # persistent data-order rng: fit() draws fresh permutations from this
        # across calls instead of replaying the same prefix every interval
        self._data_rng = np.random.default_rng(cfg.train.seed)
        # intervention dictionaries threaded into every training rollout
        # (refreshed by the orchestrator every update_iter / on new-best,
        # main_nav.py:218-222,439-444,488-494); {} disables them
        self.zdicts: dict = {}

    def _frozen_mask(self, params):
        """True leaves get zeroed updates: lang embeddings
        (fix_lang_embedding), the local cross-modal branch + its action head
        (fix_local_branch), the panorama encoder (fix_pano_embedding)."""
        from flax import traverse_util

        t = self.cfg.train
        flat = traverse_util.flatten_dict(params)

        def frozen(key_tuple):
            k = "/".join(str(p) for p in key_tuple)
            if t.fix_lang_embedding and "lang_encoder" in k and (
                    "embeddings" in k or "emb_norm" in k):
                return True
            if t.fix_local_branch and ("local_encoder" in k
                                       or "local_sap_head" in k):
                return True
            if t.fix_pano_embedding and "pano_encoder" in k:
                return True
            return False

        return traverse_util.unflatten_dict(
            {k: frozen(k) for k in flat})

    def _init(self, model, mcfg, rng):
        from ..models.vlnbert import dummy_step_batch

        batch = dummy_step_batch(
            mcfg, batch_size=1, txt_len=8,
            pano_len=self.tables.cand_ids.shape[2] + 36,
            gmap_len=self.cfg.env.max_gmap_len)
        return jax.jit(model.init)(rng, batch)

    # ------------------------------------------------------------------

    def _loss_for_rollout(self, params, t_params, state0, txt_ids, txt_masks,
                          feedback, train_ml, rng, ability_grads=None,
                          zdicts=None, tables=None):
        c = self.cfg
        d = c.distill if self.kdl else None
        _, aux = self.rollout.run(
            params, state0, txt_ids, txt_masks, feedback, rng,
            train_ml=train_ml, deterministic=False,
            teacher_params=t_params, distill=d, ability_grads=ability_grads,
            zdicts=zdicts, tables=tables,
            remat=(c.train.remat_policy if c.train.remat_policy != "full"
                   else True) if c.train.remat else False)
        bs = state0.batch_size
        ml = aux["ml_loss"] * train_ml / bs
        metrics = {"ml_loss": ml, "gmap_overflow": aux["gmap_overflow"]}
        if self.kdl:
            kd = total_kd_loss(aux["kd_losses"]) / bs
            total = c.distill.alpha * kd + (1 - c.distill.alpha) * ml
            metrics["kdl_loss"] = kd
            if c.distill.train_teacher:
                t_ml = aux["t_ml_loss"] * train_ml / bs
                t_kd = total_kd_loss(aux["t_kd_losses"]) * train_ml
                t_total = c.distill.t_alpha * t_kd + \
                    (1 - c.distill.t_alpha) * t_ml
                metrics["t_loss"] = t_total
                return total, t_total, metrics
        else:
            total = ml
        return total, jnp.zeros(()), metrics

    def _loss_for_fused_rollouts(self, params, t_params, state0, txt_ids,
                                 txt_masks, rng, ability_grads=None,
                                 zdicts=None, tables=None):
        """The DAgger step's two rollouts as ONE fused scan (see
        ``Rollout.run`` fused_split).  The batch is doubled — rows [0, B)
        teacher-forced, rows [B, 2B) DAgger-sampled — and the per-half loss
        sums are weighted exactly as the two sequential
        ``_loss_for_rollout`` calls would weight them."""
        c = self.cfg
        d = c.distill if self.kdl else None
        bs = state0.batch_size
        dup = lambda x: jnp.concatenate([x, x], axis=0)
        state2 = jax.tree_util.tree_map(dup, state0)
        _, aux = self.rollout.run(
            params, state2, dup(txt_ids), dup(txt_masks),
            f"teacher+{c.train.dagger_sample}", rng, train_ml=1.0,
            deterministic=False, teacher_params=t_params, distill=d,
            ability_grads=ability_grads, zdicts=zdicts, tables=tables,
            fused_split=bs,
            remat=(c.train.remat_policy if c.train.remat_policy != "full"
                   else True) if c.train.remat else False)
        w = (c.train.ml_weight, 1.0)
        ml = tuple(aux["ml_loss_vec"][i] * w[i] / bs for i in (0, 1))
        metrics = {"il/ml_loss": ml[0], "dagger/ml_loss": ml[1],
                   "il/gmap_overflow": aux["gmap_overflow_tf"],
                   "dagger/gmap_overflow": aux["gmap_overflow_dg"]}
        if not self.kdl:
            return ml[0] + ml[1], jnp.zeros(()), metrics
        kd = (total_kd_loss(aux["kd_losses_tf"]) / bs,
              total_kd_loss(aux["kd_losses_dg"]) / bs)
        total = sum(c.distill.alpha * kd[i] + (1 - c.distill.alpha) * ml[i]
                    for i in (0, 1))
        metrics["il/kdl_loss"], metrics["dagger/kdl_loss"] = kd
        t_total = jnp.zeros(())
        if c.distill.train_teacher:
            t_ml = tuple(aux["t_ml_loss_vec"][i] * w[i] / bs for i in (0, 1))
            t_kd = (total_kd_loss(aux["t_kd_losses_tf"]) * w[0],
                    total_kd_loss(aux["t_kd_losses_dg"]) * w[1])
            t_total = sum(c.distill.t_alpha * t_kd[i]
                          + (1 - c.distill.t_alpha) * t_ml[i]
                          for i in (0, 1))
            metrics["il/t_loss"] = (c.distill.t_alpha * t_kd[0]
                                    + (1 - c.distill.t_alpha) * t_ml[0])
            metrics["dagger/t_loss"] = (c.distill.t_alpha * t_kd[1]
                                        + (1 - c.distill.t_alpha) * t_ml[1])
        return total, t_total, metrics

    def _make_loss_fn(self):
        """The full train loss (IL/DAgger/A2C branches + MAKD + ICoD) as a
        pure function of (params, critic_params, t_params, ...) — shared by
        the jitted optimizer step and by :meth:`compute_grads` (the
        optimizer-free gradient hook the dp-equivalence tests pin)."""
        c = self.cfg
        alg = c.train.train_alg
        icod = self.kdl and c.distill.train_teacher
        rl = alg not in ("imitation", "dagger")   # the reference's A2C branch
        # bf16 weight-grad accumulation (TrainConfig.grads_dtype): cast the
        # f32 master params to bf16 BEFORE grad, so the scan backward's
        # per-step weight-grad sums carry bf16 (half the HBM traffic of the
        # dominant non-matmul bucket); the cast's own backward converts the
        # final sum to f32 once for the optimizer
        bf16_grads = c.train.grads_dtype == "bfloat16"

        def cast_params(tree):
            if not bf16_grads or tree is None:
                return tree
            return jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, tree)

        def loss_fn(params, critic_params, t_params, tables, state0,
                    txt_ids, txt_masks, rng, ability_grads, zdicts):
            params = cast_params(params)
            t_params = cast_params(t_params)
            k1, k2 = jax.random.split(rng)
            total = jnp.zeros(())
            t_total = jnp.zeros(())
            metrics = {}
            if alg == "imitation":
                l, tl, m = self._loss_for_rollout(
                    params, t_params, state0, txt_ids, txt_masks,
                    "teacher", 1.0, k1, ability_grads, zdicts, tables)
                total, t_total = total + l, t_total + tl
                metrics.update({f"il/{k}": v for k, v in m.items()})
            elif alg == "dagger" and c.train.fuse_rollouts \
                    and c.train.ml_weight != 0:
                # fused dual rollout: the reference's two sequential
                # rollouts (teacher-forced at ml_weight, sampled at 1.0,
                # agent_base.py:236-259) run as ONE scan at double batch
                # width — the step is dispatch-bound, so width amortizes
                l, tl, m = self._loss_for_fused_rollouts(
                    params, t_params, state0, txt_ids, txt_masks, k1,
                    ability_grads, zdicts, tables)
                total, t_total = total + l, t_total + tl
                metrics.update(m)
            elif alg == "dagger":
                # run_r2r_kdl_valid.sh regime: ml_weight 0.2 + sample 1.0
                if c.train.ml_weight != 0:
                    l, tl, m = self._loss_for_rollout(
                        params, t_params, state0, txt_ids, txt_masks,
                        "teacher", c.train.ml_weight, k1, ability_grads,
                        zdicts, tables)
                    total, t_total = total + l, t_total + tl
                    metrics.update({f"il/{k}": v for k, v in m.items()})
                l, tl, m = self._loss_for_rollout(
                    params, t_params, state0, txt_ids, txt_masks,
                    c.train.dagger_sample, 1.0, k2, ability_grads, zdicts,
                    tables)
                total, t_total = total + l, t_total + tl
                metrics.update({f"dagger/{k}": v for k, v in m.items()})
            else:
                # A2C: teacher-forced IL at ml_weight + on-policy
                # advantage-actor-critic rollout (the reference's third
                # branch, agent.py:495-502, completed with a real RL loss)
                if c.train.ml_weight != 0:
                    l, tl, m = self._loss_for_rollout(
                        params, t_params, state0, txt_ids, txt_masks,
                        "teacher", c.train.ml_weight, k1, ability_grads,
                        zdicts, tables)
                    total, t_total = total + l, t_total + tl
                    metrics.update({f"il/{k}": v for k, v in m.items()})
                _, aux = self.rollout.run(
                    params, state0, txt_ids, txt_masks, "sample", k2,
                    train_ml=None, deterministic=False,
                    train_rl=True, critic=self.critic,
                    critic_params=critic_params, gamma=c.train.gamma,
                    zdicts=zdicts, tables=tables)
                bs = state0.batch_size
                rl = (aux["rl_loss"]
                      - c.train.entropy_loss_weight * aux["rl_entropy"]) / bs
                total = total + rl
                metrics["rl/loss"] = rl
            metrics["loss"] = total
            return total + t_total, metrics

        return loss_fn, icod, rl

    def _make_step(self):
        loss_fn, icod, rl = self._make_loss_fn()

        # metric names are trace-time static (the dict's keys depend only on
        # cfg branches); captured once so the jitted step can return ONE
        # packed f32 vector instead of a dict of device scalars — on a
        # remote-attached chip each scalar fetch is a serial device round
        # trip AFTER the step completes, and round trips, not bytes, dominate
        # the tunnel (the serving subsystem's measured lesson, bc7a3de)
        metric_names = []

        def step(params, opt_state, critic_params, critic_opt_state,
                 t_params, t_opt_state, tables, state0, txt_ids, txt_masks,
                 rng, ability_grads, zdicts):
            if icod:
                (loss, metrics), (grads, t_grads) = jax.value_and_grad(
                    loss_fn, argnums=(0, 2), has_aux=True)(
                        params, critic_params, t_params, tables, state0,
                        txt_ids, txt_masks, rng, ability_grads, zdicts)
                updates, opt_state = self.opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                t_updates, t_opt_state = self.t_opt.update(
                    t_grads, t_opt_state, t_params)
                t_params = optax.apply_updates(t_params, t_updates)
            elif rl:
                (loss, metrics), (grads, c_grads) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1), has_aux=True)(
                        params, critic_params, t_params, tables, state0,
                        txt_ids, txt_masks, rng, ability_grads, zdicts)
                updates, opt_state = self.opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                c_updates, critic_opt_state = self.critic_opt.update(
                    c_grads, critic_opt_state, critic_params)
                critic_params = optax.apply_updates(critic_params, c_updates)
            else:
                (loss, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(
                        params, critic_params, t_params, tables, state0,
                        txt_ids, txt_masks, rng, ability_grads, zdicts)
                updates, opt_state = self.opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
            metrics["grad_norm"] = optax.global_norm(grads)
            names = sorted(metrics)
            if not metric_names:      # trace-time capture (keys are static)
                metric_names.extend(names)
            packed = jnp.stack([metrics[k].astype(jnp.float32)
                                for k in names])
            return (params, opt_state, critic_params, critic_opt_state,
                    t_params, t_opt_state, packed)

        return jax.jit(step, donate_argnums=(0, 1, 2, 3, 4, 5)), metric_names

    def compute_grads(self, items, rng, zdicts=None, aug=False):
        """Gradient pytrees for one batch WITHOUT an optimizer update.

        The dp-equivalence certification hook: asserting dp-sharded
        gradients == single-device gradients (allclose) directly pins the
        ICI psum with NO optimizer in the loop — Adam's m/sqrt(v) rescaling
        amplifies cross-shard f32 reduction noise on near-zero-gradient
        leaves (measured, tests/test_multichip.py), so a params-level pin
        under adamW is noisy where the gradient-level pin is exact.

        ``rng`` is explicit (not drawn from ``self.rng``) so both sides of
        an A/B see the identical key.  Returns ``(loss, grads)`` where
        ``grads`` mirrors the jitted step's partitions: the student pytree,
        plus the teacher pytree under ICoD or the critic pytree under RL.
        """
        if not hasattr(self, "_grad_fn") or self._grad_fn is None:
            loss_fn, icod, rl = self._make_loss_fn()
            argnums = (0, 2) if icod else ((0, 1) if rl else 0)
            self._grad_fn = jax.jit(
                jax.value_and_grad(loss_fn, argnums=argnums, has_aux=True))
        if zdicts is None:
            zdicts = self.zdicts
        txt_ids, txt_masks = pad_instructions(items, self.cfg.env.max_instr_len)
        state0 = episodes_from_items(
            self.tables, self.world, items, self.rollout.model_dims,
            observed_parity=self.cfg.env.observed_graph_parity,
            aug=aug and self.tables.aug_features is not None)
        txt_ids, txt_masks = jnp.asarray(txt_ids), jnp.asarray(txt_masks)
        if self.mesh is not None:
            from ..parallel import shard_batch, shard_pytree_batch

            state0 = shard_pytree_batch(state0, self.mesh)
            txt_ids = shard_batch(txt_ids, self.mesh)
            txt_masks = shard_batch(txt_masks, self.mesh)
            ctx = jax.set_mesh(self.mesh)
        else:
            import contextlib

            ctx = contextlib.nullcontext()
        with ctx:
            (loss, _metrics), grads = self._grad_fn(
                self.params, self.critic_params, self.t_params, self.tables,
                state0, txt_ids, txt_masks, rng,
                jnp.asarray(self.ability_grads), zdicts)
        return loss, grads

    def use_mesh(self, mesh):
        """Shard training over a device mesh: params tensor-parallel over
        'mp' / replicated, optimizer states re-initialized against the
        sharded params, world tables replicated, and every episode batch
        dp-sharded in train_step (the reference's DDP default,
        main_nav.py:681 + agent_base.py:114-116, as shardings XLA turns
        into ICI collectives).  The global batch size must divide the dp
        axis."""
        from ..parallel import replicate, shard_params

        dp = mesh.shape.get("dp", 1)
        if self.cfg.train.batch_size % dp != 0:
            raise ValueError(
                f"global batch_size {self.cfg.train.batch_size} not "
                f"divisible by dp={dp}; the CLI scales batch_size by dp "
                f"(per-chip batch x devices, DDP semantics)")
        self.mesh = mesh
        self.params = shard_params(self.params, mesh)
        self.critic_params = shard_params(self.critic_params, mesh)
        # optimizer states are param-shaped trees (mu/nu/accumulators end in
        # the same .../<layer>/kernel paths), so the same partition rules
        # apply — shard in place rather than re-init, preserving any state a
        # checkpoint restore already loaded (call use_mesh AFTER loads)
        self.opt_state = shard_params(self.opt_state, mesh)
        self.critic_opt_state = shard_params(self.critic_opt_state, mesh)
        if self.t_params is not None:
            self.t_params = shard_params(self.t_params, mesh)
            if self.t_opt_state is not None:
                self.t_opt_state = shard_params(self.t_opt_state, mesh)
        self.tables = replicate(self.tables, mesh)
        self.rollout.t = self.tables
        return self

    def train_step(self, items, zdicts=None, aug=False):
        if self._step_fn is None:
            self._step_fn, self._metric_names = self._make_step()
        if zdicts is None:
            zdicts = self.zdicts
        txt_ids, txt_masks = pad_instructions(items, self.cfg.env.max_instr_len)
        state0 = episodes_from_items(
            self.tables, self.world, items, self.rollout.model_dims,
            observed_parity=self.cfg.env.observed_graph_parity,
            aug=aug and self.tables.aug_features is not None)
        self.rng, k = jax.random.split(self.rng)
        txt_ids, txt_masks = jnp.asarray(txt_ids), jnp.asarray(txt_masks)
        if self.mesh is not None:
            from ..parallel import shard_batch, shard_pytree_batch

            state0 = shard_pytree_batch(state0, self.mesh)
            txt_ids = shard_batch(txt_ids, self.mesh)
            txt_masks = shard_batch(txt_masks, self.mesh)
            ctx = jax.set_mesh(self.mesh)
        else:
            import contextlib

            ctx = contextlib.nullcontext()
        with ctx:
            (self.params, self.opt_state, self.critic_params,
             self.critic_opt_state, self.t_params, self.t_opt_state,
             packed) = self._step_fn(
                self.params, self.opt_state, self.critic_params,
                self.critic_opt_state, self.t_params, self.t_opt_state,
                self.tables, state0, txt_ids, txt_masks, k,
                jnp.asarray(self.ability_grads), zdicts)
        self.iteration += 1
        # ONE device->host transfer for every metric (vs one serial round
        # trip per scalar on a remote-attached chip)
        vals = np.asarray(packed)
        return dict(zip(self._metric_names, map(float, vals)))

    # ----- checkpointing (agent_base.py:298-359 semantics) -----

    def save(self, path: str, save_optimizer: bool = False):
        """Reference-format .pt containers: student (+ teacher_ prefixed file
        when co-training).  Optimizer state goes to an orbax sibling dir when
        requested (--save_optimizer)."""
        from ..utils.checkpoint import CheckpointManager, save_torch_checkpoint

        save_torch_checkpoint(self.params, path, epoch=self.iteration)
        if self.t_params is not None and self.cfg.distill.train_teacher:
            import os

            d, f = os.path.split(path)
            save_torch_checkpoint(self.t_params, os.path.join(d, "teacher_" + f),
                                  epoch=self.iteration)
        if save_optimizer:
            mgr = CheckpointManager(path + ".opt")
            mgr.save("opt_state", self.opt_state)

    def save_state(self, ckpt_dir: str, name: str = "train_state"):
        """Full resumable train state (params, both optimizers, iteration,
        RNG, ability grads) via orbax — the emergency/auto-resume container
        (SURVEY §5.3: the reference's crash story is manual --*_resume_file;
        the rebuild adds preemption-safe state)."""
        from ..utils.checkpoint import CheckpointManager

        mgr = CheckpointManager(ckpt_dir)
        tree = {
            "params": self.params, "opt_state": self.opt_state,
            "critic_params": self.critic_params,
            "critic_opt_state": self.critic_opt_state,
            "iteration": np.int64(self.iteration),
            "rng": np.asarray(self.rng),
            "ability_grads": np.asarray(self.ability_grads),
        }
        if self.t_params is not None:
            tree["t_params"] = self.t_params
            if self.t_opt_state is not None:
                tree["t_opt_state"] = self.t_opt_state
        return mgr.save(name, tree)

    def load_state(self, ckpt_dir: str, name: str = "train_state") -> bool:
        """Restore what save_state wrote; returns False if absent."""
        from ..utils.checkpoint import CheckpointManager

        mgr = CheckpointManager(ckpt_dir)
        if not mgr.has(name):
            return False
        template = {
            "params": self.params, "opt_state": self.opt_state,
            "critic_params": self.critic_params,
            "critic_opt_state": self.critic_opt_state,
            "iteration": np.int64(self.iteration),
            "rng": np.asarray(self.rng),
            "ability_grads": np.asarray(self.ability_grads),
        }
        if self.t_params is not None:
            template["t_params"] = self.t_params
            if self.t_opt_state is not None:
                template["t_opt_state"] = self.t_opt_state
        tree = mgr.restore(name, template=template)
        self.params = tree["params"]
        self.opt_state = tree["opt_state"]
        self.critic_params = tree["critic_params"]
        self.critic_opt_state = tree["critic_opt_state"]
        self.iteration = int(tree["iteration"])
        self.rng = jnp.asarray(tree["rng"])
        self.ability_grads = np.asarray(tree["ability_grads"], np.float32)
        if "t_params" in tree:
            self.t_params = tree["t_params"]
        if "t_opt_state" in tree:
            self.t_opt_state = tree["t_opt_state"]
        # resume the data order deterministically from the restored iteration
        self._data_rng = np.random.default_rng(
            self.cfg.train.seed + self.iteration)
        return True

    def load(self, path: str, resume_optimizer: bool = False,
             teacher_path: str | None = None):
        from ..utils.checkpoint import CheckpointManager, load_torch_checkpoint

        self.params, epoch, missing, unexpected = load_torch_checkpoint(
            path, template=self.params)
        self.iteration = epoch
        if teacher_path and self.t_params is not None:
            # teacher load drops KD heads unless it co-trains
            # (agent_base.py:326-332)
            self.t_params, _, _, _ = load_torch_checkpoint(
                teacher_path, template=self.t_params,
                drop_kd_heads=not self.cfg.distill.train_teacher)
        if resume_optimizer:
            mgr = CheckpointManager(path + ".opt")
            if mgr.has("opt_state"):
                self.opt_state = mgr.restore("opt_state",
                                             template=self.opt_state)
        return epoch, missing, unexpected

    # ----- 'grad' adaptive ability weights -----

    def update_ability_grads(self, items, ema: float = 0.5):
        """Per-ability KD gradient magnitudes — reconstruction of the
        reference's missing ``compute_multiSubject_grad`` (called at
        agent.py:449,455 / agent_base.py:266,271, never defined): one
        backward per ability over a teacher-forced rollout, EMA-combined
        into the weights consumed by grad_softmax_weights."""
        import dataclasses

        from .distill import ABILITIES, total_kd_loss as tkl

        if not self.kdl:
            return self.ability_grads
        txt_ids, txt_masks = pad_instructions(items, self.cfg.env.max_instr_len)
        state0 = episodes_from_items(self.tables, self.world, items,
                                     self.rollout.model_dims)
        self.rng, k = jax.random.split(self.rng)
        norms = []
        for a in ABILITIES:
            if a not in self._ability_grad_fns:
                d = dataclasses.replace(self.cfg.distill, ability_types=(a,),
                                        adaptive_ability_weight=False,
                                        train_teacher=False)

                def loss(params, t_params, tables, s0, ids, masks, rng,
                         d=d):
                    _, aux = self.rollout.run(
                        params, s0, ids, masks, "teacher", rng, train_ml=1.0,
                        deterministic=True, teacher_params=t_params,
                        distill=d, tables=tables)
                    return tkl(aux["kd_losses"]) / s0.batch_size

                self._ability_grad_fns[a] = jax.jit(jax.grad(loss))
            g = self._ability_grad_fns[a](
                self.params, self.t_params, self.tables, state0,
                jnp.asarray(txt_ids), jnp.asarray(txt_masks), k)
            norms.append(float(optax.global_norm(g)))
        new = np.asarray(norms, np.float32)
        self.ability_grads = (ema * self.ability_grads
                              + (1 - ema) * new).astype(np.float32)
        return self.ability_grads

    def fit(self, items, iters, log_every=100, rng=None, callback=None,
            aug_items=None, speaker=None, speaker_tok=None, aug_times=1):
        """Host loop: shuffle + minibatch + step (main_nav.py:322-455).

        With ``aug_items``, alternates ground-truth and augmented batches
        (aug_times aug per train batch); a ``speaker`` regenerates the aug
        instructions via noisy back-translation (the self-train path,
        agent.py:737-752, main_nav aug alternation)."""
        # the data-order rng persists across fit() calls (a per-call rng
        # would replay the identical permutation prefix every interval and
        # never reach items beyond interval*batch_size)
        r = rng if rng is not None else self._data_rng
        bs = self.cfg.train.batch_size

        def cycler(data):
            order, pos = r.permutation(len(data)), 0
            while True:
                if pos + bs > len(order):
                    order, pos = r.permutation(len(data)), 0
                yield [data[i] for i in order[pos : pos + bs]]
                pos += bs

        train_c = cycler(items)
        aug_c = cycler(aug_items) if aug_items else None
        history = []
        for it in range(iters):
            use_aug = aug_c is not None and aug_times and \
                (it % (aug_times + 1)) != 0
            batch = next(aug_c) if use_aug else next(train_c)
            if use_aug and speaker is not None and speaker_tok is not None:
                batch, _ = speaker.back_translate(batch, speaker_tok,
                                                  rng=self.cfg.train.seed + it)
                from ..data.tokenizer import HashTokenizer

                tok = HashTokenizer(self.cfg.model.vocab_size)
                for b in batch:
                    b["instr_encoding"] = np.asarray(
                        tok.encode(b["instruction"]), np.int32)
            m = self.train_step(batch, aug=use_aug)
            m["aug"] = float(use_aug)
            history.append(m)
            if callback and (it + 1) % log_every == 0:
                callback(it + 1, m)
        return history
