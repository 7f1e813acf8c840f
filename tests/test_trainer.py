import jax
import numpy as np
import pytest

from vln_magic_tpu.config import (DistillConfig, EnvConfig, MagicConfig,
                                  ModelConfig, TrainConfig)
from vln_magic_tpu.agent.trainer import Trainer, make_lr_schedule
from vln_magic_tpu.env import make_synthetic_world
from vln_magic_tpu.env.synthetic import make_synthetic_instructions


def _small_model(hidden, heads, kd=False, kd_target=64):
    return ModelConfig(
        vocab_size=300, hidden_size=hidden, num_attention_heads=heads,
        num_l_layers=1, num_pano_layers=1, num_x_layers=1, image_feat_size=16,
        max_position_embeddings=64, kd_heads=kd, kd_target_size=kd_target)


@pytest.fixture(scope="module")
def world():
    return make_synthetic_world(num_scans=1, nodes_per_scan=14, feat_dim=16,
                                seed=9)


@pytest.fixture(scope="module")
def items(world):
    return make_synthetic_instructions(world, 8, np.random.default_rng(2),
                                       vocab_size=300, min_path=2, max_path=4)


def test_il_training_reduces_loss(world, items):
    cfg = MagicConfig(
        model=_small_model(32, 2),
        env=EnvConfig(max_action_len=5, max_gmap_len=16),
        train=TrainConfig(batch_size=4, lr=3e-4, train_alg="imitation",
                          iters=100),
    )
    tr = Trainer(cfg, world)
    batch = items[:4]
    first = tr.train_step(batch)
    for _ in range(14):
        last = tr.train_step(batch)
    assert np.isfinite(first["loss"]) and np.isfinite(last["loss"])
    assert last["loss"] < first["loss"], (first, last)


def test_dagger_step_runs(world, items):
    cfg = MagicConfig(
        model=_small_model(32, 2),
        env=EnvConfig(max_action_len=4, max_gmap_len=16),
        train=TrainConfig(batch_size=4, lr=1e-4, train_alg="dagger",
                          ml_weight=0.2),
    )
    tr = Trainer(cfg, world)
    m = tr.train_step(items[:4])
    assert "il/ml_loss" in m and "dagger/ml_loss" in m
    assert np.isfinite(m["loss"]) and m["grad_norm"] > 0


def test_makd_distillation_step(world, items):
    cfg = MagicConfig(
        model=_small_model(32, 2, kd=True, kd_target=64),
        teacher_model=_small_model(64, 2),
        env=EnvConfig(max_action_len=4, max_gmap_len=16),
        train=TrainConfig(batch_size=4, lr=1e-4, train_alg="imitation"),
        distill=DistillConfig(train_kdl=True, teacher_sample_hard_mining=True,
                              adaptive_ability_weight=True,
                              adaptive_ability_weight_type="RW"),
    )
    tr = Trainer(cfg, world)
    t_before = jax.tree_util.tree_leaves(tr.t_params)[0].copy()
    m = tr.train_step(items[:4])
    assert np.isfinite(m["il/kdl_loss"]) and m["il/kdl_loss"] > 0
    # teacher is frozen without ICoD
    t_after = jax.tree_util.tree_leaves(tr.t_params)[0]
    np.testing.assert_array_equal(np.asarray(t_before), np.asarray(t_after))


def test_icod_trains_teacher(world, items):
    cfg = MagicConfig(
        model=_small_model(32, 2, kd=True, kd_target=64),
        teacher_model=_small_model(64, 2, kd=True, kd_target=32),
        env=EnvConfig(max_action_len=4, max_gmap_len=16),
        train=TrainConfig(batch_size=4, lr=1e-4, train_alg="imitation"),
        distill=DistillConfig(train_kdl=True, train_teacher=True,
                              t_lr=1e-4),
    )
    tr = Trainer(cfg, world)
    t_before = np.asarray(
        jax.tree_util.tree_leaves(tr.t_params)[0]).copy()
    m = tr.train_step(items[:4])
    assert np.isfinite(m["il/t_loss"])
    t_after = np.asarray(jax.tree_util.tree_leaves(tr.t_params)[0])
    assert not np.array_equal(t_before, t_after), "ICoD must update the teacher"


def test_fused_dual_rollout_matches_sequential(world, items):
    """The fused teacher+dagger scan (Rollout.run fused_split) must
    reproduce the two sequential rollouts' losses exactly: per-half MKTD
    'norm' weights normalize within their half, every reduction stays in
    its half.  deterministic=True + argmax dagger removes all rng effects
    (MKRW off)."""
    import jax.numpy as jnp

    from vln_magic_tpu.agent.navigator import (episodes_from_items,
                                               pad_instructions)

    cfg = MagicConfig(
        model=_small_model(32, 2, kd=True, kd_target=64),
        teacher_model=_small_model(64, 2, kd=True, kd_target=32),
        env=EnvConfig(max_action_len=4, max_gmap_len=16),
        train=TrainConfig(batch_size=4, train_alg="dagger", ml_weight=0.2,
                          dagger_sample="argmax"),
        distill=DistillConfig(train_kdl=True, train_teacher=True,
                              teacher_sample_hard_mining=True,
                              sample_preprocess="norm"),
    )
    tr = Trainer(cfg, world)
    batch = items[:4]
    txt_ids, txt_masks = pad_instructions(batch, cfg.env.max_instr_len)
    state0 = episodes_from_items(tr.tables, world, batch,
                                 tr.rollout.model_dims)
    rng = jax.random.PRNGKey(3)
    ids, masks = jnp.asarray(txt_ids), jnp.asarray(txt_masks)

    def run(state, feedback, fused_split=None, ids=ids, masks=masks):
        _, aux = tr.rollout.run(
            tr.params, state, ids, masks, feedback, rng, train_ml=1.0,
            deterministic=True, teacher_params=tr.t_params,
            distill=cfg.distill, tables=tr.tables, fused_split=fused_split)
        return aux

    a_tf = run(state0, "teacher")
    a_dg = run(state0, "argmax")
    dup = lambda x: jnp.concatenate([x, x], axis=0)
    state2 = jax.tree_util.tree_map(dup, state0)
    fused = run(state2, "teacher+argmax", fused_split=4,
                ids=dup(ids), masks=dup(masks))

    np.testing.assert_allclose(fused["ml_loss_vec"][0], a_tf["ml_loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(fused["ml_loss_vec"][1], a_dg["ml_loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(fused["t_ml_loss_vec"][0], a_tf["t_ml_loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(fused["t_ml_loss_vec"][1], a_dg["t_ml_loss"],
                               rtol=1e-5)
    for k in a_tf["kd_losses"]:
        np.testing.assert_allclose(fused["kd_losses_tf"][k],
                                   a_tf["kd_losses"][k], rtol=2e-4, atol=1e-6,
                                   err_msg=f"t2s {k} (tf half)")
        np.testing.assert_allclose(fused["kd_losses_dg"][k],
                                   a_dg["kd_losses"][k], rtol=2e-4, atol=1e-6,
                                   err_msg=f"t2s {k} (dagger half)")
        np.testing.assert_allclose(fused["t_kd_losses_tf"][k],
                                   a_tf["t_kd_losses"][k], rtol=2e-4,
                                   atol=1e-6, err_msg=f"s2t {k} (tf half)")
        np.testing.assert_allclose(fused["t_kd_losses_dg"][k],
                                   a_dg["t_kd_losses"][k], rtol=2e-4,
                                   atol=1e-6, err_msg=f"s2t {k} (dagger half)")
    # the fused trajectories themselves match the sequential halves
    np.testing.assert_array_equal(np.asarray(fused["actions"][:, :4]),
                                  np.asarray(a_tf["actions"]))
    np.testing.assert_array_equal(np.asarray(fused["actions"][:, 4:]),
                                  np.asarray(a_dg["actions"]))


def test_fused_dagger_trainer_step(world, items):
    """Trainer path with fuse_rollouts on: metrics keep the il/ + dagger/
    structure and the loss is finite."""
    cfg = MagicConfig(
        model=_small_model(32, 2),
        env=EnvConfig(max_action_len=4, max_gmap_len=16),
        train=TrainConfig(batch_size=4, lr=1e-4, train_alg="dagger",
                          ml_weight=0.2, fuse_rollouts=True),
    )
    assert cfg.train.fuse_rollouts
    tr = Trainer(cfg, world)
    m = tr.train_step(items[:4])
    assert "il/ml_loss" in m and "dagger/ml_loss" in m
    assert np.isfinite(m["loss"]) and m["grad_norm"] > 0


def test_lr_schedules():
    cfg = MagicConfig(train=TrainConfig(lr=1e-4, use_lr_sch=True,
                                        lr_sch="cosine", warmup_iters=10,
                                        iters=100))
    sched = make_lr_schedule(cfg)
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(10)) == pytest.approx(1e-4, rel=1e-3)
    assert float(sched(100)) < 1e-4
    cfg2 = MagicConfig(train=TrainConfig(lr=1e-4))
    assert float(make_lr_schedule(cfg2)(50)) == pytest.approx(1e-4)


def test_lookahead_and_scheds():
    """RangerLars = Lookahead(Ralamb): slow weights sync every k steps;
    noam / warmup_linear schedules match the reference formulas
    (pretrain_src/optim/sched.py:10-21, rangerlars.py:97)."""
    import jax
    import jax.numpy as jnp
    import optax

    from vln_magic_tpu.agent.trainer import (lookahead, noam_schedule,
                                             warmup_linear_schedule)

    inner = optax.sgd(0.1)
    opt = lookahead(inner, sync_period=3, slow_step=0.5)
    params = {"w": jnp.ones(4)}
    state = opt.init(params)
    grads = {"w": jnp.ones(4)}
    seen = [params["w"][0]]
    for i in range(6):
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        seen.append(float(params["w"][0]))
    # plain sgd would give 1 - 0.1*t; lookahead pulls halfway back to the
    # slow weights on steps 3 and 6
    ref = [1.0, 0.9, 0.8, 0.85, 0.75, 0.65, 0.70]
    np.testing.assert_allclose(seen, ref, atol=1e-6)

    ns = noam_schedule(1.0, warmup=100)
    assert float(ns(jnp.asarray(50))) == pytest.approx(0.5)
    assert float(ns(jnp.asarray(400))) == pytest.approx(100**0.5 * 400**-0.5)
    wl = warmup_linear_schedule(1.0, 10, 110)
    assert float(wl(jnp.asarray(5))) == pytest.approx(0.5)
    assert float(wl(jnp.asarray(60))) == pytest.approx(0.5)
    assert float(wl(jnp.asarray(5000))) == pytest.approx(1e-8)


def test_rangerlars_trains(world, items):
    cfg = MagicConfig(
        model=_small_model(32, 2),
        env=EnvConfig(max_action_len=5, max_gmap_len=16),
        train=TrainConfig(batch_size=4, lr=1e-3, train_alg="imitation",
                          optim="rangerlars", iters=100),
    )
    tr = Trainer(cfg, world)
    h = tr.fit(items[:8], 3)
    assert all(np.isfinite(m["loss"]) for m in h)


def test_gradient_accumulation_matches_big_batch(world, items):
    """--accumulateGrad: k accumulated micro-batches must equal one k-times
    batch step (reference folds gt+aug into one update, main_nav.py:336-353).
    With identical micro-batches and zero dropout the averaged accumulated
    gradient equals the big-batch gradient exactly."""
    from vln_magic_tpu.utils.checkpoint import flatten_params

    model = ModelConfig(
        vocab_size=300, hidden_size=32, num_attention_heads=2,
        num_l_layers=1, num_pano_layers=1, num_x_layers=1, image_feat_size=16,
        max_position_embeddings=64, hidden_dropout=0.0, attention_dropout=0.0)
    mk = lambda accum: MagicConfig(
        model=model, env=EnvConfig(max_action_len=4, max_gmap_len=16),
        train=TrainConfig(batch_size=4, lr=1e-3, train_alg="imitation",
                          optim="sgd", accum_steps=accum, seed=3))
    batch = items[:4]

    acc = Trainer(mk(2), world)
    p0 = flatten_params(acc.params)
    acc.train_step(batch)
    mid = flatten_params(acc.params)
    for k in p0:   # first micro-batch only accumulates — params unchanged
        np.testing.assert_array_equal(p0[k], mid[k])
    acc.train_step(batch)
    p_acc = flatten_params(acc.params)

    big = Trainer(mk(1), world)
    big.train_step(batch + batch)    # one 2x-batch step
    p_big = flatten_params(big.params)
    moved = 0
    for k in p0:
        np.testing.assert_allclose(p_acc[k], p_big[k], atol=2e-6, err_msg=k)
        moved += int(not np.array_equal(p0[k], p_acc[k]))
    assert moved > 10   # the step actually applied


def test_bf16_grad_accumulation_matches_f32(world, items):
    """TrainConfig.grads_dtype='bfloat16': the f32 master params are cast to
    bf16 BEFORE jax.grad, moving the scan backward's weight-grad running sums
    (the dominant non-matmul bucket, docs/PERF.md round-3 decomposition) to
    half the HBM bytes.  At bf16 compute dtype the forward is value-identical
    (the model casts params to bf16 anyway), so the LOSS must match the f32
    baseline exactly; the updated params agree to bf16 grad-rounding, and the
    masters stay f32."""
    from vln_magic_tpu.utils.checkpoint import flatten_params

    model = ModelConfig(
        vocab_size=300, hidden_size=32, num_attention_heads=2,
        num_l_layers=1, num_pano_layers=1, num_x_layers=1, image_feat_size=16,
        max_position_embeddings=64, hidden_dropout=0.0, attention_dropout=0.0)
    mk = lambda gdt: MagicConfig(
        model=model, env=EnvConfig(max_action_len=4, max_gmap_len=16),
        train=TrainConfig(batch_size=4, lr=1e-3, train_alg="imitation",
                          optim="sgd", compute_dtype="bfloat16",
                          grads_dtype=gdt, seed=3))
    batch = items[:4]

    f32 = Trainer(mk("float32"), world)
    m_f32 = f32.train_step(batch)
    bf16 = Trainer(mk("bfloat16"), world)
    m_bf16 = bf16.train_step(batch)

    # forward identical => identical loss (params cast to bf16 either way)
    assert float(m_bf16["loss"]) == pytest.approx(float(m_f32["loss"]),
                                                  rel=1e-6)
    p_f, p_b = flatten_params(f32.params), flatten_params(bf16.params)
    moved = 0
    for k in p_f:
        # masters stay f32 — the bf16 cast lives inside loss_fn only
        assert p_b[k].dtype == p_f[k].dtype, k
        # updates differ only by bf16 rounding of the per-step grad sums
        scale = max(1e-3, float(np.max(np.abs(p_f[k]))))
        np.testing.assert_allclose(p_b[k], p_f[k], atol=0.03 * scale,
                                   err_msg=k)
        moved += int(not np.allclose(p_f[k], p_b[k]))
    assert np.isfinite(m_bf16["grad_norm"]) and m_bf16["grad_norm"] > 0
