import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_magic_tpu.agent import losses as L


def test_mse_loss_weighting_and_reduction():
    s = jnp.ones((4, 3)) * 2
    t = jnp.zeros((4, 3))
    assert float(L.mse_loss(s, t)) == pytest.approx(4 * 3 * 4)
    assert float(L.mse_loss(s, t, loss_type="mean")) == pytest.approx(4.0)
    w = jnp.array([1.0, 0.0, 0.0, 0.0])
    assert float(L.mse_loss(s, t, t_sample_weights=w)) == pytest.approx(12.0)


def test_kd_loss_zero_when_equal():
    logits = jnp.array([[1.0, 2.0, 3.0], [0.0, 0.0, 5.0]])
    assert float(L.kd_loss(logits, logits)) == pytest.approx(0.0, abs=1e-5)


def test_kd_loss_masking_neg_inf():
    s = jnp.array([[1.0, 2.0, -jnp.inf]])
    t = jnp.array([[1.0, 2.0, -jnp.inf]])
    v = float(L.kd_loss(s, t))
    assert np.isfinite(v) and v == pytest.approx(0.0, abs=1e-5)


def test_kd_loss_temperature_scaling():
    s = jnp.array([[1.0, 0.0, 0.0]])
    t = jnp.array([[0.0, 1.0, 0.0]])
    v1 = float(L.kd_loss(s, t, temperature=1))
    v4 = float(L.kd_loss(s, t, temperature=4))
    assert v1 > 0 and v4 > 0 and v1 != v4


def test_kd_loss_grad_flows_to_student_only():
    s = jnp.array([[1.0, 0.0, 2.0]])
    t = jnp.array([[0.5, 0.5, 1.0]])
    g = jax.grad(lambda x: L.kd_loss(x, t))(s)
    assert np.abs(np.asarray(g)).sum() > 0


def test_dkd_decomposition_properties():
    key = jax.random.PRNGKey(0)
    s = jax.random.normal(key, (6, 8))
    t = jax.random.normal(jax.random.PRNGKey(1), (6, 8))
    tgt = jnp.array([0, 1, 2, 3, 4, 5])
    v = float(L.dkd_loss(s, t, tgt, alpha=1.0, beta=8.0))
    assert np.isfinite(v) and v > 0
    # identical logits -> zero
    assert float(L.dkd_loss(s, s, tgt)) == pytest.approx(0.0, abs=1e-4)
    # beta scales the non-target part monotonically
    v0 = float(L.dkd_loss(s, t, tgt, alpha=1.0, beta=0.0))
    v8 = float(L.dkd_loss(s, t, tgt, alpha=1.0, beta=8.0))
    assert v8 > v0


def test_mktd_transforms():
    ce = jnp.array([0.0, 1.0, 10.0])
    w = np.asarray(L.exponential_decay(ce, 0.7))
    assert w[0] == pytest.approx(1.0) and w[2] < w[1] < w[0]
    wn = np.asarray(L.invert_normalized_losses(ce))
    assert wn[0] == pytest.approx(1.0) and wn[2] == pytest.approx(0.0)


def test_mkrw_weights_sum_to_k():
    w = L.mkrw_weights(jax.random.PRNGKey(3), 5, temp=1.0)
    assert np.asarray(w).sum() == pytest.approx(5.0, rel=1e-5)
    assert (np.asarray(w) > 0).all()
    # lower temp -> peakier
    wp = L.mkrw_weights(jax.random.PRNGKey(3), 5, temp=0.1)
    assert np.asarray(wp).max() > np.asarray(w).max()


def test_masked_ce_ignore():
    logits = jnp.array([[10.0, 0.0], [0.0, 10.0]])
    ce, valid = L.masked_softmax_ce(logits, jnp.array([0, -100]))
    assert float(ce[1]) == 0.0 and not bool(valid[1])
    assert float(ce[0]) < 1e-3
