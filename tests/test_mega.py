import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_magic_tpu.models.mega import MegaEncoder, MovingAverageGatedAttention
from vln_magic_tpu.ops.ema import damped_ema_reference, damped_ema_scan


def test_ema_scan_matches_sequential():
    rng = np.random.default_rng(0)
    b, l, d, n = 2, 17, 8, 4
    x = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    alpha = jnp.asarray(rng.uniform(0.1, 0.9, (d, n)), jnp.float32)
    delta = jnp.asarray(rng.uniform(0.1, 0.9, (d, n)), jnp.float32)
    beta = jnp.asarray(rng.standard_normal((d, n)), jnp.float32)
    eta = jnp.asarray(rng.standard_normal((d, n)), jnp.float32)
    y1, h1 = damped_ema_scan(x, alpha, delta, beta, eta)
    y2, h2 = damped_ema_reference(x, alpha, delta, beta, eta)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-4,
                               atol=1e-5)


def test_ema_initial_state():
    rng = np.random.default_rng(1)
    b, l, d, n = 1, 5, 4, 2
    x = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    alpha = jnp.full((d, n), 0.5)
    delta = jnp.full((d, n), 0.5)
    beta = jnp.ones((d, n))
    eta = jnp.ones((d, n))
    h0 = jnp.asarray(rng.standard_normal((b, d, n)), jnp.float32)
    y1, _ = damped_ema_scan(x, alpha, delta, beta, eta, h0)
    y2, _ = damped_ema_reference(x, alpha, delta, beta, eta, h0)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4,
                               atol=1e-5)


def test_mega_block_shapes_and_masking():
    m = MovingAverageGatedAttention(hidden_size=32, chunk_size=8, ema_ndim=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 20, 32))
    mask = jnp.ones((2, 20), bool).at[1, 15:].set(False)
    params = m.init(jax.random.PRNGKey(1), x, mask)
    y = m.apply(params, x, mask)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_mega_chunking_is_local():
    """With chunk_size=4, perturbing token 0 must not change the *attention*
    contribution in a later chunk beyond what flows through the EMA — i.e.
    a model with zeroed EMA output sees no cross-chunk effect."""
    m = MovingAverageGatedAttention(hidden_size=16, chunk_size=4, ema_ndim=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 12, 16))
    params = m.init(jax.random.PRNGKey(1), x)
    # zero the EMA input expansion -> mx==0 everywhere -> q,k,gates constant
    params = jax.tree_util.tree_map(lambda p: p, params)
    flat = params["params"]
    flat["beta"] = jnp.zeros_like(flat["beta"])
    # keep the reset gate open (silu(bias) != 0) so attention still flows
    flat["reset"]["bias"] = jnp.ones_like(flat["reset"]["bias"])
    y1 = m.apply({"params": flat}, x)
    x2 = x.at[0, 0].add(10.0)
    y2 = m.apply({"params": flat}, x2)
    # tokens in chunks 2+ (positions >= 8) unchanged
    np.testing.assert_allclose(np.asarray(y1[0, 8:]), np.asarray(y2[0, 8:]),
                               rtol=1e-5, atol=1e-6)
    # within the first chunk they do change
    assert not np.allclose(np.asarray(y1[0, 1]), np.asarray(y2[0, 1]))


def test_mega_encoder_long_sequence():
    enc = MegaEncoder(hidden_size=32, num_layers=2, chunk_size=32, ema_ndim=4)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 300, 32))
    mask = jnp.ones((2, 300), bool)
    params = enc.init(jax.random.PRNGKey(3), x, mask)
    y = jax.jit(lambda p, x, m: enc.apply(p, x, m))(params, x, mask)
    assert y.shape == (2, 300, 32)
    assert np.isfinite(np.asarray(y)).all()
