"""BMUF param-averaging DP, Luna linear attention, product quantization —
the remaining fairseq-tower capabilities (SURVEY §2.4 rows: BMUF optim/
bmuf.py, luna_attention.py, quantization/pq)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_magic_tpu.parallel.bmuf import bmuf_init, bmuf_sync, replicate_workers


def test_bmuf_matches_reference_recurrence():
    """bmuf_sync follows fairseq's block-momentum update: v' = bm*v +
    (1-bm)*lr*(avg - global), global' = global + v', workers restart from
    global' + bm*v' (Nesterov)."""
    g = {"w": jnp.asarray([1.0, 2.0])}
    state = bmuf_init(g)
    workers = replicate_workers(g, 4)
    # each worker drifted differently
    drift = jnp.asarray([[0.4, 0.0], [0.0, 0.4], [0.2, 0.2], [0.2, 0.2]])
    workers = {"w": workers["w"] + drift}
    new_workers, state = bmuf_sync(workers, state, block_momentum=0.5,
                                   block_lr=1.0, use_nesterov=True)
    avg = np.asarray([1.2, 2.2])
    v = 0.5 * 0.0 + 0.5 * (avg - np.asarray([1.0, 2.0]))   # [0.1, 0.1]
    new_global = np.asarray([1.0, 2.0]) + v
    start = new_global + 0.5 * v
    np.testing.assert_allclose(np.asarray(state["global"]["w"]), new_global,
                               rtol=1e-6)
    for w in range(4):
        np.testing.assert_allclose(np.asarray(new_workers["w"][w]), start,
                                   rtol=1e-6)


def test_bmuf_local_sgd_converges():
    """K workers running independent SGD on sharded quadratic objectives,
    BMUF-synced every 5 steps, must converge to the joint optimum."""
    rng = np.random.default_rng(0)
    targets = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    joint = targets.mean(0)

    params = {"w": jnp.zeros(8)}
    state = bmuf_init(params)
    workers = replicate_workers(params, 4)

    @jax.jit
    def local_step(w):
        # worker k minimizes ||w_k - target_k||^2
        grads = 2 * (w["w"] - targets)
        return {"w": w["w"] - 0.1 * grads}

    for step in range(150):
        workers = local_step(workers)
        if (step + 1) % 5 == 0:
            workers, state = bmuf_sync(workers, state, block_momentum=0.5)
    assert float(jnp.abs(state["global"]["w"] - joint).max()) < 0.01


def test_luna_encoder_linear_attention():
    from vln_magic_tpu.models.luna import LunaEncoder

    enc = LunaEncoder(vocab_size=100, hidden_size=32, num_layers=2,
                      num_heads=2, proj_len=8)
    ids = np.asarray([[5, 6, 7, 8, 1, 1], [9, 10, 1, 1, 1, 1]], np.int32)
    mask = ids != 1
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                      jnp.asarray(mask))
    x, p, pooled = enc.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    assert x.shape == (2, 6, 32) and p.shape == (2, 8, 32)
    assert pooled.shape == (2, 32)
    assert np.isfinite(np.asarray(x)).all()
    # padded positions must not leak into the pooled readout: changing a
    # masked token's id leaves the pooled output unchanged
    ids2 = ids.copy()
    ids2[0, 5] = 55
    _, _, pooled2 = enc.apply(params, jnp.asarray(ids2), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(pooled[0]), np.asarray(pooled2[0]),
                               atol=1e-5)


def test_product_quantizer_roundtrip_and_monotonicity():
    from vln_magic_tpu.utils.quantize import ProductQuantizer

    w = np.random.default_rng(3).standard_normal((256, 32)).astype(np.float32)
    hi = ProductQuantizer(num_blocks=4, num_centroids=64, iters=6).fit(w)
    lo = ProductQuantizer(num_blocks=4, num_centroids=4, iters=6).fit(w)
    err = lambda pq: float(np.abs(pq.decode(pq.encode(w)) - w).mean())
    assert err(hi) < err(lo)
    codes = hi.encode(w)
    assert codes.dtype == np.uint8 and codes.shape == (256, 4)
    back = ProductQuantizer.from_state(hi.state())
    np.testing.assert_array_equal(back.decode(codes), hi.decode(codes))


def test_lmdb_store_is_gated():
    from vln_magic_tpu.data.features import ImageFeatureStore

    store = ImageFeatureStore("/nonexistent.lmdb", 16, file_type="lmdb")
    with pytest.raises((ImportError, Exception)):
        store.get("scan", "vp")
