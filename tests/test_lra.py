import jax
import numpy as np
import optax
import pytest

from vln_magic_tpu.models.lra import LRAClassifier, lra_train_step


def _task(rng, n, length, vocab=16):
    """Whole-sequence counting task: are there more 5-markers than
    6-markers?  Markers are scattered across the full length, so the
    classifier must aggregate global evidence (chunk-local peeking at a
    fixed window can't decide it); order-sensitivity across chunks is
    pinned separately by tests/test_mega.py."""
    tokens = rng.integers(7, vocab, (n, length)).astype(np.int32)
    labels = rng.integers(0, 2, n).astype(np.int32)
    for i in range(n):
        hi, lo = (5, 6) if labels[i] else (6, 5)
        n_hi = int(rng.integers(5, 9))
        n_lo = n_hi - int(rng.integers(2, 5))
        pos = rng.choice(length, n_hi + max(n_lo, 0), replace=False)
        tokens[i, pos[:n_hi]] = hi
        tokens[i, pos[n_hi:]] = lo
    return tokens, labels


@pytest.mark.parametrize("encoder", ["mega", "luna", "dense"])
def test_lra_classifier_learns(encoder):
    rng = np.random.default_rng(0)
    length = 96
    tokens, labels = _task(rng, 64, length)
    model = LRAClassifier(vocab_size=16, num_classes=2, hidden_size=32,
                          num_layers=1, num_heads=2, encoder=encoder,
                          chunk_size=24, proj_len=8)
    params = model.init(jax.random.PRNGKey(0), tokens[:2])
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)
    step = lra_train_step(model, opt)
    key = jax.random.PRNGKey(1)
    first = None
    for i in range(100):
        key, k = jax.random.split(key)
        params, opt_state, loss, acc = step(
            params, opt_state, tokens, np.ones_like(tokens, bool), labels, k)
        if first is None:
            first = float(loss)
    assert np.isfinite(first)
    assert float(loss) < first * 0.7     # actually learns
    assert float(acc) > 0.8


def test_lra_linear_trunks_accept_long_sequences():
    """mega/luna are linear in length: a 4x longer sequence compiles and
    runs with the same parameters (static-shape per length, no O(N^2)
    blowup in memory)."""
    rng = np.random.default_rng(1)
    tokens, _ = _task(rng, 4, 512)
    for encoder in ("mega", "luna"):
        model = LRAClassifier(vocab_size=16, num_classes=2, hidden_size=32,
                              num_layers=1, num_heads=2, encoder=encoder,
                              chunk_size=64, proj_len=8)
        params = model.init(jax.random.PRNGKey(0), tokens)
        logits = model.apply(params, tokens)
        assert logits.shape == (4, 2)
        assert np.isfinite(np.asarray(logits)).all()
