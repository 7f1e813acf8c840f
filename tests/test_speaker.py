import numpy as np
import pytest

from vln_magic_tpu.agent.speaker import Speaker, SpeakerTokenizer
from vln_magic_tpu.env import make_synthetic_world
from vln_magic_tpu.env.synthetic import make_synthetic_instructions


@pytest.fixture(scope="module")
def setup():
    world = make_synthetic_world(num_scans=1, nodes_per_scan=14, feat_dim=16,
                                 seed=41)
    items = make_synthetic_instructions(world, 8, np.random.default_rng(6),
                                        min_path=2, max_path=4)
    texts = ["walk forward to the kitchen", "turn left at the sofa",
             "go past the table then stop", "enter the red room",
             "climb the stairs up", "exit through the door",
             "wait beside the lamp", "go straight ahead now"]
    for it, t in zip(items, texts):
        it["instruction"] = t
    return world, items


def test_tokenizer_roundtrip(setup):
    world, items = setup
    tok = SpeakerTokenizer.build(items)
    assert tok.vocab_size <= 992
    ids = tok.encode("walk forward to the kitchen")
    assert ids[0] == tok.BOS and ids[-1] == tok.EOS
    assert tok.decode(ids[1:]) == "walk forward to the kitchen"
    assert tok.shrink(ids) == ids[1:-1]
    # unknown words map to UNK
    assert tok.encode("qwertyuiop")[1] == tok.UNK


def test_speaker_training_reduces_loss(setup):
    world, items = setup
    tok = SpeakerTokenizer.build(items)
    sp = Speaker(world, feat_dim=16, vocab_size=tok.vocab_size, max_steps=4,
                 max_len=12, hidden=64, layers=1, heads=2, lr=3e-3)
    first = sp.train_step(items, tok)
    for _ in range(14):
        last = sp.train_step(items, tok)
    assert np.isfinite(first) and last < first


def test_speaker_infer_and_back_translate(setup):
    world, items = setup
    tok = SpeakerTokenizer.build(items)
    sp = Speaker(world, feat_dim=16, vocab_size=tok.vocab_size, max_steps=4,
                 max_len=12, hidden=64, layers=1, heads=2)
    tokens = sp.infer_batch(items[:4], tok)
    assert tokens.shape == (4, 12)
    assert (tokens[:, 0] == tok.BOS).all()
    new_items, noise = sp.back_translate(items[:4], tok)
    assert len(new_items) == 4
    assert noise.shape == (16,)
    for it in new_items:
        assert isinstance(it["instruction"], str)
    # originals untouched
    assert items[0]["instruction"] == "walk forward to the kitchen"


def test_speaker_overfits_tiny_corpus(setup):
    """Teacher-forced training on one repeated target should memorize it."""
    world, items = setup
    tok = SpeakerTokenizer.build(items)
    sp = Speaker(world, feat_dim=16, vocab_size=tok.vocab_size, max_steps=4,
                 max_len=10, hidden=64, layers=1, heads=2, lr=5e-3)
    batch = items[:2]
    for _ in range(60):
        loss = sp.train_step(batch, tok)
    assert loss < 1.0, f"speaker failed to overfit (loss {loss})"


def test_sampled_decode_temperature(setup):
    """EnvDrop-style sampled back-translation: temperature is a traced
    scalar (no recompile across the schedule); near-zero temperature
    collapses sampling onto the greedy decode; the schedule anneals."""
    world, items = setup
    tok = SpeakerTokenizer.build(items)
    sp = Speaker(world, feat_dim=16, vocab_size=tok.vocab_size, max_steps=4,
                 max_len=12, hidden=64, layers=1, heads=2)
    import jax

    greedy = sp.infer_batch(items[:4], tok)
    cold = sp.infer_batch(items[:4], tok, sample=True, temperature=1e-4,
                          rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(cold, greedy)
    hot_a = sp.infer_batch(items[:4], tok, sample=True, temperature=5.0,
                           rng=jax.random.PRNGKey(1))
    hot_b = sp.infer_batch(items[:4], tok, sample=True, temperature=5.0,
                           rng=jax.random.PRNGKey(2))
    assert (hot_a != hot_b).any()   # hot sampling actually samples

    t0 = Speaker.sample_temperature(0, 100, start=1.0, end=0.5)
    t1 = Speaker.sample_temperature(50, 100, start=1.0, end=0.5)
    t2 = Speaker.sample_temperature(100, 100, start=1.0, end=0.5)
    assert t0 == 1.0 and t2 == 0.5 and t2 < t1 < t0

    # sampled back-translation path
    new_items, _ = sp.back_translate(items[:4], tok, sample=True,
                                     temperature=t1)
    assert len(new_items) == 4


def test_speaker_save_load_roundtrip(setup, tmp_path):
    """Speaker.save/load mirror the reference's transpeaker container
    (transpeaker.py:322-344): params (and optionally optimizer state)
    roundtrip; a fresh Speaker resumes to identical decodes."""
    import torch

    world, items = setup
    tok = SpeakerTokenizer.build(items)
    kw = dict(feat_dim=16, vocab_size=tok.vocab_size, max_steps=4,
              max_len=12, hidden=64, layers=1, heads=2, word_size=48,
              lr=3e-3)
    sp = Speaker(world, **kw)
    for _ in range(3):
        sp.train_step(items, tok)
    path = str(tmp_path / "speaker.pt")
    sp.save(epoch=4, path=path)
    # container format on disk
    states = torch.load(path, map_location="cpu", weights_only=False)
    assert set(states) == {"transpeaker"}
    assert states["transpeaker"]["epoch"] == 5
    assert "optimizer" in states["transpeaker"]

    sp2 = Speaker(world, **kw)
    before = sp2.infer_batch(items[:4], tok)
    ep = sp2.load(path, load_optim=True)
    assert ep == 5
    after = sp2.infer_batch(items[:4], tok)
    want = sp.infer_batch(items[:4], tok)
    assert not np.array_equal(before, want)       # fresh init differed
    np.testing.assert_array_equal(after, want)    # resumed exactly
    # optimizer state restored leaf-for-leaf
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(sp.opt_state),
                    jax.tree_util.tree_leaves(sp2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # continued training works from the restored state
    assert np.isfinite(sp2.train_step(items, tok))


def test_speaker_load_rejects_mismatched_dims(setup, tmp_path):
    world, items = setup
    tok = SpeakerTokenizer.build(items)
    sp = Speaker(world, feat_dim=16, vocab_size=tok.vocab_size, max_steps=4,
                 max_len=12, hidden=64, layers=1, heads=2, word_size=48)
    path = str(tmp_path / "speaker.pt")
    sp.save(0, path)
    other = Speaker(world, feat_dim=16, vocab_size=tok.vocab_size,
                    max_steps=4, max_len=12, hidden=64, layers=1, heads=2,
                    word_size=32)   # different --wemb
    with np.testing.assert_raises(ValueError):
        other.load(path)


def test_wemb_reaches_word_embedding(setup):
    """--wemb (word_size) must size the decoder word embedding
    (transpeaker.py:34-39 ctor contract)."""
    from vln_magic_tpu.utils.checkpoint import flatten_params

    world, items = setup
    tok = SpeakerTokenizer.build(items)
    sp = Speaker(world, feat_dim=16, vocab_size=tok.vocab_size, max_steps=4,
                 max_len=12, hidden=64, layers=1, heads=2, word_size=80)
    flat = flatten_params(sp.params)
    emb = flat["params.decoder.word_emb.embedding"]
    assert emb.shape == (tok.vocab_size, 80)
