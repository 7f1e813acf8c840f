import numpy as np
import pytest

from vln_magic_tpu import native


def test_native_builds():
    assert native.native_available(), "g++ build of the native library failed"


def test_bleu_perfect_match():
    h = [[1, 2, 3, 4, 5]]
    assert native.bleu_score(h, h) == pytest.approx(100.0)


def test_bleu_partial_and_ordering():
    ref = [[1, 2, 3, 4, 5, 6]]
    good = [[1, 2, 3, 4, 9, 9]]
    bad = [[9, 9, 9, 9, 9, 9]]
    s_good = native.bleu_score(good, ref)
    s_bad = native.bleu_score(bad, ref)
    assert 0 < s_bad < s_good < 100


def test_bleu_clipping():
    # repeated hyp tokens must be clipped by reference multiplicity
    ref = [[1, 2, 3]]
    hyp = [[1, 1, 1]]
    c = native.bleu_counts(hyp, ref)
    assert c[0] == 1    # unigram matches clipped to 1
    assert c[1] == 3


def test_edit_distance_batch():
    a = [[1, 2, 3], [1, 2, 3, 4], [5], []]
    b = [[1, 2, 3], [1, 3, 4], [6, 7], [1, 2]]
    d = native.edit_distance(a, b)
    np.testing.assert_array_equal(d, [0, 1, 2, 2])


def test_edit_distance_matches_python_reference():
    rng = np.random.default_rng(0)
    for _ in range(10):
        a = rng.integers(0, 5, rng.integers(1, 12)).tolist()
        b = rng.integers(0, 5, rng.integers(1, 12)).tolist()
        d = int(native.edit_distance([a], [b])[0])
        assert d == native._levenshtein_np(np.array(a), np.array(b))


def test_edit_ops_reconstruct():
    a = [1, 2, 3, 4]
    b = [1, 3, 4, 5]
    d, ops = native.edit_ops(a, b)
    assert d == 2
    # applying ops to a must produce b
    out, i, bi = [], 0, 0
    for op in ops:
        if op == 0:
            out.append(a[i]); i += 1; bi += 1
        elif op == 1:
            out.append(b[bi]); i += 1; bi += 1
        elif op == 2:
            out.append(b[bi]); bi += 1
        else:
            i += 1
    assert out == b


def test_batch_by_size_token_cap():
    lengths = [10, 10, 10, 30, 5, 5]
    batches = native.batch_by_size(lengths, max_tokens=30)
    # every batch respects max_len * count <= 30
    for idx in batches:
        ls = [lengths[i] for i in idx]
        assert max(ls) * len(ls) <= 30
    assert sorted(np.concatenate(batches).tolist()) == list(range(6))


def test_batch_by_size_sentence_cap():
    batches = native.batch_by_size([1] * 10, max_sentences=3)
    assert [len(b) for b in batches] == [3, 3, 3, 1]


def test_wer_scorer():
    from vln_magic_tpu.native import wer

    # identical -> 0; one sub in 4 words -> 0.25; corpus-pooled
    assert wer(["a b c d"], ["a b c d"]) == 0.0
    assert wer(["a b x d"], ["a b c d"]) == 0.25
    # 1 sub + 1 del over 8 ref words = 0.25
    assert wer(["a b x d", "a b c"], ["a b c d", "a b c d"]) == 0.25
    # token-id input path
    assert wer([[1, 2, 3]], [[1, 2, 4]]) == pytest.approx(1 / 3)
    assert wer([], []) == 0.0
