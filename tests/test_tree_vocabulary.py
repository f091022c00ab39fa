"""Hierarchical vocabulary: descent correctness, formats, BoW matching.

Covers place/tree_vocabulary.py against reference semantics
(3rdparty/DBoW2/DBoW2/TemplatedVocabulary.h): tree transform (descend by
Hamming argmin), TF-IDF BoW vectors, the text format of loadFromTextFile
(:1248) and the fork's binary format of loadFromBinaryFile (:1358), and
the direct-index bucketing used by ORBmatcher::SearchByBoW.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam_fusion_tpu.place.tree_vocabulary import (
    TreeVocabulary, bow_vector_tree, load_tree_binary, load_tree_text,
    quantize_tree, save_tree_binary, save_tree_text, train_vocabulary)


def _rand_desc(rng, n):
    return rng.randint(0, 2 ** 32, size=(n, 8), dtype=np.uint64).astype(
        np.uint32)


def _host_descend(vocab: TreeVocabulary, desc: np.ndarray) -> np.ndarray:
    """Reference-style per-descriptor pointer-chasing descent (oracle)."""
    nd = np.asarray(vocab.node_desc)
    ch = np.asarray(vocab.children_idx)
    wid = np.asarray(vocab.word_id)

    def pop(a, b):
        return np.unpackbits((a ^ b).view(np.uint8)).sum()

    out = np.zeros(desc.shape[0], np.int64)
    for i, d in enumerate(desc):
        node = 0
        while True:
            kids = ch[node][ch[node] >= 0]
            if kids.size == 0:
                break
            dists = [pop(d, nd[c]) for c in kids]
            node = kids[int(np.argmin(dists))]
        out[i] = wid[node]
    return out


@pytest.fixture(scope="module")
def trained():
    rng = np.random.RandomState(3)
    train = _rand_desc(rng, 600)
    vocab = train_vocabulary(train, k=4, levels=3, seed=0)
    return vocab, train


def test_train_structure(trained):
    vocab, _ = trained
    assert vocab.branching == 4
    assert vocab.depth() == 3
    assert vocab.num_words <= 4 ** 3
    assert vocab.num_words > 16  # tree actually fanned out
    wid = np.asarray(vocab.word_id)
    assert (np.sort(wid[wid >= 0]) == np.arange(vocab.num_words)).all()
    # word_node inverts word_id
    wn = np.asarray(vocab.word_node)
    assert (wid[wn] == np.arange(vocab.num_words)).all()


def test_batched_descent_matches_host_oracle(trained):
    vocab, _ = trained
    rng = np.random.RandomState(4)
    q = _rand_desc(rng, 64)
    word, _ = quantize_tree(vocab, jnp.asarray(q), jnp.ones(64, bool),
                            levels=3)
    expect = _host_descend(vocab, q)
    np.testing.assert_array_equal(np.asarray(word), expect)


def test_quantize_invalid_masked(trained):
    vocab, _ = trained
    rng = np.random.RandomState(5)
    q = _rand_desc(rng, 8)
    valid = np.array([True, False] * 4)
    word, node = quantize_tree(vocab, jnp.asarray(q), jnp.asarray(valid), 3)
    assert (np.asarray(word)[~valid] == -1).all()
    assert (np.asarray(node)[~valid] == -1).all()
    assert (np.asarray(word)[valid] >= 0).all()


def test_direct_index_level(trained):
    vocab, _ = trained
    rng = np.random.RandomState(6)
    q = _rand_desc(rng, 32)
    _, node = quantize_tree(vocab, jnp.asarray(q), jnp.ones(32, bool),
                            levels=3, direct_level=1)
    # a level-1 node is a direct child of the root
    root_children = set(
        int(c) for c in np.asarray(vocab.children_idx)[0] if c >= 0)
    assert all(int(n) in root_children for n in np.asarray(node))


def test_bow_vector_normalized_and_idf_weighted(trained):
    vocab, train = trained
    vec = bow_vector_tree(vocab, jnp.asarray(train[:100]),
                          jnp.ones(100, bool), levels=3)
    v = np.asarray(vec)
    assert v.shape == (vocab.num_words,)
    assert abs(v.sum() - 1.0) < 1e-5
    assert (v >= 0).all()


def test_same_frame_scores_higher_than_random(trained):
    vocab, train = trained
    rng = np.random.RandomState(7)
    frame = train[:80]
    # mild corruption: flip a few bits per descriptor
    noise = rng.randint(0, 2 ** 32, frame.shape,
                        dtype=np.uint64).astype(np.uint32)
    noisy = frame ^ (noise & noise & 0x01010101)
    other = _rand_desc(rng, 80)
    ones = jnp.ones(80, bool)
    va = bow_vector_tree(vocab, jnp.asarray(frame), ones, 3)
    vb = bow_vector_tree(vocab, jnp.asarray(noisy), ones, 3)
    vc = bow_vector_tree(vocab, jnp.asarray(other), ones, 3)
    l1 = lambda a, b: 1.0 - 0.5 * float(jnp.abs(a - b).sum())
    assert l1(va, vb) > l1(va, vc)


def test_text_roundtrip(tmp_path, trained):
    vocab, _ = trained
    p = str(tmp_path / "voc.txt")
    save_tree_text(p, vocab, levels=3)
    back, levels = load_tree_text(p)
    assert levels == 3
    np.testing.assert_array_equal(np.asarray(back.node_desc),
                                  np.asarray(vocab.node_desc))
    np.testing.assert_array_equal(np.asarray(back.children_idx),
                                  np.asarray(vocab.children_idx))
    np.testing.assert_array_equal(np.asarray(back.word_id),
                                  np.asarray(vocab.word_id))
    np.testing.assert_allclose(np.asarray(back.word_weight),
                               np.asarray(vocab.word_weight), rtol=1e-6)


def test_text_parse_native_matches_python(tmp_path, trained):
    from orb_slam_fusion_tpu import native_bridge
    if not native_bridge.available():
        pytest.skip("native library unavailable")
    vocab, _ = trained
    p = str(tmp_path / "voc.txt")
    save_tree_text(p, vocab, levels=3)
    parsed = native_bridge.parse_dbow2_text(p)
    assert parsed is not None
    k, levels, parents, is_leaf, descs, weights = parsed
    assert (k, levels) == (4, 3)
    assert parents.shape[0] == vocab.node_desc.shape[0] - 1
    np.testing.assert_array_equal(descs, np.asarray(vocab.node_desc)[1:])
    wid = np.asarray(vocab.word_id)[1:]
    np.testing.assert_array_equal(is_leaf.astype(bool), wid >= 0)


def test_binary_roundtrip(tmp_path, trained):
    vocab, _ = trained
    p = str(tmp_path / "voc.bin")
    save_tree_binary(p, vocab, levels=3)
    back, levels = load_tree_binary(p)
    assert levels == 3
    np.testing.assert_array_equal(np.asarray(back.node_desc),
                                  np.asarray(vocab.node_desc))
    np.testing.assert_array_equal(np.asarray(back.word_id),
                                  np.asarray(vocab.word_id))
    np.testing.assert_allclose(np.asarray(back.word_weight),
                               np.asarray(vocab.word_weight), rtol=1e-6)
    # quantization identical through the round trip
    rng = np.random.RandomState(8)
    q = jnp.asarray(_rand_desc(rng, 32))
    w1, _ = quantize_tree(vocab, q, jnp.ones(32, bool), 3)
    w2, _ = quantize_tree(back, q, jnp.ones(32, bool), 3)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_search_by_bow_bucketing(trained):
    from orb_slam_fusion_tpu.frontend.matcher import search_by_bow
    vocab, train = trained
    rng = np.random.RandomState(9)
    d1 = train[:48]
    perm = rng.permutation(48)
    d2 = d1[perm]
    ones = jnp.ones(48, bool)
    _, n1 = quantize_tree(vocab, jnp.asarray(d1), ones, 3, direct_level=2)
    _, n2 = quantize_tree(vocab, jnp.asarray(d2), ones, 3, direct_level=2)
    idx, ok = search_by_bow(n1, jnp.asarray(d1), ones,
                            n2, jnp.asarray(d2), ones)
    idx = np.asarray(idx)
    ok = np.asarray(ok)
    # identical descriptors land in the same bucket -> perfect recovery
    assert ok.sum() >= 40
    inv = np.argsort(perm)
    assert (idx[ok] == inv[ok]).all()
    # and features in different buckets never match
    diff_bucket = np.asarray(n1)[:, None] != np.asarray(n2)[None, :]
    for i in np.nonzero(ok)[0]:
        assert not diff_bucket[i, idx[i]]
