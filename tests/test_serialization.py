"""Map checkpoint save/load round-trip tests."""

import os
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_fusion_tpu import lie
from orb_slam_fusion_tpu.io.serialization import load_map, save_map
from orb_slam_fusion_tpu.map import add_keyframe, add_map_points, make_empty_map
from orb_slam_fusion_tpu.place import make_vocabulary


def _small_map():
    m = make_empty_map(4, 16, 8)
    m, ids = add_map_points(
        m, jnp.arange(18, dtype=jnp.float32).reshape(6, 3),
        jnp.ones((6, 8), jnp.uint32), jnp.zeros((6, 3)),
        jnp.int32(0), jnp.int32(0), jnp.ones(6, bool))
    m, _ = add_keyframe(
        m, lie.se3_exp(jnp.arange(6, dtype=jnp.float32) * 0.1), 1.5,
        jnp.ones((8, 2)), jnp.full((8, 8), 3, jnp.uint32),
        jnp.zeros(8, jnp.int32), jnp.ones(8, bool),
        jnp.arange(-2, 6, dtype=jnp.int32))
    return m


def test_roundtrip(tmp_path):
    m = _small_map()
    vocab = make_vocabulary(256)
    path = os.path.join(tmp_path, "map.npz")
    save_map(path, m, vocab.words, kf_uright=jnp.full((4, 8), -1.0))
    m2, extras = load_map(path, vocab.words)
    for name in m._fields:
        a, b = getattr(m, name), getattr(m2, name)
        if name == "kf_pose":
            np.testing.assert_array_equal(np.asarray(a.R), np.asarray(b.R))
            np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert "kf_uright" in extras
    assert extras["kf_uright"].shape == (4, 8)


def test_vocab_guard(tmp_path):
    m = _small_map()
    vocab = make_vocabulary(256)
    other = make_vocabulary(256, seed=99)
    path = os.path.join(tmp_path, "map.npz")
    save_map(path, m, vocab.words)
    with pytest.raises(ValueError, match="vocabulary checksum"):
        load_map(path, other.words)
    # loading without a vocab skips the check
    load_map(path)


def test_vocabulary_binary_roundtrip(tmp_path):
    """Binary vocabulary save/load + text import (reference: the fork's
    loadFromBinaryFile/saveToBinaryFile and orbvoc_binary_convertor)."""
    import numpy as np
    from orb_slam_fusion_tpu.place.vocabulary import (
        load_vocabulary_binary, load_vocabulary_text, make_vocabulary,
        save_vocabulary_binary)

    voc = make_vocabulary(256, seed=3)
    p = str(tmp_path / "v.bin")
    save_vocabulary_binary(p, voc)
    back = load_vocabulary_binary(p)
    assert (np.asarray(back.words) == np.asarray(voc.words)).all()

    t = str(tmp_path / "v.txt")
    np.savetxt(t, np.asarray(voc.words, np.uint32), fmt="%d")
    txt = load_vocabulary_text(t)
    assert (np.asarray(txt.words) == np.asarray(voc.words)).all()
