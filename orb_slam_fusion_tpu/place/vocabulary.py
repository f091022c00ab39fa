"""Flat binary vocabulary: LSH codebook over 256-bit ORB descriptors.

Reference semantics being replaced: TemplatedVocabulary::transform
(3rdparty/DBoW2/DBoW2/TemplatedVocabulary.h) — descend a k=10, L=5 tree by
Hamming distance to produce (word id, tf-idf weight) per descriptor, then
accumulate an L1-normalized BoW vector. Here the codebook is flat: V words
drawn deterministically (seeded) from the uniform 256-bit distribution, and
quantization is one dense (N x V) XOR+popcount argmin — an MXU/VPU-friendly
LSH with the same role. Larger V sharpens discrimination; V=4096 gives
256-bit words ~1.4k avg distance separation, plenty for candidate retrieval
(exact geometric verification follows anyway, as in the reference).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class BinaryVocabulary(NamedTuple):
    words: jnp.ndarray   # (V, 8) uint32 codebook


def make_vocabulary(num_words: int = 4096, seed: int = 7) -> BinaryVocabulary:
    rng = np.random.RandomState(seed)
    w = rng.randint(0, 2 ** 32, size=(num_words, 8),
                    dtype=np.uint64).astype(np.uint32)
    return BinaryVocabulary(words=jnp.asarray(w))


@jax.jit
def quantize(vocab: BinaryVocabulary, desc: jnp.ndarray,
             valid: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) descriptors -> (N,) word ids (-1 for invalid slots)."""
    x = jnp.bitwise_xor(desc[:, None, :], vocab.words[None, :, :])
    dist = jnp.sum(jax.lax.population_count(x), axis=-1)  # (N, V)
    wid = jnp.argmin(dist, axis=-1).astype(jnp.int32)
    return jnp.where(valid, wid, -1)


@jax.jit
def bow_vector(vocab: BinaryVocabulary, desc: jnp.ndarray,
               valid: jnp.ndarray) -> jnp.ndarray:
    """L1-normalized term-frequency vector (V,) for one frame.

    IDF weighting is applied at scoring time by the database (the document
    frequencies evolve as keyframes are added; reference bakes idf into the
    vocabulary instead because its corpus is the offline training set).
    """
    V = vocab.words.shape[0]
    wid = quantize(vocab, desc, valid)
    counts = jax.ops.segment_sum(
        valid.astype(jnp.float32), jnp.clip(wid, 0, V - 1), num_segments=V)
    total = jnp.maximum(jnp.sum(counts), 1.0)
    return counts / total


@jax.jit
def l1_score(v: jnp.ndarray, ws: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 similarity of one vector vs a batch: 1 - 0.5*|v - w|_1.

    Both inputs must be L1-normalized; returns (K,) scores in [0, 1].
    Reference: ScoringObject.cpp L1Scoring.
    """
    return 1.0 - 0.5 * jnp.sum(jnp.abs(v[None, :] - ws), axis=-1)


# ---------------------------------------------------------------------------
# binary vocabulary persistence (reference: the fork's custom
# loadFromBinaryFile/saveToBinaryFile, TemplatedVocabulary.h:1358/1407, and
# the txt->bin converter tools/orbvoc_binary_convertor.cc)
# ---------------------------------------------------------------------------

_VOCAB_MAGIC = b"OSFV"
_VOCAB_VERSION = 1


def save_vocabulary_binary(path: str, vocab: BinaryVocabulary) -> None:
    """Write the codebook as a small self-describing binary file."""
    words = np.asarray(vocab.words, dtype=np.uint32)
    with open(path, "wb") as f:
        f.write(_VOCAB_MAGIC)
        np.array([_VOCAB_VERSION, words.shape[0]], np.uint32).tofile(f)
        words.tofile(f)


def load_vocabulary_binary(path: str) -> BinaryVocabulary:
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != _VOCAB_MAGIC:
            raise ValueError(f"{path}: not an OSF vocabulary file")
        version, n = np.fromfile(f, np.uint32, 2)
        if version != _VOCAB_VERSION:
            raise ValueError(f"{path}: unsupported vocabulary version "
                             f"{version}")
        words = np.fromfile(f, np.uint32, int(n) * 8).reshape(int(n), 8)
    return BinaryVocabulary(words=jnp.asarray(words))


def load_vocabulary_text(path: str) -> BinaryVocabulary:
    """Read a text vocabulary: one word per line, 8 uint32 values.

    The import path for externally-trained codebooks (the reference ships
    a text ORB vocabulary and converts it to binary with
    orbvoc_binary_convertor; a DBoW2-format tree vocabulary's leaf
    centroids can be exported to this flat format).
    """
    rows = np.loadtxt(path, dtype=np.uint64, comments="#", ndmin=2)
    if rows.shape[1] != 8:
        raise ValueError(f"{path}: expected 8 columns, got {rows.shape[1]}")
    return BinaryVocabulary(words=jnp.asarray(rows.astype(np.uint32)))
