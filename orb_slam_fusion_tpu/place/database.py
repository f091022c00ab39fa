"""Keyframe database: dense BoW matrix + loop/reloc candidate queries.

Replaces KeyFrameDatabase (src/map/keyframe_database.cc): the inverted file
(word -> keyframe list) becomes a dense (max_kf x V) matrix of normalized
TF vectors; candidate detection (DetectNBestCandidates,
keyframe_database.cc:579 — used top-3 by loop closing) is one masked
IDF-weighted L1 scoring pass over all keyframes plus a top-k.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .vocabulary import BinaryVocabulary, bow_vector
from .tree_vocabulary import TreeVocabulary, bow_vector_tree


def compute_bow_vector(vocab, desc: jnp.ndarray, valid: jnp.ndarray,
                       levels: int = 0) -> jnp.ndarray:
    """Polymorphic BoW: flat LSH codebook or hierarchical tree.

    `levels` is the tree depth (static; ignored for flat vocabularies).
    Safe to call under jit — the dispatch happens at trace time.
    """
    if isinstance(vocab, TreeVocabulary):
        return bow_vector_tree(vocab, desc, valid, levels)
    return bow_vector(vocab, desc, valid)


def vocab_size(vocab) -> int:
    if isinstance(vocab, TreeVocabulary):
        return vocab.num_words
    return vocab.words.shape[0]


class KeyFrameDatabase:
    """Host-managed dense BoW database (device-resident arrays).

    Accepts either a flat `BinaryVocabulary` or a hierarchical
    `TreeVocabulary` (pass its depth as `levels`).
    """

    def __init__(self, vocab, max_kf: int, levels: int = 0):
        self.vocab = vocab
        self.levels = levels
        V = vocab_size(vocab)
        self.bow = jnp.zeros((max_kf, V), jnp.float32)
        self.present = jnp.zeros(max_kf, bool)

    def add(self, kf_id: int, desc: jnp.ndarray, valid: jnp.ndarray) -> None:
        vec = self.compute_bow(desc, valid)
        self.bow = self.bow.at[kf_id].set(vec)
        self.present = self.present.at[kf_id].set(True)

    def remove(self, kf_id: int) -> None:
        self.present = self.present.at[kf_id].set(False)

    def permute(self, order) -> None:
        """Re-index the rows after a keyframe-table compaction."""
        order = jnp.asarray(order)
        self.bow = self.bow[order]
        self.present = self.present[order]

    def grow(self, new_max_kf: int) -> None:
        """Pad the row capacity after a keyframe-table growth."""
        K, V = self.bow.shape
        if new_max_kf <= K:
            return
        self.bow = jnp.concatenate(
            [self.bow, jnp.zeros((new_max_kf - K, V), jnp.float32)], axis=0)
        self.present = jnp.concatenate(
            [self.present, jnp.zeros(new_max_kf - K, bool)], axis=0)

    def compute_bow(self, desc: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
        return compute_bow_vector(self.vocab, desc, valid, self.levels)

    def query(self, query_vec: jnp.ndarray, exclude: jnp.ndarray,
              top_k: int = 3) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Top-k candidate keyframes by IDF-weighted L1 similarity.

        exclude: (max_kf,) bool — covisible keyframes + self (the reference
        excludes the query's covisibility group, keyframe_database.cc).
        Returns (ids (top_k,), scores (top_k,)); ids are -1 where no
        candidate exists.
        """
        return _query(self.bow, self.present, query_vec, exclude, top_k)


@functools.partial(jax.jit, static_argnames=("top_k",))
def _query(bow, present, query_vec, exclude, top_k):
    K, V = bow.shape
    # idf from current document frequencies
    df = jnp.sum((bow > 0) & present[:, None], axis=0)
    n_docs = jnp.maximum(jnp.sum(present), 1)
    idf = jnp.log(n_docs.astype(jnp.float32) / (1.0 + df))
    idf = jnp.maximum(idf, 0.0)

    qw = query_vec * idf
    qn = jnp.maximum(jnp.sum(jnp.abs(qw)), 1e-9)
    dbw = bow * idf[None, :]
    dbn = jnp.maximum(jnp.sum(jnp.abs(dbw), axis=1, keepdims=True), 1e-9)
    scores = 1.0 - 0.5 * jnp.sum(
        jnp.abs(qw[None, :] / qn - dbw / dbn), axis=-1)
    scores = jnp.where(present & ~exclude, scores, -1.0)
    vals, ids = jax.lax.top_k(scores, top_k)
    return jnp.where(vals > 0, ids, -1).astype(jnp.int32), vals
