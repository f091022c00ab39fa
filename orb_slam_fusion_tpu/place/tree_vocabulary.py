"""Hierarchical binary vocabulary: the DBoW2 tree as batched descent.

Reference semantics: TemplatedVocabulary<FORB> (3rdparty/DBoW2/DBoW2/
TemplatedVocabulary.h) — a k=10-branching, L-level tree of 256-bit ORB
centroids. `transform` descends the tree per descriptor (argmin Hamming
among the current node's children at every level) to produce a (word id,
tf-idf weight) pair plus the node id at an intermediate level (the "direct
index" that buckets SearchByBoW matching, FeatureVector in the reference).

The CPU version chases child pointers one descriptor at a time. Here the
tree is flattened into three device arrays

    node_desc     (num_nodes, 8)  uint32  — every node's 256-bit centroid
    children_idx  (num_nodes, K)  int32   — child node ids, -1 padded
    word_id       (num_nodes,)    int32   — leaf -> word, -1 for inner

and the descent runs all N descriptors in lock step: L iterations of
gather (N,K) child ids -> gather (N,K,8) centroids -> XOR+popcount ->
argmin. Pure VPU work with static shapes; a ragged tree (leaves above the
bottom level) self-loops via the -1 padding so the node index simply stops
moving. The loaders read both DBoW2 interchange formats — the text format
(ORBvoc.txt: "k L scoring weighting" header, then `parent is_leaf d0..d31
weight` per line, TemplatedVocabulary.h:1248) and the fork's packed binary
format (loadFromBinaryFile/saveToBinaryFile, TemplatedVocabulary.h:1358,
1407) — so vocabularies trained for the reference drop straight in.

Training (`train_vocabulary`) is hierarchical binary k-medians (bitwise
majority vote centroids), the same algorithm DBoW2's `create` uses
offline; it runs on host numpy since it is tooling, not the serving path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class TreeVocabulary(NamedTuple):
    node_desc: jnp.ndarray     # (num_nodes, 8) uint32 centroids
    children_idx: jnp.ndarray  # (num_nodes, K) int32, -1 padded
    word_id: jnp.ndarray       # (num_nodes,) int32, -1 for inner nodes
    word_weight: jnp.ndarray   # (num_words,) float32 idf weights
    word_node: jnp.ndarray     # (num_words,) int32 node id of each word

    @property
    def num_words(self) -> int:
        return self.word_weight.shape[0]

    @property
    def branching(self) -> int:
        return self.children_idx.shape[1]

    def depth(self) -> int:
        """Tree depth L (host-side; walks children_idx)."""
        ch = np.asarray(self.children_idx)
        depth, frontier = 0, np.array([0])
        while True:
            nxt = ch[frontier].ravel()
            nxt = nxt[nxt >= 0]
            if nxt.size == 0:
                return depth
            frontier = nxt
            depth += 1


def _popcount_rows(x: np.ndarray) -> np.ndarray:
    """Host popcount over the last axis of a uint32 array."""
    return np.unpackbits(x.view(np.uint8), axis=-1).sum(axis=-1)


@functools.partial(jax.jit, static_argnames=("levels", "direct_level"))
def quantize_tree(vocab: TreeVocabulary, desc: jnp.ndarray,
                  valid: jnp.ndarray, levels: int,
                  direct_level: Optional[int] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched tree descent: (N,8) descriptors -> (word id, direct node id).

    direct_level counts from the root; the node visited there is the
    reference's direct-index bucket (FeatureVector key — ORB-SLAM uses
    levelsup=4 from the leaves, i.e. L-4 from the root; the default derives
    that from `levels` so non-L=6 vocabularies keep DBoW2 semantics).
    Returns (word (N,) int32 with -1 invalid, node (N,) int32 with -1
    invalid).
    """
    if direct_level is None:
        direct_level = max(levels - 4, 1)
    n = desc.shape[0]
    node = jnp.zeros(n, jnp.int32)
    direct = jnp.zeros(n, jnp.int32)
    for level in range(levels):
        ch = vocab.children_idx[node]                      # (N, K)
        ch_desc = vocab.node_desc[jnp.maximum(ch, 0)]      # (N, K, 8)
        x = jnp.bitwise_xor(desc[:, None, :], ch_desc)
        dist = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
        dist = jnp.where(ch >= 0, dist, jnp.int32(1 << 14))
        sel = jnp.argmin(dist, axis=-1)
        nxt = jnp.take_along_axis(ch, sel[:, None], axis=1)[:, 0]
        node = jnp.where(nxt >= 0, nxt, node)              # leaf: stay put
        if level + 1 == direct_level:
            direct = node
    word = vocab.word_id[node]
    return (jnp.where(valid, word, -1),
            jnp.where(valid, direct, -1))


@jax.jit
def _bow_from_words(word: jnp.ndarray, valid: jnp.ndarray,
                    word_weight: jnp.ndarray) -> jnp.ndarray:
    V = word_weight.shape[0]
    ok = valid & (word >= 0)
    w = jnp.clip(word, 0, V - 1)
    vec = jax.ops.segment_sum(
        jnp.where(ok, word_weight[w], 0.0), w, num_segments=V)
    total = jnp.maximum(jnp.sum(vec), 1e-9)
    return vec / total


def bow_vector_tree(vocab: TreeVocabulary, desc: jnp.ndarray,
                    valid: jnp.ndarray, levels: int) -> jnp.ndarray:
    """L1-normalized TF-IDF vector (num_words,) — DBoW2 TF_IDF weighting."""
    word, _ = quantize_tree(vocab, desc, valid, levels)
    return _bow_from_words(word, valid, vocab.word_weight)


# ---------------------------------------------------------------------------
# training: hierarchical binary k-medians (host tooling)
# ---------------------------------------------------------------------------

def _kmedians_binary(desc: np.ndarray, k: int, rng: np.random.RandomState,
                     iters: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Binary k-medians: centroids are bitwise majority votes.

    Returns (centroids (k',8) uint32, assignment (N,)) with k' <= k.
    """
    n = desc.shape[0]
    k = min(k, n)
    centers = desc[rng.choice(n, k, replace=False)]
    bits = np.unpackbits(desc.view(np.uint8), axis=-1)      # (N, 256)
    assign = np.zeros(n, np.int64)
    for _ in range(iters):
        cbits = np.unpackbits(centers.view(np.uint8), axis=-1)
        # Hamming distance via matmul on ±1 bits: d = (256 - dot)/2
        dot = (2.0 * bits - 1.0) @ (2.0 * cbits - 1.0).T
        new_assign = np.argmax(dot, axis=1)
        if np.array_equal(new_assign, assign):
            break
        assign = new_assign
        for c in range(centers.shape[0]):
            members = bits[assign == c]
            if members.shape[0] == 0:
                continue
            maj = (members.mean(axis=0) >= 0.5).astype(np.uint8)
            centers[c] = np.packbits(maj).view(np.uint32)
    # drop empty clusters
    used = np.unique(assign)
    remap = -np.ones(centers.shape[0], np.int64)
    remap[used] = np.arange(used.size)
    return centers[used], remap[assign]


def train_vocabulary(desc: np.ndarray, k: int = 10, levels: int = 3,
                     seed: int = 0) -> TreeVocabulary:
    """Train a k^levels-word tree from (N,8) uint32 descriptors.

    Reference: TemplatedVocabulary::create (HKmeansStep) — hierarchical
    k-means over binary descriptors with majority-vote centroids. Weights
    are idf against the training set treated as one document per
    descriptor source is unavailable here, so idf = log(N / leaf size),
    the standard DBoW2 initialization when every feature is its own doc.
    """
    desc = np.ascontiguousarray(desc, np.uint32)
    rng = np.random.RandomState(seed)
    nodes_desc = [np.zeros(8, np.uint32)]                   # root placeholder
    children: list[list[int]] = [[]]
    node_level = [0]

    def split(node_id: int, members: np.ndarray, level: int) -> None:
        if level == levels or members.shape[0] <= 1:
            return
        centers, assign = _kmedians_binary(members, k, rng)
        for c in range(centers.shape[0]):
            cid = len(nodes_desc)
            nodes_desc.append(centers[c])
            children.append([])
            node_level.append(level + 1)
            children[node_id].append(cid)
            split(cid, members[assign == c], level + 1)

    split(0, desc, 0)
    num_nodes = len(nodes_desc)
    node_desc = np.stack(nodes_desc)
    children_idx = -np.ones((num_nodes, k), np.int32)
    for nid, ch in enumerate(children):
        children_idx[nid, :len(ch)] = ch
    word_id = -np.ones(num_nodes, np.int32)
    leaf_ids = [nid for nid in range(num_nodes) if not children[nid]
                and nid != 0]
    for w, nid in enumerate(leaf_ids):
        word_id[nid] = w

    # idf weights: leaf population against the training corpus
    vocab = TreeVocabulary(
        node_desc=jnp.asarray(node_desc),
        children_idx=jnp.asarray(children_idx),
        word_id=jnp.asarray(word_id),
        word_weight=jnp.ones(max(len(leaf_ids), 1), jnp.float32),
        word_node=jnp.asarray(np.array(leaf_ids, np.int32)))
    word, _ = quantize_tree(vocab, jnp.asarray(desc),
                            jnp.ones(desc.shape[0], bool), levels)
    counts = np.bincount(np.asarray(word), minlength=len(leaf_ids))
    idf = np.log(desc.shape[0] / np.maximum(counts, 1.0)).astype(np.float32)
    return vocab._replace(word_weight=jnp.asarray(np.maximum(idf, 1e-3)))


# ---------------------------------------------------------------------------
# DBoW2 interchange formats
# ---------------------------------------------------------------------------

def _assemble(k: int, parents: np.ndarray, is_leaf: np.ndarray,
              descs: np.ndarray, weights: np.ndarray) -> TreeVocabulary:
    """Build the flattened arrays from per-node records (node 0 = root)."""
    num_nodes = parents.shape[0] + 1
    node_desc = np.zeros((num_nodes, 8), np.uint32)
    node_desc[1:] = descs
    children_idx = -np.ones((num_nodes, k), np.int32)
    fill = np.zeros(num_nodes, np.int32)
    for nid in range(1, num_nodes):
        p = parents[nid - 1]
        if fill[p] < k:
            children_idx[p, fill[p]] = nid
            fill[p] += 1
    word_id = -np.ones(num_nodes, np.int32)
    leaf_nodes = np.flatnonzero(
        np.concatenate([[False], is_leaf.astype(bool)]))
    word_id[leaf_nodes] = np.arange(leaf_nodes.size)
    word_weight = np.zeros(max(leaf_nodes.size, 1), np.float32)
    word_weight[:leaf_nodes.size] = weights[leaf_nodes - 1]
    return TreeVocabulary(
        node_desc=jnp.asarray(node_desc),
        children_idx=jnp.asarray(children_idx),
        word_id=jnp.asarray(word_id),
        word_weight=jnp.asarray(word_weight),
        word_node=jnp.asarray(leaf_nodes.astype(np.int32)))


def load_tree_text(path: str) -> Tuple[TreeVocabulary, int]:
    """DBoW2 text format (TemplatedVocabulary::loadFromTextFile:1248).

    Header: `k L scoring weighting`; per node: `parent is_leaf b0..b31 w`.
    Returns (vocab, levels). Uses the native C parser when available.
    """
    from ..native_bridge import parse_dbow2_text
    parsed = parse_dbow2_text(path)
    if parsed is not None:
        k, levels, parents, is_leaf, descs, weights = parsed
    else:
        with open(path) as f:
            header = f.readline().split()
            k, levels = int(header[0]), int(header[1])
            rows = np.loadtxt(f, dtype=np.float64, ndmin=2)
        parents = rows[:, 0].astype(np.int32)
        is_leaf = rows[:, 1].astype(np.uint8)
        descs = np.ascontiguousarray(
            rows[:, 2:34].astype(np.uint8)).view(np.uint32)
        weights = rows[:, 34].astype(np.float32)
    return _assemble(k, parents, is_leaf, descs, weights), levels


def save_tree_text(path: str, vocab: TreeVocabulary, levels: int,
                   scoring: int = 0, weighting: int = 0) -> None:
    """Write DBoW2 text format (saveToTextFile:1332)."""
    ch = np.asarray(vocab.children_idx)
    nd = np.asarray(vocab.node_desc)
    wid = np.asarray(vocab.word_id)
    ww = np.asarray(vocab.word_weight)
    num_nodes = nd.shape[0]
    parent = np.zeros(num_nodes, np.int32)
    for nid in range(num_nodes):
        for c in ch[nid]:
            if c >= 0:
                parent[c] = nid
    with open(path, "w") as f:
        f.write(f"{vocab.branching} {levels}  {scoring} {weighting}\n")
        for nid in range(1, num_nodes):
            leaf = int(wid[nid] >= 0)
            byts = nd[nid].view(np.uint8)
            w = float(ww[wid[nid]]) if leaf else 0.0
            f.write(f"{parent[nid]} {leaf} "
                    + " ".join(str(int(b)) for b in byts)
                    + f" {w}\n")


def load_tree_binary(path: str) -> Tuple[TreeVocabulary, int]:
    """The fork's packed binary format (loadFromBinaryFile:1358).

    Layout: u32 nb_nodes, u32 size_node, i32 k, i32 L, i32 scoring,
    i32 weighting; then per node: i32 parent, 32 desc bytes, f32 weight,
    u8 is_leaf.
    """
    with open(path, "rb") as f:
        head = np.fromfile(f, np.uint32, 2)
        # nb_nodes counts the root too (saveToBinaryFile writes
        # m_nodes.size() but only nodes 1..); the file holds nb_nodes-1
        # records.
        nb_nodes, size_node = int(head[0]) - 1, int(head[1])
        k, levels, _scoring, _weighting = np.fromfile(f, np.int32, 4)
        raw = np.fromfile(f, np.uint8, nb_nodes * size_node)
    if size_node != 41:
        raise ValueError(f"{path}: unexpected node size {size_node}")
    rec = raw.reshape(nb_nodes, size_node)
    parents = rec[:, 0:4].copy().view(np.int32)[:, 0]
    descs = np.ascontiguousarray(rec[:, 4:36]).view(np.uint32)
    weights = rec[:, 36:40].copy().view(np.float32)[:, 0]
    is_leaf = rec[:, 40]
    return _assemble(int(k), parents, is_leaf, descs, weights), int(levels)


def save_tree_binary(path: str, vocab: TreeVocabulary, levels: int,
                     scoring: int = 0, weighting: int = 0) -> None:
    """Write the fork's packed binary format (saveToBinaryFile:1407)."""
    ch = np.asarray(vocab.children_idx)
    nd = np.asarray(vocab.node_desc)
    wid = np.asarray(vocab.word_id)
    ww = np.asarray(vocab.word_weight)
    num_nodes = nd.shape[0]
    parent = np.zeros(num_nodes, np.int32)
    for nid in range(num_nodes):
        for c in ch[nid]:
            if c >= 0:
                parent[c] = nid
    rec = np.zeros((num_nodes - 1, 41), np.uint8)
    for i, nid in enumerate(range(1, num_nodes)):
        rec[i, 0:4] = np.frombuffer(np.int32(parent[nid]).tobytes(),
                                    np.uint8)
        rec[i, 4:36] = nd[nid].view(np.uint8)
        leaf = wid[nid] >= 0
        w = np.float32(ww[wid[nid]] if leaf else 0.0)
        rec[i, 36:40] = np.frombuffer(w.tobytes(), np.uint8)
        rec[i, 40] = np.uint8(leaf)
    with open(path, "wb") as f:
        np.array([num_nodes, 41], np.uint32).tofile(f)
        np.array([vocab.branching, levels, scoring, weighting],
                 np.int32).tofile(f)
        rec.tofile(f)
