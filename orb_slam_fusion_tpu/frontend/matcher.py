"""Descriptor matching: Hamming distances + masked search strategies.

Replaces ORBmatcher (src/cam/orb_feature/orb_matcher.cc). The reference
implements 12 search entry points as per-feature loops over grid buckets with
popcount bit tricks (orb_matcher.cc:1877+). The TPU formulation computes the
full (or windowed) N x M Hamming distance matrix in one shot — XOR +
`lax.population_count` on uint32 words is pure VPU work, and for typical
frame sizes (1-2k features) the dense matrix is far cheaper than the memory
traffic the CPU version spends chasing grid pointers. Search constraints
(projection window, scale compatibility, epipolar bands, BoW buckets) become
boolean masks added to the distance matrix before the argmin.

Thresholds follow the reference: TH_LOW=50, TH_HIGH=100, and the 0.9
best/second-best ratio (orb_matcher.h:35-37, orb_matcher.cc).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

TH_LOW = 50
TH_HIGH = 100
RATIO = 0.9
BIG = jnp.int32(1 << 14)  # sentinel distance for masked-out pairs (>256 max)


def hamming_distance(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """(N,8) uint32 x (M,8) uint32 -> (N,M) int32 Hamming distances."""
    x = jnp.bitwise_xor(d1[:, None, :], d2[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def hamming_distance_rows(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """Paired (N,8)x(N,8) uint32 -> (N,) int32 Hamming distances."""
    x = jnp.bitwise_xor(d1, d2)
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def masked_min2(dist: jnp.ndarray, mask: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-row best and second-best over masked columns.

    Returns (best_idx (N,), best_val (N,), second_val (N,)).
    """
    d = jnp.where(mask, dist, BIG)
    best_idx = jnp.argmin(d, axis=1)
    best = jnp.take_along_axis(d, best_idx[:, None], axis=1)[:, 0]
    d2 = d.at[jnp.arange(d.shape[0]), best_idx].set(BIG)
    second = jnp.min(d2, axis=1)
    return best_idx, best, second


def match_mutual(desc1: jnp.ndarray, valid1: jnp.ndarray,
                 desc2: jnp.ndarray, valid2: jnp.ndarray,
                 max_dist: int = TH_LOW, ratio: float = RATIO
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mutual-best brute-force matching with ratio test.

    Returns (match_idx (N,) int32 into desc2 or -1, valid_match (N,) bool).
    Used for monocular initialization (reference:
    ORBmatcher::SearchForInitialization, orb_matcher.cc:597 — which also
    windows by position; callers add that mask via `match_masked`).
    """
    dist = hamming_distance(desc1, desc2)
    mask = valid1[:, None] & valid2[None, :]
    idx12, best12, second12 = masked_min2(dist, mask)
    idx21, best21, _ = masked_min2(dist.T, mask.T)
    mutual = idx21[idx12] == jnp.arange(desc1.shape[0])
    ok = (
        mutual
        & (best12 <= max_dist)
        & (best12.astype(jnp.float32) <= ratio * second12.astype(jnp.float32))
        & valid1
    )
    return jnp.where(ok, idx12, -1).astype(jnp.int32), ok


def match_masked(desc1: jnp.ndarray, desc2: jnp.ndarray,
                 pair_mask: jnp.ndarray, max_dist: int = TH_HIGH,
                 ratio: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Best match per row under an arbitrary pair mask (N,M).

    The generic primitive behind projection-window / epipolar / BoW-bucket
    searches: build the mask, take the masked argmin.
    """
    dist = hamming_distance(desc1, desc2)
    idx, best, second = masked_min2(dist, pair_mask)
    ok = (best <= max_dist) & (
        best.astype(jnp.float32) <= ratio * second.astype(jnp.float32))
    return jnp.where(ok, idx, -1).astype(jnp.int32), ok


def search_by_projection(
    pred_uv: jnp.ndarray,        # (N,2) projected map points
    mp_desc: jnp.ndarray,        # (N,8) map-point descriptors
    mp_valid: jnp.ndarray,       # (N,)
    mp_octave: jnp.ndarray,      # (N,) predicted octave of each point
    kp_uv: jnp.ndarray,          # (M,2) frame keypoints
    kp_desc: jnp.ndarray,        # (M,8)
    kp_valid: jnp.ndarray,       # (M,)
    kp_octave: jnp.ndarray,      # (M,)
    radius: jnp.ndarray | float, # search radius in px (scalar or (N,))
    max_dist: int = TH_HIGH,
    ratio: float = RATIO,
    octave_window: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Grid-windowed projection search as a masked dense match.

    Reference: ORBmatcher::SearchByProjection (orb_matcher.cc:42 for
    track-local-map, :1518 frame-to-frame): for each projected map point,
    find the best descriptor among keypoints within `radius` pixels and a
    compatible octave. Returns (match_idx (N,), ok (N,)).
    """
    r = jnp.asarray(radius, jnp.float32)
    if r.ndim == 0:
        r = jnp.broadcast_to(r, (pred_uv.shape[0],))
    d2 = jnp.sum((pred_uv[:, None, :] - kp_uv[None, :, :]) ** 2, axis=-1)
    within = d2 <= (r[:, None] ** 2)
    oct_ok = jnp.abs(mp_octave[:, None] - kp_octave[None, :]) <= octave_window
    mask = within & oct_ok & mp_valid[:, None] & kp_valid[None, :]
    return match_masked(mp_desc, kp_desc, mask, max_dist, ratio)


def rotation_consistency_mask(angle1: jnp.ndarray, angle2: jnp.ndarray,
                              match_idx: jnp.ndarray, ok: jnp.ndarray,
                              n_bins: int = 30, keep_bins: int = 3
                              ) -> jnp.ndarray:
    """Histogram-based rotation consistency filter.

    Reference: ORBmatcher::ComputeThreeMaxima + HISTO_LENGTH=30 rotation
    histogram (orb_matcher.cc:1841): keep only matches whose keypoint-angle
    difference falls in the `keep_bins` most popular bins.
    """
    da = angle1 - jnp.where(ok, angle2[match_idx], 0.0)
    two_pi = 2.0 * jnp.pi
    da = jnp.mod(da, two_pi)
    bins = jnp.clip((da / two_pi * n_bins).astype(jnp.int32), 0, n_bins - 1)
    hist = jax.ops.segment_sum(ok.astype(jnp.int32), bins, num_segments=n_bins)
    _, top_bins = jax.lax.top_k(hist, keep_bins)
    in_top = jnp.any(bins[:, None] == top_bins[None, :], axis=1)
    return ok & in_top


def search_by_bow(node1: jnp.ndarray, desc1: jnp.ndarray, valid1: jnp.ndarray,
                  node2: jnp.ndarray, desc2: jnp.ndarray, valid2: jnp.ndarray,
                  max_dist: int = TH_LOW, ratio: float = RATIO
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Direct-index-constrained matching (ORBmatcher::SearchByBoW).

    Reference (orb_matcher.cc:215 KF-frame, :697 KF-KF): features are only
    compared when their descriptors quantize through the SAME vocabulary
    node at the direct-index level (DBoW2 FeatureVector buckets) — a
    drastically pruned brute force. Here the bucket constraint is a node-id
    equality mask over the dense distance matrix; node ids come from
    `tree_vocabulary.quantize_tree`'s direct output (-1 = invalid, never
    matches).

    Returns (match_idx (N,) into desc2 or -1, ok (N,)).
    """
    same_node = (node1[:, None] == node2[None, :]) & (node1 >= 0)[:, None]
    mask = same_node & valid1[:, None] & valid2[None, :]
    return match_masked(desc1, desc2, mask, max_dist, ratio)
