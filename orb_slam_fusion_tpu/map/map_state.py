"""Fixed-capacity SoA map state and functional update ops.

Reference parity (re-designed, not ported):
* KeyFrame table  <- src/map/keyframe.cc (pose, features, observations)
* MapPoint table  <- src/map/mappoint.cc (position, descriptor, normal,
                     scale-invariance distances, found/visible counters)
* covisibility    <- KeyFrame::UpdateConnections (keyframe.cc) — here a
                     single boolean-membership matmul
* Map container   <- src/map/map.cc — here just the tables + counters

Capacities are static (jit cache keys); validity masks make unused slots
inert. All update functions are pure: they take and return a MapState.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import lie


class MapState(NamedTuple):
    """All map data as padded device arrays.

    K = max keyframes, F = features per frame, M = max map points.
    """

    # --- keyframes -------------------------------------------------------
    kf_pose: lie.SE3            # (K,) Tcw — world-to-camera
    kf_valid: jnp.ndarray       # (K,) bool
    kf_timestamp: jnp.ndarray   # (K,) float64-ish seconds (float32 ok for sim)
    kf_uv: jnp.ndarray          # (K, F, 2) keypoint pixels (level-0 coords)
    kf_desc: jnp.ndarray        # (K, F, 8) uint32
    kf_octave: jnp.ndarray      # (K, F) int32
    kf_feat_valid: jnp.ndarray  # (K, F) bool
    kf_obs_mp: jnp.ndarray      # (K, F) int32 — map-point row per feature, -1 if none

    # --- map points ------------------------------------------------------
    mp_pos: jnp.ndarray         # (M, 3)
    mp_desc: jnp.ndarray        # (M, 8) uint32 representative descriptor
    mp_valid: jnp.ndarray       # (M,) bool
    mp_normal: jnp.ndarray      # (M, 3) mean viewing direction
    mp_ref_kf: jnp.ndarray      # (M,) int32 reference keyframe
    mp_visible: jnp.ndarray     # (M,) int32 — times predicted visible
    mp_found: jnp.ndarray       # (M,) int32 — times actually matched
    mp_first_kf: jnp.ndarray    # (M,) int32 — keyframe that created it
    # scale-invariance range (reference mappoint.h:134-148): the distance
    # band inside which the creating observation's octave stays valid;
    # drives PredictScale and the octave gate of every projection search
    mp_min_dist: jnp.ndarray    # (M,) float
    mp_max_dist: jnp.ndarray    # (M,) float

    # --- counters --------------------------------------------------------
    n_kf: jnp.ndarray           # () int32
    n_mp: jnp.ndarray           # () int32

    @property
    def max_kf(self) -> int:
        return self.kf_valid.shape[0]

    @property
    def max_mp(self) -> int:
        return self.mp_valid.shape[0]

    @property
    def n_feat(self) -> int:
        return self.kf_uv.shape[1]


def make_empty_map(max_kf: int, max_mp: int, n_feat: int,
                   dtype=jnp.float32) -> MapState:
    return MapState(
        kf_pose=lie.se3_identity((max_kf,), dtype),
        kf_valid=jnp.zeros(max_kf, bool),
        kf_timestamp=jnp.zeros(max_kf, dtype),
        kf_uv=jnp.zeros((max_kf, n_feat, 2), dtype),
        kf_desc=jnp.zeros((max_kf, n_feat, 8), jnp.uint32),
        kf_octave=jnp.zeros((max_kf, n_feat), jnp.int32),
        kf_feat_valid=jnp.zeros((max_kf, n_feat), bool),
        kf_obs_mp=jnp.full((max_kf, n_feat), -1, jnp.int32),
        mp_pos=jnp.zeros((max_mp, 3), dtype),
        mp_desc=jnp.zeros((max_mp, 8), jnp.uint32),
        mp_valid=jnp.zeros(max_mp, bool),
        mp_normal=jnp.zeros((max_mp, 3), dtype),
        mp_ref_kf=jnp.zeros(max_mp, jnp.int32),
        mp_visible=jnp.zeros(max_mp, jnp.int32),
        mp_found=jnp.zeros(max_mp, jnp.int32),
        mp_first_kf=jnp.zeros(max_mp, jnp.int32),
        mp_min_dist=jnp.zeros(max_mp, dtype),
        mp_max_dist=jnp.full(max_mp, 1e9, dtype),
        n_kf=jnp.int32(0),
        n_mp=jnp.int32(0),
    )


SCALE_FACTOR = 1.2  # reference ORB pyramid scale (orb_extractor scaleFactor)


def scale_invariance_band(dist, octave, num_levels: int,
                          scale: float = SCALE_FACTOR):
    """(min_dist, max_dist) of a point created at `dist` on `octave`.

    Reference: MapPoint::UpdateNormalAndDepth (mappoint.cc) —
    max = dist * scale^octave, min = max / scale^(levels-1).
    """
    max_d = dist * scale ** octave.astype(dist.dtype)
    min_d = max_d * (scale ** -(num_levels - 1))
    return min_d, max_d


def predict_scale(dist, max_dist, num_levels: int,
                  scale: float = SCALE_FACTOR) -> jnp.ndarray:
    """Predicted pyramid octave of a point seen at `dist` (reference:
    MapPoint::PredictScale, mappoint.cc — ceil(log(max/d)/log(s))).

    Points whose band was never set (max_dist at the 1e9 sentinel) carry no
    scale information and predict octave 0 (gate effectively permissive for
    base-level keypoints)."""
    ratio = max_dist / jnp.maximum(dist, 1e-9)
    lvl = jnp.ceil(jnp.log(ratio) / np.log(scale))
    lvl = jnp.where(max_dist < 1e8, lvl, 0.0)
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


def add_keyframe(m: MapState, pose: lie.SE3, timestamp, uv, desc, octave,
                 feat_valid, obs_mp) -> Tuple[MapState, jnp.ndarray]:
    """Append a keyframe at slot n_kf (functional). Returns (map, kf_id).

    If the table is full the write is dropped (valid stays False) — the
    engine layer is responsible for culling before that happens.
    """
    k = m.n_kf
    ok = k < m.max_kf
    ks = jnp.clip(k, 0, m.max_kf - 1)

    def put(table, val):
        return table.at[ks].set(jnp.where(ok, val, table[ks]))

    m = m._replace(
        kf_pose=lie.SE3(put(m.kf_pose.R, pose.R), put(m.kf_pose.t, pose.t)),
        kf_valid=put(m.kf_valid, True),
        kf_timestamp=put(m.kf_timestamp, timestamp),
        kf_uv=put(m.kf_uv, uv),
        kf_desc=put(m.kf_desc, desc),
        kf_octave=put(m.kf_octave, octave),
        kf_feat_valid=put(m.kf_feat_valid, feat_valid),
        kf_obs_mp=put(m.kf_obs_mp, obs_mp),
        n_kf=m.n_kf + ok.astype(jnp.int32),
    )
    return m, jnp.where(ok, k, -1)


def add_map_points(m: MapState, pos, desc, normal, ref_kf, first_kf,
                   valid_new, min_dist=None, max_dist=None
                   ) -> Tuple[MapState, jnp.ndarray]:
    """Append a batch of map points compacted into free slots.

    pos (B,3), desc (B,8), normal (B,3), valid_new (B,) — only entries with
    valid_new are appended (compaction via prefix sums keeps this a single
    scatter, no host sync). min_dist/max_dist (B,) set the scale-invariance
    band (default: unbounded — callers with octave information should pass
    scale_invariance_band results). Returns (map, assigned ids (B,) or -1).
    """
    from ..utils import masked_set

    B = pos.shape[0]
    dtype = pos.dtype
    if min_dist is None:
        min_dist = jnp.zeros(B, dtype)
    if max_dist is None:
        max_dist = jnp.full(B, 1e9, dtype)
    offs = jnp.cumsum(valid_new.astype(jnp.int32)) - 1  # position among new
    slots = m.n_mp + offs
    ok = valid_new & (slots < m.max_mp)

    m = m._replace(
        mp_pos=masked_set(m.mp_pos, slots, pos, ok),
        mp_desc=masked_set(m.mp_desc, slots, desc, ok),
        mp_valid=masked_set(m.mp_valid, slots, jnp.ones(B, bool), ok),
        mp_normal=masked_set(m.mp_normal, slots, normal, ok),
        mp_ref_kf=masked_set(m.mp_ref_kf, slots,
                             jnp.broadcast_to(ref_kf, (B,)), ok),
        mp_first_kf=masked_set(m.mp_first_kf, slots,
                               jnp.broadcast_to(first_kf, (B,)), ok),
        mp_visible=masked_set(m.mp_visible, slots, jnp.zeros(B, jnp.int32), ok),
        mp_found=masked_set(m.mp_found, slots, jnp.zeros(B, jnp.int32), ok),
        mp_min_dist=masked_set(m.mp_min_dist, slots, min_dist, ok),
        mp_max_dist=masked_set(m.mp_max_dist, slots, max_dist, ok),
        n_mp=m.n_mp + jnp.sum(ok.astype(jnp.int32)),
    )
    return m, jnp.where(ok, slots, -1).astype(jnp.int32)


def _front_pack_order(valid: jnp.ndarray) -> jnp.ndarray:
    """Stable permutation moving valid rows to the front.

    argsort of (invalid-flag, original-index) keys: valid rows keep their
    relative order at the front, invalid rows pile at the tail.
    """
    N = valid.shape[0]
    return jnp.argsort(jnp.where(valid, 0, N) + jnp.arange(N))


@jax.jit
def compact_map_points(m: MapState) -> Tuple[MapState, jnp.ndarray]:
    """Reclaim culled map-point slots by front-packing the valid rows.

    Reference analogue: the pointer map frees culled MapPoints outright
    (localmapping.cc:276-311 + Map::EraseMapPoint); with SoA tables the
    equivalent is a periodic compaction so capacity bounds the LIVE point
    set, not the sequence length. Returns (map, old_to_new (M,) int32 with
    -1 for dropped rows) — the host remaps any of its own point indices
    (e.g. the current frame's observation vector) with old_to_new.
    """
    M = m.max_mp
    valid = m.mp_valid
    order = _front_pack_order(valid)
    old_to_new = jnp.where(
        valid, jnp.cumsum(valid.astype(jnp.int32)) - 1, -1).astype(jnp.int32)

    def g(t):
        return t[order]

    obs = m.kf_obs_mp
    new_obs = jnp.where(
        obs >= 0, old_to_new[jnp.clip(obs, 0, M - 1)],
        jnp.int32(-1)).astype(jnp.int32)
    m = m._replace(
        mp_pos=g(m.mp_pos), mp_desc=g(m.mp_desc), mp_valid=g(valid),
        mp_normal=g(m.mp_normal), mp_ref_kf=g(m.mp_ref_kf),
        mp_visible=g(m.mp_visible), mp_found=g(m.mp_found),
        mp_first_kf=g(m.mp_first_kf),
        mp_min_dist=g(m.mp_min_dist), mp_max_dist=g(m.mp_max_dist),
        kf_obs_mp=new_obs,
        n_mp=jnp.sum(valid.astype(jnp.int32)))
    return m, old_to_new


@jax.jit
def compact_keyframes(m: MapState
                      ) -> Tuple[MapState, jnp.ndarray, jnp.ndarray]:
    """Reclaim culled keyframe slots by front-packing the valid rows.

    Reference analogue: KeyFrame::SetBadFlag + Map::EraseKeyFrame free the
    object (localmapping.cc:791-930); here a periodic front-pack. Map points
    whose reference keyframe was dropped are re-homed to their first
    observing keyframe (reference: MapPoint::EraseObservation reassigns
    mpRefKF). Returns (map, old_to_new (K,) int32 with -1 for dropped,
    order (K,) permutation) — the host permutes its own per-keyframe state
    (BoW rows, stereo u_right, inertial tables) with `order` and remaps
    stored keyframe ids with `old_to_new`.
    """
    K = m.max_kf
    valid = m.kf_valid
    order = _front_pack_order(valid)
    old_to_new = jnp.where(
        valid, jnp.cumsum(valid.astype(jnp.int32)) - 1, -1).astype(jnp.int32)

    def g(t):
        return t[order]

    # re-home map points whose reference keyframe was culled
    memb = observation_mask(m)                        # (K, M)
    first_obs = jnp.argmax(memb, axis=0).astype(jnp.int32)   # (M,)
    ref = m.mp_ref_kf
    ref_ok = (ref >= 0) & valid[jnp.clip(ref, 0, K - 1)]
    ref2 = jnp.where(ref_ok, ref, first_obs)
    new_ref = jnp.maximum(old_to_new[jnp.clip(ref2, 0, K - 1)], 0)
    first2 = jnp.where(valid[jnp.clip(m.mp_first_kf, 0, K - 1)],
                       m.mp_first_kf, first_obs)
    new_first = jnp.maximum(old_to_new[jnp.clip(first2, 0, K - 1)], 0)

    m = m._replace(
        kf_pose=lie.SE3(g(m.kf_pose.R), g(m.kf_pose.t)),
        kf_valid=g(valid),
        kf_timestamp=g(m.kf_timestamp),
        kf_uv=g(m.kf_uv), kf_desc=g(m.kf_desc), kf_octave=g(m.kf_octave),
        kf_feat_valid=g(m.kf_feat_valid), kf_obs_mp=g(m.kf_obs_mp),
        mp_ref_kf=new_ref, mp_first_kf=new_first,
        n_kf=jnp.sum(valid.astype(jnp.int32)))
    return m, old_to_new, order


def grow_map(m: MapState, new_max_kf: int = 0, new_max_mp: int = 0
             ) -> MapState:
    """Pad the tables to larger capacities (unbounded-sequence support).

    Doubling growth keeps the number of distinct compiled shapes (and thus
    jit recompiles) logarithmic in the final map size. Zero / smaller
    values leave an axis unchanged.
    """
    K, M = m.max_kf, m.max_mp
    nK, nM = max(new_max_kf, K), max(new_max_mp, M)
    if nK == K and nM == M:
        return m

    def padk(t, fill=0):
        if nK == K:
            return t
        pad = jnp.full((nK - K,) + t.shape[1:], fill, t.dtype)
        return jnp.concatenate([t, pad], axis=0)

    def padm(t, fill=0):
        if nM == M:
            return t
        pad = jnp.full((nM - M,) + t.shape[1:], fill, t.dtype)
        return jnp.concatenate([t, pad], axis=0)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=m.kf_pose.R.dtype),
                           (max(nK - K, 0), 3, 3))
    return m._replace(
        kf_pose=lie.SE3(
            jnp.concatenate([m.kf_pose.R, eye], axis=0) if nK > K
            else m.kf_pose.R,
            padk(m.kf_pose.t)),
        kf_valid=padk(m.kf_valid),
        kf_timestamp=padk(m.kf_timestamp),
        kf_uv=padk(m.kf_uv), kf_desc=padk(m.kf_desc),
        kf_octave=padk(m.kf_octave), kf_feat_valid=padk(m.kf_feat_valid),
        kf_obs_mp=padk(m.kf_obs_mp, -1),
        mp_pos=padm(m.mp_pos), mp_desc=padm(m.mp_desc),
        mp_valid=padm(m.mp_valid), mp_normal=padm(m.mp_normal),
        mp_ref_kf=padm(m.mp_ref_kf), mp_visible=padm(m.mp_visible),
        mp_found=padm(m.mp_found), mp_first_kf=padm(m.mp_first_kf),
        mp_min_dist=padm(m.mp_min_dist),
        mp_max_dist=padm(m.mp_max_dist, 1e9),
    )


def observation_mask(m: MapState) -> jnp.ndarray:
    """(K, M) bool: keyframe k observes map point j.

    The dense membership matrix behind covisibility and local-map queries.
    """
    K, F = m.kf_obs_mp.shape
    M = m.max_mp
    obs = m.kf_obs_mp
    valid = (obs >= 0) & m.kf_feat_valid & m.kf_valid[:, None]
    onehot = jnp.zeros((K, M), bool)
    rows = jnp.broadcast_to(jnp.arange(K)[:, None], (K, F))
    cols = jnp.clip(obs, 0, M - 1)
    onehot = onehot.at[rows, cols].max(valid)
    return onehot & m.mp_valid[None, :]


def covisibility_matrix(m: MapState) -> jnp.ndarray:
    """(K, K) int32 — number of shared map points between keyframes.

    One MXU matmul over the membership matrix; replaces the reference's
    incremental KeyFrame::UpdateConnections bookkeeping (keyframe.cc).
    Diagonal is zeroed.
    """
    memb = observation_mask(m).astype(jnp.float32)
    W = jnp.einsum("km,lm->kl", memb, memb,
                   preferred_element_type=jnp.float32).astype(jnp.int32)
    K = W.shape[0]
    return W * (1 - jnp.eye(K, dtype=jnp.int32))


def observation_triples(m: MapState, kf_window: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                   jnp.ndarray, jnp.ndarray]:
    """Flatten observations of a keyframe window into factor arrays.

    kf_window: (W,) int32 keyframe rows (may contain -1 padding).
    Returns (kf_idx (W*F,), mp_idx (W*F,), uv (W*F,2), octave (W*F,),
    valid (W*F,)) suitable for building a BAProblem — kf_idx indexes into
    the *window* (0..W-1), not the global table.
    """
    W = kf_window.shape[0]
    F = m.n_feat
    kfw = jnp.clip(kf_window, 0, m.max_kf - 1)
    win_ok = (kf_window >= 0) & m.kf_valid[kfw]
    obs = m.kf_obs_mp[kfw]          # (W,F)
    uv = m.kf_uv[kfw]               # (W,F,2)
    octv = m.kf_octave[kfw]         # (W,F)
    fval = m.kf_feat_valid[kfw]     # (W,F)
    valid = fval & (obs >= 0) & win_ok[:, None]
    valid = valid & m.mp_valid[jnp.clip(obs, 0, m.max_mp - 1)]
    kf_idx = jnp.broadcast_to(jnp.arange(W)[:, None], (W, F))
    return (kf_idx.reshape(-1).astype(jnp.int32),
            jnp.clip(obs, 0, m.max_mp - 1).reshape(-1),
            uv.reshape(-1, 2),
            octv.reshape(-1),
            valid.reshape(-1))
