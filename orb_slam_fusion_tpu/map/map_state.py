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
        n_kf=jnp.int32(0),
        n_mp=jnp.int32(0),
    )


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
                   valid_new) -> Tuple[MapState, jnp.ndarray]:
    """Append a batch of map points compacted into free slots.

    pos (B,3), desc (B,8), normal (B,3), valid_new (B,) — only entries with
    valid_new are appended (compaction via prefix sums keeps this a single
    scatter, no host sync). Returns (map, assigned ids (B,) or -1).
    """
    from ..utils import masked_set

    B = pos.shape[0]
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
        n_mp=m.n_mp + jnp.sum(ok.astype(jnp.int32)),
    )
    return m, jnp.where(ok, slots, -1).astype(jnp.int32)


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
