"""Multi-map atlas: archived maps + map merging.

Replaces the reference's Atlas (src/map/atlas.cc — multi-map manager created
on tracking loss, maps re-joined by place recognition) and the map-merge
pipeline (LoopClosing::MergeLocal, loopclosing.cc:1116). The SoA layout
makes the merge itself trivial compared to the reference's pointer-graph
surgery: transform the newer map's geometry by the measured Sim3, then
concatenate tables with index offsets.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .. import lie
from . import map_state as ms


def transform_map(m: ms.MapState, S: lie.Sim3) -> ms.MapState:
    """Apply a world-frame Sim3 to every pose and point: x' = S(x).

    Poses transform as R' = R R_s^T, t' = s t - R R_s^T t_s ... derived:
    x_c = R x + t with x = S^-1(x') gives the rigid-with-scale fold used by
    loop correction: R'_cw = R_cw R_S^T, t'_cw = s_S t_cw - R'_cw t_S is
    wrong in general; we use the exact composition via camera centers:
    C' = S(C), R'_cw = R_cw R_S^T, t'_cw = -R'_cw C'.
    """
    # camera centers
    C = -jnp.einsum("kji,kj->ki", m.kf_pose.R, m.kf_pose.t)
    C2 = lie.sim3_apply(S, C)
    R2 = m.kf_pose.R @ S.R.T
    t2 = -jnp.einsum("kij,kj->ki", R2, C2)
    pts2 = lie.sim3_apply(S, m.mp_pos)
    # viewing normals are world DIRECTIONS: rotate (no translation/scale),
    # or the view-angle gate rejects every welded point after a large-
    # rotation merge (same failure mode as the IMU-init gauge rotation)
    nrm2 = jnp.einsum("ij,kj->ki", S.R, m.mp_normal)
    return m._replace(
        kf_pose=lie.SE3(R2, t2),
        mp_pos=jnp.where(m.mp_valid[:, None], pts2, m.mp_pos),
        mp_normal=jnp.where(m.mp_valid[:, None], nrm2, m.mp_normal),
        # the scale-invariance band is a metric distance — rescale with S
        mp_min_dist=m.mp_min_dist * S.s,
        mp_max_dist=jnp.where(m.mp_max_dist < 1e8,
                              m.mp_max_dist * S.s, m.mp_max_dist),
    )


def merge_maps(m_old: ms.MapState, m_new: ms.MapState,
               S_new_to_old: lie.Sim3
               ) -> Tuple[Optional[ms.MapState], int, int]:
    """Weld m_new into m_old's frame and concatenate.

    S_new_to_old maps new-map world coordinates into old-map world
    coordinates. Returns (merged map, kf_offset, mp_offset) — the offsets
    added to the new map's keyframe/point rows — or (None, 0, 0) if the old
    map lacks capacity.
    """
    n_kf_old = int(m_old.n_kf)
    n_mp_old = int(m_old.n_mp)
    n_kf_new = int(m_new.n_kf)
    n_mp_new = int(m_new.n_mp)
    if (n_kf_old + n_kf_new > m_old.max_kf
            or n_mp_old + n_mp_new > m_old.max_mp):
        return None, 0, 0

    m_new_t = transform_map(m_new, S_new_to_old)

    kf_off = n_kf_old
    mp_off = n_mp_old
    sl_kf = slice(kf_off, kf_off + n_kf_new)
    sl_mp = slice(mp_off, mp_off + n_mp_new)

    obs_new = m_new_t.kf_obs_mp[:n_kf_new]
    obs_new = jnp.where(obs_new >= 0, obs_new + mp_off, obs_new)

    merged = m_old._replace(
        kf_pose=lie.SE3(
            m_old.kf_pose.R.at[sl_kf].set(m_new_t.kf_pose.R[:n_kf_new]),
            m_old.kf_pose.t.at[sl_kf].set(m_new_t.kf_pose.t[:n_kf_new]),
        ),
        kf_valid=m_old.kf_valid.at[sl_kf].set(m_new_t.kf_valid[:n_kf_new]),
        kf_timestamp=m_old.kf_timestamp.at[sl_kf].set(
            m_new_t.kf_timestamp[:n_kf_new]),
        kf_uv=m_old.kf_uv.at[sl_kf].set(m_new_t.kf_uv[:n_kf_new]),
        kf_desc=m_old.kf_desc.at[sl_kf].set(m_new_t.kf_desc[:n_kf_new]),
        kf_octave=m_old.kf_octave.at[sl_kf].set(
            m_new_t.kf_octave[:n_kf_new]),
        kf_feat_valid=m_old.kf_feat_valid.at[sl_kf].set(
            m_new_t.kf_feat_valid[:n_kf_new]),
        kf_obs_mp=m_old.kf_obs_mp.at[sl_kf].set(obs_new),
        mp_pos=m_old.mp_pos.at[sl_mp].set(m_new_t.mp_pos[:n_mp_new]),
        mp_desc=m_old.mp_desc.at[sl_mp].set(m_new_t.mp_desc[:n_mp_new]),
        mp_valid=m_old.mp_valid.at[sl_mp].set(m_new_t.mp_valid[:n_mp_new]),
        mp_normal=m_old.mp_normal.at[sl_mp].set(
            m_new_t.mp_normal[:n_mp_new]),
        mp_ref_kf=m_old.mp_ref_kf.at[sl_mp].set(
            m_new_t.mp_ref_kf[:n_mp_new] + kf_off),
        mp_visible=m_old.mp_visible.at[sl_mp].set(
            m_new_t.mp_visible[:n_mp_new]),
        mp_found=m_old.mp_found.at[sl_mp].set(m_new_t.mp_found[:n_mp_new]),
        mp_first_kf=m_old.mp_first_kf.at[sl_mp].set(
            m_new_t.mp_first_kf[:n_mp_new] + kf_off),
        mp_min_dist=m_old.mp_min_dist.at[sl_mp].set(
            m_new_t.mp_min_dist[:n_mp_new]),
        mp_max_dist=m_old.mp_max_dist.at[sl_mp].set(
            m_new_t.mp_max_dist[:n_mp_new]),
        n_kf=jnp.int32(n_kf_old + n_kf_new),
        n_mp=jnp.int32(n_mp_old + n_mp_new),
    )
    return merged, kf_off, mp_off


class ArchivedMap(NamedTuple):
    map: ms.MapState
    bow: jnp.ndarray        # (max_kf, V) keyframe BoW matrix
    present: jnp.ndarray    # (max_kf,)
    # per-keyframe inertial side tables of the archived session (dict with
    # kf_vel/kf_bias/kf_pre/kf_time/kf_raw lists), None for visual-only maps
    # — kept so a later merge restores the full inertial chain (reference:
    # archived Maps keep their KFs' mpImuPreintegrated, atlas serialization)
    inertial: Optional[dict] = None


class Atlas:
    """Container for non-active maps (reference: Atlas, atlas.h:79-140)."""

    def __init__(self):
        self.archived: List[ArchivedMap] = []

    def archive(self, m: ms.MapState, bow, present, min_kfs: int = 5,
                inertial: Optional[dict] = None) -> bool:
        if int(m.n_kf) < min_kfs:
            return False
        self.archived.append(ArchivedMap(m, bow, present, inertial))
        return True

    def __len__(self):
        return len(self.archived)
