"""Fused keyframe-insertion mapping step — one device program per keyframe.

Reference: the LocalMapping thread's per-keyframe work (localmapping.cc):
ProcessNewKeyFrame (:234) + CreateNewMapPoints (:312) + SearchInNeighbors
fuse (:619) + MapPointCulling (:276), here compiled into a single XLA
program. The host supplies only the previous-keyframe window (small int32
array); everything else — matching, triangulation, observation
registration, duplicate fusion, culling — happens on device with static
shapes, so a keyframe insert costs ONE dispatch instead of dozens of
round-trips through the remote-device tunnel.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .. import cameras, lie
from ..frontend import matcher
from ..map import map_state as ms


def _triangulate_pair(pose_a: lie.SE3, pose_b: lie.SE3, rays_a, rays_b,
                      pair_valid, min_parallax_cos: float = 0.9998,
                      far_threshold: float = 0.0,
                      sigma2_a=None, sigma2_b=None, inv_f: float = 1 / 460.0):
    """Two-view mid-point triangulation + acceptance checks (world coords).

    Reference: LocalMapping::CreateNewMapPoints's parallax / positive-depth
    / reprojection gates. Returns (points_w (N,3), good (N,)).

    sigma2_a/sigma2_b: per-match octave variance 1.2^(2*octave) of the
    observation in each view — the acceptance gates scale with it
    (reference: CheckDistEpipolarLine 3.84*sigma2 of the second view,
    orb_matcher.cc:817+; reprojection 5.991*sigma2 per view,
    localmapping.cc:400+). None = octave-0 (fixed-threshold legacy
    behavior). The round-2 revert of these gates treated a symptom: the
    "VI-merge destabilization" they appeared to cause was the stale
    viewing-normal bug at gauge rotations, fixed in round 3.
    """
    one = jnp.ones_like(rays_a[..., 0])
    s2a = one if sigma2_a is None else sigma2_a
    s2b = one if sigma2_b is None else sigma2_b
    T_ba = lie.se3_compose(pose_b, lie.se3_inverse(pose_a))

    # epipolar coplanarity gate BEFORE triangulation (reference:
    # SearchForTriangulation only accepts matches near the epipolar line,
    # orb_matcher.cc:817+ CheckDistEpipolarLine) — descriptor-only mutual
    # matches between weakly-overlapping covisible keyframes need this;
    # the post-triangulation reprojection checks alone cannot reject a
    # wrong match that happens to be epipolar-consistent in one view
    E = lie.hat(T_ba.t) @ T_ba.R                    # essential matrix
    line = jnp.einsum("ij,nj->ni", E, rays_a)       # epipolar line in b
    ep = jnp.sum(rays_b * line, axis=-1)
    sampson = ep * ep / jnp.maximum(
        line[..., 0] ** 2 + line[..., 1] ** 2, 1e-12)
    # 3.84 chi2(1dof) x sigma2 of the SECOND view's octave, in ray units
    pair_valid = pair_valid & (sampson < 3.84 * s2b * inv_f * inv_f)

    X_a = cameras.triangulate(rays_a, rays_b, T_ba.R, T_ba.t)
    X_b = lie.se3_apply(T_ba, X_a)
    z_a, z_b = X_a[..., 2], X_b[..., 2]

    C_b_in_a = lie.se3_apply(lie.se3_inverse(T_ba), jnp.zeros_like(X_a))
    v1 = X_a
    v2 = X_a - C_b_in_a
    cosp = jnp.sum(v1 * v2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1), 1e-12)

    e_a = jnp.sum((X_a[..., :2] / jnp.maximum(z_a[..., None], 1e-9)
                   - rays_a[..., :2]) ** 2, axis=-1)
    e_b = jnp.sum((X_b[..., :2] / jnp.maximum(z_b[..., None], 1e-9)
                   - rays_b[..., :2]) ** 2, axis=-1)
    # 5.991 chi2(2dof) x per-view octave sigma2 (localmapping.cc:400+)
    th_a = 5.991 * s2a * inv_f * inv_f
    th_b = 5.991 * s2b * inv_f * inv_f
    good = (pair_valid & (z_a > 0.05) & (z_b > 0.05)
            & (cosp < min_parallax_cos) & (e_a < th_a) & (e_b < th_b))
    if far_threshold > 0:
        # System.thFarPoints: discard far triangulations (reference
        # localmapping.cc:587)
        good = good & (z_a < far_threshold) & (z_b < far_threshold)
    X_w = lie.se3_apply(lie.se3_inverse(pose_a), X_a)
    return X_w, good


@functools.partial(jax.jit, static_argnames=("k",))
def top_covisible(m: ms.MapState, obs: jnp.ndarray, exclude_lo,
                  k: int = 3) -> jnp.ndarray:
    """Top-k covisible keyframes of the incoming frame (reference:
    GetBestCovisibilityKeyFrames feeding CreateNewMapPoints,
    localmapping.cc:317-329). `obs` is the frame's feature->map-point
    binding from tracking; covisibility = shared-point count against every
    keyframe row, one masked gather+reduce. Rows >= exclude_lo (the
    temporal tail, handled separately) and rows with no sharing are
    excluded; returns (k,) rows, -1 padded. Stays on device — no sync."""
    mask = jnp.zeros(m.max_mp + 1, bool).at[
        jnp.where(obs >= 0, obs, m.max_mp)].set(True, mode="drop")[:m.max_mp]
    rows = jnp.clip(m.kf_obs_mp, 0, m.max_mp - 1)          # (K, F)
    shares = jnp.sum(
        mask[rows] & (m.kf_obs_mp >= 0) & m.kf_feat_valid, axis=1)
    kfa = jnp.arange(m.max_kf)
    ok = m.kf_valid & (kfa < exclude_lo)
    shares = jnp.where(ok, shares, -1)
    best, ids = jax.lax.top_k(shares, k)
    return jnp.where(best > 0, ids, -1).astype(jnp.int32)


class MappingResult(NamedTuple):
    map: ms.MapState
    # (2,) int32: [new keyframe row or -1 (table full), tracked-point count
    # of the new keyframe] — one small host transfer covers both
    stats: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=("cam_model", "img_h", "img_w", "n_prev",
                     "culling_found_ratio", "far_threshold", "num_levels"),
)
def mapping_step(
    m: ms.MapState,
    pose: lie.SE3,             # current frame Tcw
    timestamp,                 # () float
    kp_uv: jnp.ndarray,        # (F, 2)
    kp_desc: jnp.ndarray,      # (F, 8)
    kp_octave: jnp.ndarray,    # (F,)
    kp_valid: jnp.ndarray,     # (F,)
    obs: jnp.ndarray,          # (F,) feature -> map-point binding from tracking
    prev_ids: jnp.ndarray,     # (P,) int32 recent keyframe rows, -1 padded
    cam_params: jnp.ndarray,
    cam_model: str = cameras.PINHOLE,
    img_h: int = 480,
    img_w: int = 752,
    n_prev: int = 3,
    culling_found_ratio: float = 0.25,
    far_threshold: float = 0.0,
    num_levels: int = 8,
) -> MappingResult:
    """Insert a keyframe and do all per-keyframe mapping work on device."""
    F = kp_uv.shape[0]

    # ---- 1. keyframe insert (ProcessNewKeyFrame) ------------------------
    m, kf_id = ms.add_keyframe(
        m, pose, timestamp, kp_uv, kp_desc, kp_octave, kp_valid, obs)
    kf_ok = kf_id >= 0
    kf_c = jnp.clip(kf_id, 0, m.max_kf - 1)

    # ---- 2. new points: triangulate unmatched features against each of
    # the n_prev most recent keyframes (CreateNewMapPoints; recency is the
    # covisibility proxy) ------------------------------------------------
    rays_cur = cameras.unproject(cam_model, cam_params, kp_uv)
    cam_center = lie.se3_apply(lie.se3_inverse(pose), jnp.zeros(3))
    cur_obs = obs

    for p in range(n_prev):
        prev = prev_ids[p]
        prev_ok = (prev >= 0) & kf_ok
        prev_c = jnp.clip(prev, 0, m.max_kf - 1)

        prev_uv = m.kf_uv[prev_c]
        prev_desc = m.kf_desc[prev_c]
        prev_un = (m.kf_feat_valid[prev_c] & (m.kf_obs_mp[prev_c] < 0)
                   & prev_ok)
        cur_un = kp_valid & (cur_obs < 0)

        pidx, pok = matcher.match_mutual(
            prev_desc, prev_un, kp_desc, cur_un, max_dist=matcher.TH_LOW)
        pidx_c = jnp.clip(pidx, 0, F - 1)

        rays_prev = cameras.unproject(cam_model, cam_params, prev_uv)
        prev_pose = lie.SE3(m.kf_pose.R[prev_c], m.kf_pose.t[prev_c])
        s2_prev = ms.SCALE_FACTOR ** (
            2.0 * jnp.clip(m.kf_octave[prev_c], 0, num_levels - 1
                           ).astype(jnp.float32))
        s2_cur = ms.SCALE_FACTOR ** (
            2.0 * jnp.clip(kp_octave[pidx_c], 0, num_levels - 1
                           ).astype(jnp.float32))
        X_w, good = _triangulate_pair(
            prev_pose, pose, rays_prev, rays_cur[pidx_c], pok,
            far_threshold=far_threshold,
            sigma2_a=s2_prev, sigma2_b=s2_cur,
            inv_f=1.0 / cam_params[0])
        good = good & prev_ok

        normals = X_w - cam_center
        dist_new = jnp.linalg.norm(normals, axis=-1)
        normals = normals / jnp.maximum(dist_new[:, None], 1e-9)
        min_d, max_d = ms.scale_invariance_band(
            dist_new, kp_octave[pidx_c], num_levels)
        m, new_ids = ms.add_map_points(
            m, X_w, kp_desc[pidx_c], normals, kf_c, kf_c, good,
            min_dist=min_d, max_dist=max_d)

        # register observations in both keyframes (out-of-bounds drop for
        # masked rows avoids duplicate-scatter hazards)
        write = new_ids >= 0
        kfo = m.kf_obs_mp
        prev_rows = jnp.arange(F, dtype=jnp.int32)
        row_prev = kfo[prev_c].at[
            jnp.where(write, prev_rows, F)].set(new_ids, mode="drop")
        kfo = kfo.at[jnp.where(prev_ok, prev_c, m.max_kf)].set(
            row_prev, mode="drop")
        row_cur = kfo[kf_c].at[
            jnp.where(write & (pidx >= 0), pidx_c, F)].set(
            new_ids, mode="drop")
        kfo = kfo.at[jnp.where(kf_ok, kf_c, m.max_kf)].set(
            row_cur, mode="drop")
        m = m._replace(kf_obs_mp=kfo)
        cur_obs = m.kf_obs_mp[kf_c]

    # ---- 3. duplicate fusion in the new keyframe (SearchInNeighbors):
    # where a projected map point matches a feature already bound to a
    # DIFFERENT point, the older (smaller-row) point absorbs the newer ----
    pc = lie.se3_apply(pose, m.mp_pos)
    uv_pred = cameras.project(cam_model, cam_params, pc)
    vis = (m.mp_valid & (pc[..., 2] > 0.05)
           & (uv_pred[..., 0] >= 0) & (uv_pred[..., 0] < img_w)
           & (uv_pred[..., 1] >= 0) & (uv_pred[..., 1] < img_h))
    # scale gates (reference Fuse, orb_matcher.cc:1042: distance band,
    # view angle, predicted-level window, level-scaled radius)
    dist_all = jnp.linalg.norm(pc, axis=-1)
    vis = vis & (dist_all >= 0.8 * m.mp_min_dist) \
        & (dist_all <= 1.2 * m.mp_max_dist)
    pred_oct = ms.predict_scale(dist_all, m.mp_max_dist, num_levels)
    midx, mok = matcher.search_by_projection(
        uv_pred, m.mp_desc, vis, pred_oct,
        kp_uv, kp_desc, kp_valid, kp_octave,
        radius=4.0 * ms.SCALE_FACTOR ** pred_oct.astype(jnp.float32),
        max_dist=matcher.TH_LOW, octave_window=1)
    midx_c = jnp.clip(midx, 0, F - 1)
    bound = cur_obs[midx_c]
    mp_rows = jnp.arange(m.max_mp, dtype=jnp.int32)
    dup = mok & kf_ok & (bound >= 0) & (bound != mp_rows)
    keep = jnp.where(bound < mp_rows, bound, mp_rows)
    kill = jnp.where(bound < mp_rows, mp_rows, bound)
    replace = jnp.arange(m.max_mp, dtype=jnp.int32)
    replace = replace.at[jnp.where(dup, kill, m.max_mp)].set(
        keep, mode="drop")
    kfo = m.kf_obs_mp
    kfo = jnp.where(kfo >= 0, replace[jnp.clip(kfo, 0, None)], kfo)
    killed = jnp.zeros(m.max_mp, bool).at[
        jnp.where(dup, kill, m.max_mp)].set(True, mode="drop")
    m = m._replace(kf_obs_mp=kfo, mp_valid=m.mp_valid & ~killed)

    # ---- 4. map-point culling (MapPointCulling): low found/visible ratio
    ratio = m.mp_found / jnp.maximum(m.mp_visible, 1)
    bad = (m.mp_visible >= 8) & (ratio < culling_found_ratio)
    m = m._replace(mp_valid=m.mp_valid & ~bad)

    # ---- 4.5 distinctive-descriptor refresh (reference: MapPoint::
    # ComputeDistinctiveDescriptors, mappoint.h:139 / mappoint.cc — the
    # representative descriptor is the observation with minimum MEDIAN
    # Hamming distance to all other observations). Recomputed here for
    # every point observed by the NEW keyframe, over its observations in
    # the recent window (prev_ids + this keyframe): with viewpoint-
    # dependent appearance a descriptor frozen at triangulation stops
    # matching once the camera swings around the structure. Medoid over
    # the recent window tracks the CURRENT appearance, which is also what
    # the following frames will see.
    cur_obs = m.kf_obs_mp[kf_c]
    # refresh window = TEMPORAL chain + this keyframe (prev_ids leads with
    # the temporal neighbours; covisible extras are deliberately excluded:
    # an old covisible keyframe stores the point's OLD appearance, and a
    # medoid over mixed epochs can elect a stale representative — measured
    # to HALVE matched observations on the orbit sim vs recency-only)
    n_temp = min(3, n_prev)
    win = jnp.concatenate([prev_ids[:n_temp], kf_c[None]])
    Wn = n_temp + 1
    win_c = jnp.clip(win, 0, m.max_kf - 1)
    win_valid = (win >= 0) & m.kf_valid[win_c]                  # (W,)
    obs_win = m.kf_obs_mp[win_c]                                # (W, F)
    # per window KF: inverse map point-row -> feature index
    w_rows = jnp.broadcast_to(jnp.arange(Wn)[:, None], (Wn, F))
    inv = jnp.full((Wn, m.max_mp + 1), -1, jnp.int32)
    inv = inv.at[w_rows, jnp.where(obs_win >= 0, obs_win, m.max_mp)].max(
        jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[None, :], (Wn, F)),
        mode="drop")
    rows_cur_pt = jnp.clip(cur_obs, 0, m.max_mp - 1)            # (F,)
    fidx_w = inv[:, :-1][:, rows_cur_pt]                        # (W, F)
    has_obs = (fidx_w >= 0) & win_valid[:, None] \
        & (cur_obs >= 0)[None, :]                               # (W, F)
    desc_w = m.kf_desc[win_c[:, None],
                       jnp.clip(fidx_w, 0, F - 1)]              # (W, F, 8)
    # pairwise Hamming between the observations of each point: (F, W, W)
    x = jnp.bitwise_xor(desc_w[:, None], desc_w[None, :])       # (W,W,F,8)
    pd = jnp.sum(jax.lax.population_count(x), axis=-1)          # (W, W, F)
    pd = jnp.transpose(pd, (2, 0, 1)).astype(jnp.int32)         # (F, W, W)
    pair_ok = has_obs.T[:, :, None] & has_obs.T[:, None, :]
    BIGD = jnp.int32(1 << 12)
    pd = jnp.where(pair_ok, pd, BIGD)
    srt = jnp.sort(pd, axis=-1)                                 # (F, W, W)
    cnt = jnp.sum(has_obs.T, axis=-1)                           # (F,)
    med_pos = jnp.clip((cnt[:, None] - 1) // 2,
                       0, Wn - 1)                               # incl. self 0
    med = jnp.take_along_axis(
        srt, jnp.broadcast_to(med_pos[:, :, None], (F, Wn, 1)),
        axis=-1)[..., 0]                                        # (F, W)
    med = jnp.where(has_obs.T, med, BIGD)
    best_w = jnp.argmin(med, axis=-1)                           # (F,)
    rep = desc_w[best_w, jnp.arange(F)]                         # (F, 8)
    # hysteresis: only replace a representative that has gone STALE
    # against the newest observation (> ~3x the per-observation descriptor
    # noise). A per-keyframe medoid over the small recent window is
    # otherwise high-variance — reps churn every keyframe and measurably
    # destabilize tracking on marginal segments — while the reference's
    # medoid over ALL observations is naturally stable. With persistent
    # appearance this gate never fires (round-2 behavior, bit-exact);
    # under genuine viewpoint-driven drift the rep follows.
    d_rep = jnp.sum(jax.lax.population_count(
        jnp.bitwise_xor(m.mp_desc[rows_cur_pt], kp_desc)), axis=-1)
    do_write = (cur_obs >= 0) & (cnt >= 2) & kf_ok & (d_rep > 24)
    from ..utils import masked_set as _mset
    m = m._replace(mp_desc=_mset(m.mp_desc, rows_cur_pt, rep, do_write))

    # ---- 5. normal + scale-band refresh (MapPoint::UpdateNormalAndDepth,
    # mappoint.cc): the mean unit viewing direction over ALL observing
    # keyframes, computed for the whole map as two matmuls over the
    # membership matrix — sum_k w_km (x_m - C_k) with w = memb / dist ------
    memb = ms.observation_mask(m).astype(jnp.float32)          # (K, Mmp)
    C_all = -jnp.einsum("kji,kj->ki", m.kf_pose.R, m.kf_pose.t)  # (K, 3)
    x2 = jnp.sum(m.mp_pos ** 2, axis=-1)[None, :]
    c2 = jnp.sum(C_all ** 2, axis=-1)[:, None]
    xc = jnp.einsum("ki,mi->km", C_all, m.mp_pos,
                    preferred_element_type=jnp.float32)
    d_km = jnp.sqrt(jnp.maximum(x2 + c2 - 2.0 * xc, 1e-12))
    w_km = memb / d_km
    cnt = jnp.sum(memb, axis=0)                                 # (Mmp,)
    sum_w = jnp.sum(w_km, axis=0)
    dir_sum = m.mp_pos * sum_w[:, None] - jnp.einsum(
        "km,ki->mi", w_km, C_all, preferred_element_type=jnp.float32)
    nn = jnp.linalg.norm(dir_sum, axis=-1, keepdims=True)
    new_normal = jnp.where((cnt > 0)[:, None],
                           dir_sum / jnp.maximum(nn, 1e-9), m.mp_normal)
    # scale band refreshed from the NEW keyframe's observations (freshest
    # octave evidence; the reference refreshes whenever observations change)
    obs_cur = m.kf_obs_mp[kf_c]
    rows = jnp.clip(obs_cur, 0, m.max_mp - 1)
    d_f = jnp.linalg.norm(m.mp_pos[rows] - cam_center[None, :], axis=-1)
    min_f, max_f = ms.scale_invariance_band(d_f, kp_octave, num_levels)
    write_band = (obs_cur >= 0) & kp_valid & kf_ok
    from ..utils import masked_set
    m = m._replace(
        mp_normal=new_normal,
        mp_min_dist=masked_set(m.mp_min_dist, rows, min_f, write_band),
        mp_max_dist=masked_set(m.mp_max_dist, rows, max_f, write_band),
    )

    n_tracked = jnp.sum((m.kf_obs_mp[kf_c] >= 0).astype(jnp.int32))
    return MappingResult(
        map=m, stats=jnp.stack([kf_id, n_tracked]).astype(jnp.int32))
