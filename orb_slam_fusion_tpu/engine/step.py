"""Fused single-device tracking step — the per-frame hot path as ONE program.

The host tracker (tracker.py) composes projection, matching and pose LM as
separate jitted calls with host decisions in between; this module fuses the
whole per-frame compute into a single XLA program with no host round-trips:

    predict -> project map -> coarse match -> pose LM
            -> re-project -> fine match -> pose LM -> stats

This is the program bench.py times on the real chip, and the 'forward step'
the driver compile-checks via __graft_entry__.entry(). Reference equivalence:
one iteration of Tracking::Track's hot path (TrackWithMotionModel +
TrackLocalMap, tracking.cc:2163/2255) without the keyframe decision.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .. import cameras, lie
from ..frontend import matcher
from ..map.map_state import SCALE_FACTOR, predict_scale
from ..solver import pose_opt


class TrackStepResult(NamedTuple):
    pose: lie.SE3
    inliers: jnp.ndarray      # (M,) bool per map point
    n_inliers: jnp.ndarray    # () int32
    matched_feat: jnp.ndarray  # (M,) int32 feature row per map point or -1


@functools.partial(
    jax.jit,
    static_argnames=("cam_model", "img_h", "img_w", "far_threshold"),
)
def fused_track_step(
    mp_pos: jnp.ndarray,       # (M, 3)
    mp_desc: jnp.ndarray,      # (M, 8) uint32
    mp_valid: jnp.ndarray,     # (M,)
    prev_pose: lie.SE3,        # last optimized pose (optimizer anchor)
    pred_pose: lie.SE3,        # motion-model prediction (match centering)
    kp_uv: jnp.ndarray,        # (F, 2)
    kp_desc: jnp.ndarray,      # (F, 8)
    kp_valid: jnp.ndarray,     # (F,)
    kp_octave: jnp.ndarray,    # (F,)
    kp_inv_sigma2: jnp.ndarray,  # (F,) information per keypoint octave
    cam_params: jnp.ndarray,
    cam_model: str = cameras.PINHOLE,
    img_h: int = 480,
    img_w: int = 752,
    radius_coarse: float = 15.0,
    radius_fine: float = 9.0,
    far_threshold: float = 0.0,
) -> TrackStepResult:
    zeros_oct = jnp.zeros(mp_pos.shape[0], jnp.int32)

    def project(pose):
        pc = lie.se3_apply(pose, mp_pos)
        uv = cameras.project(cam_model, cam_params, pc)
        vis = (mp_valid & (pc[..., 2] > 0.05)
               & (uv[..., 0] >= 0) & (uv[..., 0] < img_w)
               & (uv[..., 1] >= 0) & (uv[..., 1] < img_h))
        if far_threshold > 0:
            # System.thFarPoints: skip far map points in projection search
            # (reference orb_matcher.cc:54, system.cc:217)
            vis = vis & (pc[..., 2] < far_threshold)
        return uv, vis

    F = kp_uv.shape[0]
    M = mp_pos.shape[0]

    def invert(midx, mok):
        # matches come out per MAP POINT (best keypoint each); the solve
        # runs per KEYPOINT (<= F residuals instead of M) — 8x fewer rows
        # per GN iteration at production shapes. One-hot masked max instead
        # of a scatter: ~8x faster on TPU (scatters serialize; the (M, F)
        # compare+reduce fuses onto the VPU)
        hit = mok[:, None] & (jnp.clip(midx, 0, F - 1)[:, None]
                              == jnp.arange(F, dtype=jnp.int32)[None, :])
        rows = jnp.where(hit, jnp.arange(M, dtype=jnp.int32)[:, None], -1)
        return jnp.max(rows, axis=0)

    # stage 1: coarse
    uv1, vis1 = project(pred_pose)
    midx, mok = matcher.search_by_projection(
        uv1, mp_desc, vis1, zeros_oct,
        kp_uv, kp_desc, kp_valid, kp_octave,
        radius=radius_coarse, max_dist=matcher.TH_HIGH, octave_window=16)
    mp_of_kp = invert(midx, mok)
    sel = jnp.clip(mp_of_kp, 0, M - 1)
    pose1, _, _ = pose_opt.pose_optimization(
        prev_pose, mp_pos[sel], kp_uv, kp_inv_sigma2, mp_of_kp >= 0,
        cam_params, cam_model=cam_model, rounds=1, iters_per_round=6)

    # stage 2: fine re-match at the refined pose
    uv2, vis2 = project(pose1)
    midx, mok = matcher.search_by_projection(
        uv2, mp_desc, vis2, zeros_oct,
        kp_uv, kp_desc, kp_valid, kp_octave,
        radius=radius_fine, max_dist=matcher.TH_HIGH, octave_window=16)
    mp_of_kp = invert(midx, mok)
    sel = jnp.clip(mp_of_kp, 0, M - 1)
    pose2, kp_inlier, n_in = pose_opt.pose_optimization(
        pose1, mp_pos[sel], kp_uv, kp_inv_sigma2, mp_of_kp >= 0,
        cam_params, cam_model=cam_model, rounds=2, iters_per_round=6)

    # scatter the per-keypoint verdicts back to map-point rows
    write = kp_inlier & (mp_of_kp >= 0)
    inlier_m = jnp.zeros((M,), bool).at[
        jnp.where(write, sel, M)].set(True, mode="drop")
    matched_feat = jnp.full((M,), -1, jnp.int32).at[
        jnp.where(write, sel, M)].set(
        jnp.arange(F, dtype=jnp.int32), mode="drop")
    return TrackStepResult(
        pose=pose2,
        inliers=inlier_m,
        n_inliers=n_in,
        matched_feat=matched_feat,
    )


class FrameUpdate(NamedTuple):
    """Everything the host needs back from one tracked frame."""

    pose: lie.SE3             # optimized Tcw
    velocity: lie.SE3         # pose o inv(prev frame pose)
    obs: jnp.ndarray          # (F,) feature -> map-point row or -1
    mp_visible: jnp.ndarray   # (M,) updated visibility counters
    mp_found: jnp.ndarray     # (M,) updated found counters
    counts: jnp.ndarray       # (2,) int32: [n_matches, n_inliers]


@functools.partial(
    jax.jit,
    static_argnames=("cam_model", "img_h", "img_w", "min_matches",
                     "use_pallas", "far_threshold", "num_levels"),
    donate_argnames=("mp_visible", "mp_found"),
)
def fused_frame_update(
    mp_pos: jnp.ndarray,        # (M, 3)
    mp_desc: jnp.ndarray,       # (M, 8) uint32
    mp_valid: jnp.ndarray,      # (M,)
    mp_visible: jnp.ndarray,    # (M,) int32
    mp_found: jnp.ndarray,      # (M,) int32
    prev_pose: lie.SE3,         # previous frame's OPTIMIZED pose (anchor)
    pred_pose: lie.SE3,         # motion-model prediction (match centering)
    kp_uv: jnp.ndarray,         # (F, 2)
    kp_desc: jnp.ndarray,       # (F, 8)
    kp_valid: jnp.ndarray,      # (F,)
    kp_octave: jnp.ndarray,     # (F,)
    inv_sigma2_table: jnp.ndarray,  # (L,) per-octave information
    cam_params: jnp.ndarray,
    mp_normal: jnp.ndarray | None = None,    # (M, 3) mean viewing direction
    mp_min_dist: jnp.ndarray | None = None,  # (M,) scale-invariance band
    mp_max_dist: jnp.ndarray | None = None,  # (M,)
    cam_model: str = cameras.PINHOLE,
    img_h: int = 480,
    img_w: int = 752,
    radius_coarse: float = 15.0,
    radius_fine: float = 9.0,
    min_matches: int = 20,
    use_pallas: bool = False,
    far_threshold: float = 0.0,
    num_levels: int = 8,
) -> FrameUpdate:
    """One tracked frame as ONE device program (zero host round-trips).

    The whole of Tracking::TrackWithMotionModel + TrackLocalMap
    (tracking.cc:2163/2255) incl. the widened-window retry and the
    mnFound/mnVisible bookkeeping. With `use_pallas` (real TPU) the matching
    stages run the fused Pallas kernel (frontend/pallas_match.py) that never
    materializes the (M, F) distance matrix in HBM; the XLA fallback
    computes the Hamming matrix once and shares it across the coarse /
    widened / fine stages (only the spatial masks differ).

    With mp_normal/mp_min_dist/mp_max_dist the full Frame::isInFrustum gate
    set runs per point (reference frame.cc): distance inside
    [0.8 min, 1.2 max], viewing angle within 60 deg of the mean normal, and
    the PredictScale octave window |kp_octave - predicted| <= 1 with the
    search radius scaled by the predicted level (orb_matcher.cc:42+).
    """
    F = kp_uv.shape[0]
    M = mp_pos.shape[0]
    scale_gates = mp_min_dist is not None
    inv_s2 = inv_sigma2_table[
        jnp.clip(kp_octave, 0, inv_sigma2_table.shape[0] - 1)]
    if not use_pallas:
        dist = matcher.hamming_distance(mp_desc, kp_desc)    # (M, F)

    def project(pose):
        pc = lie.se3_apply(pose, mp_pos)
        uv = cameras.project(cam_model, cam_params, pc)
        vis = (mp_valid & (pc[..., 2] > 0.05)
               & (uv[..., 0] >= 0) & (uv[..., 0] < img_w)
               & (uv[..., 1] >= 0) & (uv[..., 1] < img_h))
        if far_threshold > 0:
            # System.thFarPoints: skip far map points in projection search
            # (reference orb_matcher.cc:54, system.cc:217)
            vis = vis & (pc[..., 2] < far_threshold)
        if not scale_gates:
            return uv, vis, None
        # Frame::isInFrustum distance + view-angle gates and PredictScale
        d = jnp.linalg.norm(pc, axis=-1)
        vis = vis & (d >= 0.8 * mp_min_dist) & (d <= 1.2 * mp_max_dist)
        # viewing direction in world: R_cw^T x_c
        vdir = jnp.einsum("ji,mj->mi", pose.R, pc)
        cosv = jnp.sum(vdir * mp_normal, axis=-1) / jnp.maximum(d, 1e-9)
        vis = vis & (cosv > 0.5)
        pred_oct = predict_scale(d, mp_max_dist, num_levels)
        return uv, vis, pred_oct

    def match_at(uv_pred, vis, radius, pred_oct):
        if scale_gates:
            # search radius scales with the predicted level (reference
            # orb_matcher.cc: th * scaleFactor[nPredictedLevel])
            r_pt = radius * SCALE_FACTOR ** pred_oct.astype(jnp.float32)
        else:
            r_pt = jnp.full((M,), radius, jnp.float32)
        if use_pallas:
            from ..frontend.pallas_match import masked_match_pallas
            idx, best, second = masked_match_pallas(
                uv_pred, mp_desc, vis, r_pt, kp_uv, kp_desc, kp_valid,
                mp_octave=pred_oct if scale_gates else None,
                kp_octave=kp_octave if scale_gates else None)
        else:
            d2 = jnp.sum((uv_pred[:, None, :] - kp_uv[None, :, :]) ** 2,
                         axis=-1)
            mask = (d2 <= (r_pt[:, None] ** 2)) & vis[:, None] \
                & kp_valid[None, :]
            if scale_gates:
                mask = mask & (jnp.abs(pred_oct[:, None] - kp_octave[None, :])
                               <= 1)
            idx, best, second = matcher.masked_min2(dist, mask)
        ok = ((best <= matcher.TH_HIGH)
              & (best.astype(jnp.float32)
                 <= matcher.RATIO * second.astype(jnp.float32)))
        return jnp.where(ok, idx, -1).astype(jnp.int32), ok

    # ---- stage 1: coarse match at the prediction, widened retry on famine
    uv1, vis1, oct1 = project(pred_pose)
    midx0, mok0 = match_at(uv1, vis1, radius_coarse, oct1)
    n1 = jnp.sum(mok0.astype(jnp.int32))
    midx, mok = jax.lax.cond(
        n1 < min_matches,
        lambda: match_at(uv1, vis1, 2.0 * radius_coarse, oct1),
        lambda: (midx0, mok0))
    n_match = jnp.sum(mok.astype(jnp.int32))

    def invert(midx, mok):
        # per-map-point matches -> per-keypoint correspondence table; the
        # pose solves then evaluate F residual rows instead of M (the map
        # is ~8x larger than a frame at production shapes, and the GN
        # chain is the dominant per-frame cost). One-hot masked max instead
        # of a scatter (TPU scatters serialize; this fuses onto the VPU)
        hit = mok[:, None] & (jnp.clip(midx, 0, F - 1)[:, None]
                              == jnp.arange(F, dtype=jnp.int32)[None, :])
        rows = jnp.where(hit, jnp.arange(M, dtype=jnp.int32)[:, None], -1)
        return jnp.max(rows, axis=0)

    mp_of_kp = invert(midx, mok)
    sel = jnp.clip(mp_of_kp, 0, M - 1)
    pose1, _, _ = pose_opt.pose_optimization(
        pred_pose, mp_pos[sel], kp_uv, inv_s2, mp_of_kp >= 0,
        cam_params, cam_model=cam_model, rounds=1, iters_per_round=6)

    # ---- stage 2: fine re-match at the refined pose, anchored re-solve
    uv2, vis2, oct2 = project(pose1)
    midx, mok = match_at(uv2, vis2, radius_fine, oct2)
    mp_of_kp = invert(midx, mok)
    sel = jnp.clip(mp_of_kp, 0, M - 1)
    pose2, kp_inlier, n_in = pose_opt.pose_optimization(
        prev_pose, mp_pos[sel], kp_uv, inv_s2, mp_of_kp >= 0,
        cam_params, cam_model=cam_model, rounds=2, iters_per_round=6)

    # ---- bookkeeping on device
    write = kp_inlier & (mp_of_kp >= 0)
    obs = jnp.where(write, mp_of_kp, -1)
    mp_visible = mp_visible + vis2.astype(jnp.int32)
    mp_found = mp_found.at[jnp.where(write, sel, M)].add(1, mode="drop")
    velocity = lie.se3_compose(pose2, lie.se3_inverse(prev_pose))

    return FrameUpdate(
        pose=pose2,
        velocity=velocity,
        obs=obs,
        mp_visible=mp_visible,
        mp_found=mp_found,
        counts=jnp.stack([n_match, n_in]).astype(jnp.int32),
    )
