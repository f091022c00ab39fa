"""Rectified stereo matching.

Replaces Frame::ComputeStereoMatches (src/map/frame.cc:828): for each left
keypoint find the best right-image keypoint on the same rectified row within
the disparity range. The reference loops rows with per-feature candidate
lists + SAD subpixel refinement; the TPU formulation is one masked dense
Hamming match: row-band mask ∧ disparity-window mask ∧ octave compatibility,
then argmin — identical association semantics, no loops.

`subpixel_refine` adds the reference's ±5 px SAD sweep with parabola fit
(frame.cc:940+) as one batched gather+reduce program, and `stereo_match`
applies the reference's median-distance outlier filter (frame.cc:1008+).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .extractor import Features
from .matcher import TH_HIGH, hamming_distance_rows, match_masked


def stereo_match(
    featsL: Features,
    featsR: Features,
    row_tol: float = 2.0,
    min_disp: float = 0.1,
    max_disp: float = 128.0,
    max_dist: int = TH_HIGH,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Match left features to right features along rectified rows.

    Returns (u_right (N,), has_stereo (N,)): the right-image u coordinate
    per left feature, -1 where unmatched.
    """
    uvL, uvR = featsL.uv, featsR.uv
    dv = jnp.abs(uvL[:, None, 1] - uvR[None, :, 1])
    # scale tolerance with octave (higher pyramid levels are coarser)
    tolL = row_tol * (1.2 ** featsL.octave.astype(jnp.float32))
    row_ok = dv <= tolL[:, None]
    disp = uvL[:, None, 0] - uvR[None, :, 0]
    disp_ok = (disp >= min_disp) & (disp <= max_disp)
    oct_ok = jnp.abs(featsL.octave[:, None] - featsR.octave[None, :]) <= 1
    mask = (row_ok & disp_ok & oct_ok
            & featsL.valid[:, None] & featsR.valid[None, :])
    idx, ok = match_masked(featsL.desc, featsR.desc, mask, max_dist=max_dist)
    idx_c = jnp.clip(idx, 0, uvR.shape[0] - 1)

    # median-distance outlier filter (reference frame.cc:1008+: sort the
    # matched Hamming distances, discard matches beyond 1.5*1.4*median).
    # A floor keeps clean synthetic descriptors (median 0) from nuking
    # every match — real ORB data always has a nonzero median.
    dist = hamming_distance_rows(featsL.desc, featsR.desc[idx_c])
    big = jnp.where(ok, dist, jnp.int32(1 << 14))
    n_ok = jnp.maximum(jnp.sum(ok), 1)
    med = jnp.sort(big)[jnp.clip(n_ok // 2, 0, big.shape[0] - 1)]
    th = jnp.maximum(1.5 * 1.4 * med.astype(jnp.float32), 15.0)
    ok = ok & (dist.astype(jnp.float32) < th)

    u_right = jnp.where(ok, uvR[idx_c, 0], -1.0)
    return u_right, ok


@functools.partial(jax.jit, static_argnames=("half_win", "search"))
def subpixel_refine(imgL: jnp.ndarray, imgR: jnp.ndarray,
                    uvL: jnp.ndarray, u_right: jnp.ndarray,
                    ok: jnp.ndarray, half_win: int = 5, search: int = 5
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Subpixel SAD refinement of matched disparities (reference
    Frame::ComputeStereoMatches correlation stage, frame.cc:940+): an
    11x11 center-normalized window around each left keypoint is swept
    ±`search` px along the matched right row; the SAD minimum gets a
    parabola fit over its two neighbours. Matches whose SAD minimum lands
    on the sweep boundary or whose parabola vertex leaves [-1, 1] are
    dropped, like the reference. One batched gather + reduce program —
    N x (2L+1) x 11 x 11 elementwise work, no per-feature loops.

    The reference sweeps on the keypoint's pyramid level; this sweeps the
    full-resolution image (same ±5 px at octave 0 where nearly all stereo
    matches live, and full-resolution disparity precision for the rest).

    Returns (u_right_refined, ok_refined).
    """
    H, Wimg = imgL.shape
    imgL = imgL.astype(jnp.float32)
    imgR = imgR.astype(jnp.float32)
    W, L = half_win, search
    xL = jnp.round(uvL[:, 0]).astype(jnp.int32)
    yL = jnp.round(uvL[:, 1]).astype(jnp.int32)
    xR0 = jnp.round(u_right).astype(jnp.int32)

    dy = jnp.arange(-W, W + 1)
    rows = jnp.clip(yL[:, None] + dy[None, :], 0, H - 1)          # (N,11)
    colsL = jnp.clip(xL[:, None] + dy[None, :], 0, Wimg - 1)      # (N,11)
    patchL = imgL[rows[:, :, None], colsL[:, None, :]]            # (N,11,11)
    patchL = patchL - patchL[:, W: W + 1, W: W + 1]

    dxs = jnp.arange(-W - L, W + L + 1)
    colsR = jnp.clip(xR0[:, None] + dxs[None, :], 0, Wimg - 1)    # (N,11+2L)
    strip = imgR[rows[:, :, None], colsR[:, None, :]]             # (N,11,21)
    sl = jnp.arange(2 * W + 1)[None, :] + jnp.arange(2 * L + 1)[:, None]
    win = strip[:, :, sl]                     # (N, 11, 2L+1, 11)
    win = jnp.moveaxis(win, 2, 1)             # (N, 2L+1, 11, 11)
    win = win - win[:, :, W: W + 1, W: W + 1]
    sad = jnp.sum(jnp.abs(win - patchL[:, None]), axis=(-1, -2))  # (N,2L+1)

    best = jnp.argmin(sad, axis=1)
    interior = (best > 0) & (best < 2 * L)    # reference: boundary -> drop
    bc = jnp.clip(best, 1, 2 * L - 1)
    ar = jnp.arange(sad.shape[0])
    s1, s2, s3 = sad[ar, bc - 1], sad[ar, bc], sad[ar, bc + 1]
    denom = s1 + s3 - 2.0 * s2
    delta = jnp.where(denom > 1e-6, (s1 - s3) / (2.0 * denom), 0.0)
    in_range = (delta >= -1.0) & (delta <= 1.0)

    u_new = xR0.astype(jnp.float32) + (bc - L).astype(jnp.float32) + delta
    keep = ok & interior & in_range
    return jnp.where(keep, u_new, -1.0), keep


def depth_from_disparity(u_left: jnp.ndarray, u_right: jnp.ndarray,
                         bf: float, has_stereo: jnp.ndarray
                         ) -> jnp.ndarray:
    """z = bf / (uL - uR); -1 where invalid (reference frame.cc mvDepth)."""
    disp = jnp.maximum(u_left - u_right, 1e-6)
    z = bf / disp
    return jnp.where(has_stereo, z, -1.0)


def fisheye_stereo_match(
    featsL: Features,
    featsR: Features,
    cam1: jnp.ndarray,           # (8,) KB8 params, left
    cam2: jnp.ndarray,           # (8,) KB8 params, right
    R21: jnp.ndarray,            # (3,3) left-cam -> right-cam rotation
    t21: jnp.ndarray,            # (3,)
    lap1: Tuple[float, float] = (0.0, 1e9),   # left lapping-area u range
    lap2: Tuple[float, float] = (0.0, 1e9),   # right lapping-area u range
    max_dist: int = 50,          # TH_LOW (descriptor gate, frame.cc:1170)
    reproj_sigma: float = 2.0,   # px, acceptance threshold per observation
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Non-rectified (fisheye) stereo: descriptor match + ray triangulation.

    Replaces Frame::ComputeStereoFishEyeMatches + KannalaBrandt8::
    TriangulateMatches (reference src/map/frame.cc:1134+,
    src/cam/camera_models/kannalabrandt8_model.cc): restrict both feature
    sets to their stereo-overlap ("lapping") column ranges, brute-force
    Hamming match, unproject both rays, midpoint-triangulate through the
    extrinsics, and accept by reprojection error in BOTH views. One dense
    masked matrix program instead of per-feature loops.

    Returns (depth (N,) in the LEFT camera, ok (N,)); depth -1 invalid.
    """
    from .. import cameras

    uL, uR = featsL.uv[:, 0], featsR.uv[:, 0]
    in_lap_L = (uL >= lap1[0]) & (uL <= lap1[1]) & featsL.valid
    in_lap_R = (uR >= lap2[0]) & (uR <= lap2[1]) & featsR.valid
    oct_ok = jnp.abs(featsL.octave[:, None] - featsR.octave[None, :]) <= 1
    mask = in_lap_L[:, None] & in_lap_R[None, :] & oct_ok
    idx, ok = match_masked(featsL.desc, featsR.desc, mask, max_dist=max_dist)
    idx_c = jnp.clip(idx, 0, featsR.uv.shape[0] - 1)

    raysL = cameras.unproject(cameras.KANNALA_BRANDT8, cam1, featsL.uv)
    raysR_all = cameras.unproject(cameras.KANNALA_BRANDT8, cam2, featsR.uv)
    raysR = raysR_all[idx_c]
    X_L = cameras.triangulate(raysL, raysR, R21, t21)   # left-cam frame
    z = X_L[..., 2]
    X_R = X_L @ R21.T + t21
    # acceptance: positive depth both views + reprojection error both views
    # (reference TriangulateMatches: chi2 < 5.991 * sigma^2 per view)
    uvL_hat = cameras.project(cameras.KANNALA_BRANDT8, cam1, X_L)
    uvR_hat = cameras.project(cameras.KANNALA_BRANDT8, cam2, X_R)
    eL = jnp.sum((uvL_hat - featsL.uv) ** 2, axis=-1)
    eR = jnp.sum((uvR_hat - featsR.uv[idx_c]) ** 2, axis=-1)
    # each view gated with its OWN keypoint's octave sigma (reference
    # TriangulateMatches uses sigmaLevel1 / sigmaLevel2 per view)
    sig2L = reproj_sigma ** 2 * 1.2 ** (2 * featsL.octave.astype(jnp.float32))
    sig2R = reproj_sigma ** 2 * 1.2 ** (
        2 * featsR.octave[idx_c].astype(jnp.float32))
    good = (ok & (z > 0.05) & (X_R[..., 2] > 0.05)
            & (eL < 5.991 * sig2L) & (eR < 5.991 * sig2R))
    return jnp.where(good, z, -1.0), good
