"""Rectified stereo matching.

Replaces Frame::ComputeStereoMatches (src/map/frame.cc:828): for each left
keypoint find the best right-image keypoint on the same rectified row within
the disparity range. The reference loops rows with per-feature candidate
lists + SAD subpixel refinement; the TPU formulation is one masked dense
Hamming match: row-band mask ∧ disparity-window mask ∧ octave compatibility,
then argmin — identical association semantics, no loops.

Subpixel SAD refinement over image patches is a planned follow-up (the
reference refines over ±5 px with a parabola fit, frame.cc:940+); at ORB
noise levels the descriptor-match disparity is within ~1 px.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .extractor import Features
from .matcher import TH_HIGH, match_masked


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
    u_right = jnp.where(ok, uvR[idx_c, 0], -1.0)
    return u_right, ok


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
