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
