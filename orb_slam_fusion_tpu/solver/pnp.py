"""Absolute-pose estimation (PnP) via batched linear RANSAC.

Replaces MLPnPsolver (src/solver/mlpnp_solver.cc, used only by
Tracking::Relocalization, tracking.cc:2914). The reference's ML-PnP does a
null-space bearing-vector formulation with per-iteration Gauss-Newton; the
TPU-native approach evaluates ALL RANSAC hypotheses as a batch: 6-point DLT
estimates of [R|t] (one batched SVD), orthonormality projection, dual
cheirality/reprojection scoring — then a single `pose_optimization` polish
on the winner's inliers (same as the reference's final optimization).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .. import cameras, lie
from .pose_opt import pose_optimization


class PnPResult(NamedTuple):
    ok: jnp.ndarray
    pose: lie.SE3            # Tcw
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


def _dlt_pose(X: jnp.ndarray, rays: jnp.ndarray) -> Tuple[jnp.ndarray,
                                                          jnp.ndarray]:
    """Batched 6-point DLT for [R|t] from 3D points + unit-plane rays.

    X: (H, 6, 3); rays: (H, 6, 3) with z=1. Returns (R (H,3,3), t (H,3)).
    """
    x, y = rays[..., 0], rays[..., 1]
    ones = jnp.ones_like(x)
    zeros = jnp.zeros_like(x)
    Xh = jnp.concatenate([X, ones[..., None]], axis=-1)      # (H,6,4)
    z4 = jnp.zeros_like(Xh)
    rows_a = jnp.concatenate([Xh, z4, -x[..., None] * Xh], axis=-1)
    rows_b = jnp.concatenate([z4, Xh, -y[..., None] * Xh], axis=-1)
    A = jnp.concatenate([rows_a, rows_b], axis=-2)           # (H,12,12)
    _, _, vt = jnp.linalg.svd(A)
    p = vt[..., -1, :]
    P = p.reshape(p.shape[:-1] + (3, 4))
    Rraw = P[..., :3]
    t = P[..., 3]
    # scale + orthonormalize: R = U V^T, s = mean singular value
    U, d, Vt = jnp.linalg.svd(Rraw)
    det = jnp.linalg.det(U @ Vt)
    S = jnp.ones(Rraw.shape[:-2] + (3,), Rraw.dtype).at[..., 2].set(det)
    R = (U * S[..., None, :]) @ Vt
    scale = jnp.sum(d * S, axis=-1) / 3.0
    scale = jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    t = t / scale[..., None]
    # resolve the overall sign with cheirality of the first point
    z0 = jnp.einsum("...ij,...j->...i", R, X[..., 0, :])[..., 2] + t[..., 2]
    flip = z0 < 0
    # flipping sign of P means R -> -R (improper) — instead flip both det
    # and t: use -Rraw path: approximate by negating t and rotating 180 is
    # wrong; standard trick: if z<0 negate p (done before orthonorm).
    # Simpler: recompute with negated scale (equivalent to negating p):
    R = jnp.where(flip[..., None, None], -R, R)
    t = jnp.where(flip[..., None], -t, t)
    # -R may be improper; re-project to SO(3)
    U2, d2, Vt2 = jnp.linalg.svd(R)
    det2 = jnp.linalg.det(U2 @ Vt2)
    S2 = jnp.ones(R.shape[:-2] + (3,), R.dtype).at[..., 2].set(det2)
    R = (U2 * S2[..., None, :]) @ Vt2
    return R, t


@functools.partial(jax.jit, static_argnames=("n_hyp", "min_inliers",
                                             "cam_model"))
def pnp_ransac(
    X: jnp.ndarray,          # (N,3) world points
    uv: jnp.ndarray,         # (N,2) observations
    valid: jnp.ndarray,      # (N,)
    cam_params: jnp.ndarray,
    key: jnp.ndarray,
    max_err_px: float = 5.99,
    n_hyp: int = 256,
    min_inliers: int = 15,
    cam_model: str = cameras.PINHOLE,
    inv_sigma2: jnp.ndarray | None = None,
) -> PnPResult:
    """inv_sigma2: per-observation information 1/sigma^2 from the keypoint
    octave — the measurement-covariance weighting of the reference's ML-PnP
    (mlpnp_solver.cc propagates per-bearing covariances into the solve):
    the chi2 inlier gate scales with sigma2 and the LM polish weights each
    residual by its information, so coarse-octave observations neither veto
    inliers nor dominate the refined pose. None = unit weights."""
    n = X.shape[0]
    rays = cameras.unproject(cam_model, cam_params, uv)
    if inv_sigma2 is None:
        inv_sigma2 = jnp.ones(n, X.dtype)

    g = jax.random.gumbel(key, (n_hyp, n))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, 6)
    R, t = _dlt_pose(X[idx], rays[idx])

    pc = jnp.einsum("hij,nj->hni", R, X) + t[:, None, :]
    pred = cameras.project(cam_model, cam_params, pc)
    err2 = jnp.sum((pred - uv[None]) ** 2, axis=-1)
    # chi2 gate at the observation's own covariance (sigma2 = 1/inv_sigma2)
    inl = valid[None, :] & (pc[..., 2] > 0.05) \
        & (err2 * inv_sigma2[None, :] < max_err_px ** 2)
    scores = jnp.sum(inl.astype(jnp.int32), axis=1)
    best = jnp.argmax(scores)

    pose0 = lie.SE3(R[best], t[best])
    inliers0 = inl[best]
    # polish with the standard pose LM on the inlier set, information-
    # weighted (the reference's final GN over covariance-weighted bearings)
    pose, inliers, n_in = pose_optimization(
        pose0, X, uv, inv_sigma2, inliers0, cam_params,
        cam_model=cam_model, rounds=2)
    return PnPResult(ok=n_in >= min_inliers, pose=pose,
                     inliers=inliers, n_inliers=n_in)
