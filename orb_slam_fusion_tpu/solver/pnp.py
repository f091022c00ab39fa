"""Absolute-pose estimation (PnP): batched linear RANSAC + ML refinement.

Replaces MLPnPsolver (src/solver/mlpnp_solver.cc, used only by
Tracking::Relocalization, tracking.cc:2914). The TPU-native approach
evaluates ALL RANSAC hypotheses as a batch: 6-point DLT estimates of [R|t]
(one batched SVD), orthonormality projection, dual cheirality/reprojection
scoring — then the reference's actual maximum-likelihood estimator on the
winner's inliers: the null-space bearing-vector formulation
(mlpnp_solver.cc, after Urban et al. 2016). Each observed unit bearing v
gets a 2-column tangent-plane null-space basis [r, s] ⟂ v; the residual of
a candidate pose is the predicted bearing expressed in that basis,
[rᵀv̂, sᵀv̂] with v̂ = (RX+t)/‖RX+t‖ — a projection-free 2-dof residual
(valid for ANY central camera, including KB8 fisheye, with no
per-iteration projection/unprojection), information-weighted per
observation (the reference propagates per-bearing covariances into the
solve; here the per-octave information plays that role). Gauss-Newton with
LM damping runs as a lax.scan; a final `pose_optimization` pass
re-classifies inliers in pixel space (the reference's final optimization).
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


def bearing_nullspace(v: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tangent-plane basis [r, s] ⟂ v for unit bearings v (N, 3).

    The reference's nullspace() (mlpnp_solver.cc): each observed bearing
    contributes residuals only in its own tangent plane. Basis seed is the
    coordinate axis least aligned with v (numerically safest cross)."""
    e = jax.nn.one_hot(jnp.argmin(jnp.abs(v), axis=-1), 3, dtype=v.dtype)
    r = jnp.cross(e, v)
    r = r / jnp.maximum(jnp.linalg.norm(r, axis=-1, keepdims=True), 1e-12)
    s = jnp.cross(v, r)
    return r, s


@functools.partial(jax.jit, static_argnames=("iters",))
def mlpnp_refine(pose0: lie.SE3, X: jnp.ndarray, bearings: jnp.ndarray,
                 inv_sigma2: jnp.ndarray, valid: jnp.ndarray,
                 iters: int = 10) -> Tuple[lie.SE3, jnp.ndarray]:
    """Null-space bearing-vector ML pose refinement (MLPnP's estimator).

    Minimizes sum_i w_i ‖[r_iᵀ; s_iᵀ] v̂_i(T)‖² over T ∈ SE(3), where
    v̂ = (RX+t)/‖RX+t‖, with LM-damped Gauss-Newton as one lax.scan
    program. Returns (pose, final cost)."""
    dtype = X.dtype
    v_obs = bearings / jnp.maximum(
        jnp.linalg.norm(bearings, axis=-1, keepdims=True), 1e-12)
    rb, sb = bearing_nullspace(v_obs)
    w = jnp.where(valid, inv_sigma2, 0.0).astype(dtype)

    def res_jac(pose):
        pc = lie.se3_apply(pose, X)                       # (N,3)
        nrm = jnp.maximum(jnp.linalg.norm(pc, axis=-1, keepdims=True),
                          1e-9)
        vh = pc / nrm                                     # (N,3)
        r = jnp.stack([jnp.sum(rb * vh, -1),
                       jnp.sum(sb * vh, -1)], axis=-1)    # (N,2)
        # dv̂/dpc = (I - v̂v̂ᵀ)/‖pc‖ ; dpc/dξ = [I | -hat(pc)], ξ=[v,w]
        P = (jnp.eye(3, dtype=dtype) - vh[..., :, None] * vh[..., None, :]
             ) / nrm[..., None]
        B = jnp.stack([rb, sb], axis=-2)                  # (N,2,3)
        Jpc = jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3, dtype=dtype),
                              pc.shape[:-1] + (3, 3)),
             -lie.hat(pc)], axis=-1)                      # (N,3,6)
        J = jnp.einsum("nab,nbc,ncd->nad", B, P, Jpc)     # (N,2,6)
        fin = (jnp.all(jnp.isfinite(r), -1)
               & jnp.all(jnp.isfinite(J), (-2, -1)))
        return (jnp.where(fin[..., None], r, 0.0),
                jnp.where(fin[..., None, None], J, 0.0))

    def cost_of(pose):
        r, _ = res_jac(pose)
        return jnp.sum(w * jnp.sum(r * r, -1))

    def body(carry, _):
        pose, lam, c0 = carry
        r, J = res_jac(pose)
        H = jnp.einsum("nik,n,nil->kl", J, w, J)
        g = jnp.einsum("nik,n,ni->k", J, w, r)
        Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-10 * jnp.eye(6, dtype=dtype)
        dx = -jnp.linalg.solve(Hd, g)
        cand = lie.se3_boxplus(pose, dx)
        c1 = cost_of(cand)
        ok = (c1 < c0) & jnp.isfinite(c1)
        pose = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), cand, pose)
        lam = jnp.where(ok, jnp.maximum(lam / 3.0, 1e-9),
                        jnp.minimum(lam * 5.0, 1e5))
        return (pose, lam, jnp.where(ok, c1, c0)), c1

    (pose, _, cost), _ = jax.lax.scan(
        body, (pose0, jnp.asarray(1e-3, dtype), cost_of(pose0)),
        None, length=iters)
    return pose, cost


@functools.partial(jax.jit, static_argnames=("n_hyp", "min_inliers",
                                             "cam_model", "ml_refine"))
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
    ml_refine: bool = True,
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
    if ml_refine:
        # MLPnP's actual estimator: null-space bearing-vector GN on the
        # RANSAC winner's inliers (mlpnp_solver.cc refinement loop)
        pose0, _ = mlpnp_refine(pose0, X, rays, inv_sigma2, inliers0)
    # final pixel-space polish + inlier classification, information-
    # weighted (the reference's final optimization after ML refinement)
    pose, inliers, n_in = pose_optimization(
        pose0, X, uv, inv_sigma2, inliers0, cam_params,
        cam_model=cam_model, rounds=2)
    return PnPResult(ok=n_in >= min_inliers, pose=pose,
                     inliers=inliers, n_inliers=n_in)
