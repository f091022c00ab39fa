"""Sim3 estimation: batched Horn RANSAC + LM refinement.

Replaces Sim3Solver (src/solver/sim3_solver.cc — 3-point Horn closed form
inside RANSAC with reprojection inlier checks in both keyframes) and
Optimizer::OptimizeSim3 (optimizer.cc:2065 — bidirectional-reprojection LM
on one Sim3 vertex). All RANSAC hypotheses evaluate as one batch.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .. import cameras, lie
from .robust import huber_rho


def horn_alignment(x: jnp.ndarray, y: jnp.ndarray,
                   fix_scale: bool = False
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Closed-form similarity y ~ s R x + t for point sets (..., N, 3).

    Batched over leading dims (the RANSAC hypothesis axis). Horn's method
    via SVD of the correlation matrix (reference Sim3Solver::ComputeSim3
    uses the quaternion eigen-method; SVD is equivalent and batches).
    """
    mx = jnp.mean(x, axis=-2, keepdims=True)
    my = jnp.mean(y, axis=-2, keepdims=True)
    xc = x - mx
    yc = y - my
    W = jnp.einsum("...ni,...nj->...ij", yc, xc)  # (…,3,3)
    U, d, Vt = jnp.linalg.svd(W)
    det = jnp.linalg.det(U @ Vt)
    S = jnp.ones(W.shape[:-2] + (3,), W.dtype).at[..., 2].set(det)
    R = (U * S[..., None, :]) @ Vt
    if fix_scale:
        s = jnp.ones(W.shape[:-2], W.dtype)
    else:
        var_x = jnp.sum(xc * xc, axis=(-2, -1))
        s = jnp.sum(d * S, axis=-1) / jnp.maximum(var_x, 1e-12)
    t = my[..., 0, :] - s[..., None] * jnp.einsum(
        "...ij,...j->...i", R, mx[..., 0, :])
    return s, R, t


class Sim3RansacResult(NamedTuple):
    ok: jnp.ndarray
    sim: lie.Sim3            # S_21: maps frame-1 points into frame 2
    inliers: jnp.ndarray     # (N,) bool
    n_inliers: jnp.ndarray


@functools.partial(jax.jit,
                   static_argnames=("n_hyp", "fix_scale", "min_inliers",
                                    "cam_model"))
def sim3_ransac(
    x1: jnp.ndarray,          # (N,3) 3D points in KF1 camera frame
    x2: jnp.ndarray,          # (N,3) corresponding points in KF2 camera frame
    valid: jnp.ndarray,       # (N,)
    uv1: jnp.ndarray,         # (N,2) observed pixels in KF1
    uv2: jnp.ndarray,         # (N,2) observed pixels in KF2
    cam_params: jnp.ndarray,
    key: jnp.ndarray,
    max_err_px: float = 10.0,
    n_hyp: int = 128,
    fix_scale: bool = False,
    min_inliers: int = 20,
    cam_model: str = cameras.PINHOLE,
) -> Sim3RansacResult:
    """Batched 3-point Sim3 RANSAC with dual reprojection inlier check.

    Reference: Sim3Solver::iterate (sim3_solver.cc) — inliers must
    reproject within threshold in BOTH keyframes (CheckInliers).
    """
    n = x1.shape[0]
    g = jax.random.gumbel(key, (n_hyp, n))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, 3)                      # (H,3)

    s, R, t = horn_alignment(x1[idx], x2[idx], fix_scale=fix_scale)

    def check(s, R, t):
        S12 = lie.Sim3(s, R, t)
        S21 = lie.sim3_inverse(S12)
        p2 = lie.sim3_apply(S12, x1)         # frame1 pts -> frame2
        p1 = lie.sim3_apply(S21, x2)         # frame2 pts -> frame1
        e2 = jnp.sum((cameras.project(cam_model, cam_params, p2) - uv2) ** 2,
                     axis=-1)
        e1 = jnp.sum((cameras.project(cam_model, cam_params, p1) - uv1) ** 2,
                     axis=-1)
        ok = (valid & (p1[..., 2] > 0.01) & (p2[..., 2] > 0.01)
              & (e1 < max_err_px ** 2) & (e2 < max_err_px ** 2))
        return ok

    inl = jax.vmap(check)(s, R, t)                    # (H,N)
    scores = jnp.sum(inl.astype(jnp.int32), axis=1)
    best = jnp.argmax(scores)
    # refit on the best hypothesis' inliers (masked Horn via weighting:
    # zero out non-inliers by replacing with centroid — cheap trick)
    m = inl[best]
    w = m.astype(x1.dtype)[:, None]
    cx = jnp.sum(x1 * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    cy = jnp.sum(x2 * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    x1f = jnp.where(m[:, None], x1, cx)
    x2f = jnp.where(m[:, None], x2, cy)
    s_f, R_f, t_f = horn_alignment(x1f, x2f, fix_scale=fix_scale)
    inl_f = check(s_f, R_f, t_f)
    n_in = jnp.sum(inl_f.astype(jnp.int32))
    return Sim3RansacResult(
        ok=n_in >= min_inliers,
        sim=lie.Sim3(s_f, R_f, t_f),
        inliers=inl_f,
        n_inliers=n_in,
    )


@functools.partial(jax.jit, static_argnames=("iters", "fix_scale",
                                             "cam_model"))
def optimize_sim3(
    S12: lie.Sim3,
    x1: jnp.ndarray, x2: jnp.ndarray, valid: jnp.ndarray,
    uv1: jnp.ndarray, uv2: jnp.ndarray,
    inv_sigma2_1: jnp.ndarray, inv_sigma2_2: jnp.ndarray,
    cam_params: jnp.ndarray,
    iters: int = 10,
    fix_scale: bool = False,
    chi2_th: float = 9.21,     # reference: th2 = 10 (optimizer.cc:2077)
    cam_model: str = cameras.PINHOLE,
) -> Tuple[lie.Sim3, jnp.ndarray, jnp.ndarray]:
    """LM refinement of a Sim3 with bidirectional reprojection residuals.

    Reference: Optimizer::OptimizeSim3 (optimizer.cc:2065): edges project
    x1 through S12 against uv2 and x2 through S12^-1 against uv1.
    Returns (refined S12, inlier mask, n_inliers).
    """
    dtype = x1.dtype

    def residuals(xi):
        # left-multiplicative update on S12: S = exp(xi) * S12
        S = lie.sim3_compose(lie.sim3_exp(xi), S12)
        Sinv = lie.sim3_inverse(S)
        p2 = lie.sim3_apply(S, x1)
        p1 = lie.sim3_apply(Sinv, x2)
        r2 = cameras.project(cam_model, cam_params, p2) - uv2
        r1 = cameras.project(cam_model, cam_params, p1) - uv1
        return r1, r2, p1[..., 2] > 0.01, p2[..., 2] > 0.01

    def cost_of(xi, inlier):
        r1, r2, d1, d2 = residuals(xi)
        c1 = jnp.sum(r1 * r1, axis=-1) * inv_sigma2_1
        c2 = jnp.sum(r2 * r2, axis=-1) * inv_sigma2_2
        act = inlier & valid & d1 & d2
        return jnp.sum(jnp.where(act, huber_rho(c1, chi2_th)
                                 + huber_rho(c2, chi2_th), 0.0))

    def body(carry, _):
        xi, lam, inlier = carry
        J = jax.jacfwd(lambda z: jnp.concatenate(
            [residuals(z)[0].reshape(-1), residuals(z)[1].reshape(-1)]))(xi)
        r1, r2, d1, d2 = residuals(xi)
        act = (inlier & valid & d1 & d2).astype(dtype)
        w1 = act * inv_sigma2_1
        w2 = act * inv_sigma2_2
        w = jnp.concatenate([jnp.repeat(w1, 2), jnp.repeat(w2, 2)])
        r = jnp.concatenate([r1.reshape(-1), r2.reshape(-1)])
        H = (J * w[:, None]).T @ J
        g = (J * w[:, None]).T @ r
        if fix_scale:
            H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
            g = g.at[6].set(0.0)
        dx = -jax.scipy.linalg.solve(
            H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(7, dtype=dtype),
            g, assume_a="pos")
        c0 = cost_of(xi, inlier)
        c1 = cost_of(xi + dx, inlier)
        ok = (c1 < c0) & jnp.all(jnp.isfinite(dx))
        xi = jnp.where(ok, xi + dx, xi)
        lam = jnp.where(ok, jnp.maximum(lam * 0.3, 1e-8),
                        jnp.minimum(lam * 5.0, 1e4))
        return (xi, lam, inlier), None

    xi0 = jnp.zeros(7, dtype)
    inlier0 = valid
    (xi, _, _), _ = jax.lax.scan(
        body, (xi0, jnp.asarray(1e-4, dtype), inlier0), None, length=iters)

    r1, r2, d1, d2 = residuals(xi)
    c1 = jnp.sum(r1 * r1, axis=-1) * inv_sigma2_1
    c2 = jnp.sum(r2 * r2, axis=-1) * inv_sigma2_2
    inlier = valid & d1 & d2 & (c1 < chi2_th) & (c2 < chi2_th)
    S_out = lie.sim3_compose(lie.sim3_exp(xi), S12)
    return S_out, inlier, jnp.sum(inlier.astype(jnp.int32))
