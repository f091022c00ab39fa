"""Single-pose optimization — the per-frame tracking hot path.

TPU-native replacement for Optimizer::PoseOptimization (reference:
src/solver/g2o_solver/optimizer.cc:762): optimize one camera pose against a
batch of matched 3D map points with monocular reprojection residuals, running
the reference's 4-round x 10-iteration pattern with chi-square outlier
toggling between rounds (optimizer.cc:956-1027) — but as one compiled XLA
program where "removing an edge" is flipping a mask bit, so no graph rebuild
and no recompilation ever happens at runtime.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .. import cameras, lie
from .robust import CHI2_2D, huber_rho, huber_weight


def _residual_and_jac(pose: lie.SE3, points_w: jnp.ndarray, uv: jnp.ndarray,
                      cam_model: str, cam_params: jnp.ndarray):
    """r = project(T * X) - uv (N,2); J = dr/dxi (N,2,6), xi=[v,w] left-mult."""
    pc = lie.se3_apply(pose, points_w)  # (N,3)
    pred = cameras.project(cam_model, cam_params, pc)
    r = pred - uv
    Jproj = cameras.project_jac(cam_model, cam_params, pc)  # (N,2,3)
    # d(pc)/d(xi): pc' = exp(xi) pc => dpc = v + w x pc = [I | -hat(pc)] xi
    Jpc = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape[:-1] + (3, 3)),
         -lie.hat(pc)],
        axis=-1,
    )  # (N,3,6)
    J = jnp.einsum("nij,njk->nik", Jproj, Jpc)  # (N,2,6)
    depth_ok = pc[..., 2] > 1e-4
    # rows that will be masked out (bad depth / degenerate projection) must
    # carry ZEROS, not NaN/Inf: 0 * NaN = NaN would poison the weighted
    # normal-equation reductions for every row
    finite = (depth_ok & jnp.all(jnp.isfinite(r), axis=-1)
              & jnp.all(jnp.isfinite(J), axis=(-2, -1)))
    r = jnp.where(finite[..., None], r, 0.0)
    J = jnp.where(finite[..., None, None], J, 0.0)
    return r, J, finite


@functools.partial(
    jax.jit,
    static_argnames=("cam_model", "rounds", "iters_per_round", "chi2_th"),
)
def pose_optimization(
    pose0: lie.SE3,
    points_w: jnp.ndarray,       # (N, 3) matched map points (world)
    uv: jnp.ndarray,             # (N, 2) observed keypoints
    inv_sigma2: jnp.ndarray,     # (N,) information per obs (1/sigma^2, octave-dep)
    valid: jnp.ndarray,          # (N,) bool — real (non-padded) matches
    cam_params: jnp.ndarray,
    cam_model: str = cameras.PINHOLE,
    rounds: int = 4,
    iters_per_round: int = 10,
    chi2_th: float = CHI2_2D,
) -> Tuple[lie.SE3, jnp.ndarray, jnp.ndarray]:
    """Returns (optimized pose, inlier mask (N,), num_inliers ()).

    Matches the reference pattern: 4 optimization rounds; between rounds each
    observation is re-classified inlier/outlier at chi2_th (with the robust
    kernel active only while it is an inlier). Padded entries (valid=False)
    never contribute.
    """
    valid = valid.astype(bool)
    dtype = points_w.dtype

    def cost_of(pose, inlier):
        r, _, depth_ok = _residual_and_jac(pose, points_w, uv,
                                           cam_model, cam_params)
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        return jnp.sum(jnp.where(inlier & valid & depth_ok,
                                 huber_rho(chi2, chi2_th), 0.0))

    def lm_iters(pose0_round, inlier):
        # Fixed-small-damping Gauss-Newton with a per-round safety revert:
        # one residual evaluation per iteration (the accept-test evaluation
        # is hoisted out of the loop), which halves the sequential depth of
        # the per-frame hot path. Near Gauss-Newton damping is REQUIRED,
        # not just fast: incomplete convergence along weakly-constrained
        # directions (forward/scale in corridors) feeds the constant-
        # velocity predictor and closes an unstable loop
        # e_{k+1} ~ kappa*(2 e_k - e_{k-1}), divergent for kappa > 1/3.
        def body(pose, _):
            r, J, depth_ok = _residual_and_jac(pose, points_w, uv,
                                               cam_model, cam_params)
            chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
            w_rob = huber_weight(chi2, chi2_th)
            w = jnp.where(inlier & valid & depth_ok,
                          w_rob * inv_sigma2, 0.0).astype(dtype)
            H = jnp.einsum("nik,n,nil->kl", J, w, J)  # (6,6)
            g = jnp.einsum("nik,n,ni->k", J, w, r)    # (6,)
            damped = H + 1e-5 * jnp.diag(jnp.diag(H)) \
                + 1e-9 * jnp.eye(6, dtype=dtype)
            dx = -jax.scipy.linalg.solve(damped, g, assume_a="pos")
            new_pose = lie.se3_boxplus(pose, dx)
            ok = (jnp.all(jnp.isfinite(new_pose.t))
                  & jnp.all(jnp.isfinite(new_pose.R)))
            pose = jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new_pose, pose)
            return pose, None

        pose, _ = jax.lax.scan(body, pose0_round, None,
                               length=iters_per_round)
        # safety: if GN diverged this round (outlier-heavy rounds can),
        # keep the round's starting pose
        worse = cost_of(pose, inlier) >= cost_of(pose0_round, inlier)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(worse, b, a), pose, pose0_round)

    def round_body(i, carry):
        pose, inlier = carry
        pose = lm_iters(pose, inlier)
        r, _, depth_ok = _residual_and_jac(pose, points_w, uv,
                                           cam_model, cam_params)
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        inlier = (chi2 <= chi2_th) & valid & depth_ok
        return pose, inlier

    pose, inlier = jax.lax.fori_loop(
        0, rounds, round_body, (pose0, valid))
    return pose, inlier, jnp.sum(inlier.astype(jnp.int32))
