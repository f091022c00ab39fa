"""Per-frame pose-inertial optimization — visual+IMU fusion at frame rate.

Reference: Optimizer::PoseInertialOptimizationLastFrame / LastKeyFrame
(optimizer.cc:4762/4394): after the map-point matches are fixed, the
current frame's state is re-solved against BOTH the reprojection factors
and the preintegrated IMU factor from the previous frame (or keyframe),
whose state is held fixed. This is what keeps tracking metric and smooth
between keyframes once the IMU is initialized.

TPU formulation: one jitted 9-dim Gauss-Newton solve — state
[pose (6, left-mult tangent), velocity (3)] of the current frame only.
Biases ride along from the previous frame (the reference's per-frame bias
update is a random-walk nudge; biases are properly re-estimated at
keyframe rate by the windowed visual-inertial BA). The inertial Jacobian
is exact via forward-mode autodiff of the 9-dim perturbation; the visual
Jacobian is the analytic one shared with pose_opt. Outlier handling is the
reference's chi2 round pattern as mask flips.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .. import cameras, lie
from ..imu.preintegration import GRAVITY, ImuBias, ImuCalib, Preintegrated
from .robust import CHI2_2D, huber_rho, huber_weight
from .pose_opt import _residual_and_jac
from .vi_ba import _inertial_res_one


@functools.partial(
    jax.jit,
    static_argnames=("cam_model", "rounds", "iters_per_round", "chi2_th"),
)
def pose_inertial_optimization(
    pose0: lie.SE3,             # current-frame init (visual solve / predict)
    vel0: jnp.ndarray,          # (3,) current-frame velocity init (world)
    prev_pose: lie.SE3,         # previous frame/KF camera pose (FIXED)
    prev_vel: jnp.ndarray,      # (3,) previous velocity (FIXED)
    prev_bias: ImuBias,         # bias at the previous state (held constant)
    pre: Preintegrated,         # preintegration previous -> current
    info: jnp.ndarray,          # (9,9) information of [phi, v, p]
    calib: ImuCalib,
    points_w: jnp.ndarray,      # (N,3) matched map points (world)
    uv: jnp.ndarray,            # (N,2) observed keypoints
    inv_sigma2: jnp.ndarray,    # (N,)
    valid: jnp.ndarray,         # (N,)
    cam_params: jnp.ndarray,
    cam_model: str = cameras.PINHOLE,
    rounds: int = 2,
    iters_per_round: int = 4,
    chi2_th: float = CHI2_2D,
) -> Tuple[lie.SE3, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (pose, vel, inlier (N,), n_inliers ())."""
    valid = valid.astype(bool)
    dtype = points_w.dtype
    g_w = jnp.array([0.0, 0.0, -GRAVITY], dtype)

    def inertial_r(pose, vel):
        return _inertial_res_one(
            pre, None, prev_pose, prev_vel, pose, vel,
            prev_bias.gyro, prev_bias.acc, calib, g_w)

    def cost_of(pose, vel, inlier):
        r, _, depth_ok = _residual_and_jac(pose, points_w, uv,
                                           cam_model, cam_params)
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        c_vis = jnp.sum(jnp.where(inlier & valid & depth_ok,
                                  huber_rho(chi2, chi2_th), 0.0))
        ri = inertial_r(pose, vel)
        return c_vis + ri @ info @ ri

    def gn_iters(pose, vel, inlier):
        def body(carry, _):
            pose, vel = carry
            # visual part: analytic Jacobian, pose block only
            r, J, depth_ok = _residual_and_jac(pose, points_w, uv,
                                               cam_model, cam_params)
            chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
            w = jnp.where(inlier & valid & depth_ok,
                          huber_weight(chi2, chi2_th) * inv_sigma2,
                          0.0).astype(dtype)
            Hv = jnp.zeros((9, 9), dtype)
            Hv = Hv.at[:6, :6].set(jnp.einsum("nik,n,nil->kl", J, w, J))
            gv = jnp.zeros(9, dtype)
            gv = gv.at[:6].set(jnp.einsum("nik,n,ni->k", J, w, r))

            # inertial part: exact 9x9 Jacobian by jacfwd of the tangent
            def ri_at(dx):
                p2 = lie.se3_boxplus(pose, dx[:6])
                return inertial_r(p2, vel + dx[6:9])

            ri = ri_at(jnp.zeros(9, dtype))
            Ji = jax.jacfwd(ri_at)(jnp.zeros(9, dtype))    # (9,9)
            Hi = Ji.T @ info @ Ji
            gi = Ji.T @ (info @ ri)

            H = Hv + Hi
            g = gv + gi
            H = H + 1e-5 * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(9, dtype=dtype)
            dx = -jax.scipy.linalg.solve(H, g, assume_a="pos")
            new_pose = lie.se3_boxplus(pose, dx[:6])
            new_vel = vel + dx[6:9]
            ok = (jnp.all(jnp.isfinite(new_pose.t))
                  & jnp.all(jnp.isfinite(new_pose.R))
                  & jnp.all(jnp.isfinite(new_vel)))
            pose = jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new_pose, pose)
            vel = jnp.where(ok, new_vel, vel)
            return (pose, vel), None

        (pose1, vel1), _ = jax.lax.scan(body, (pose, vel), None,
                                        length=iters_per_round)
        worse = cost_of(pose1, vel1, inlier) >= cost_of(pose, vel, inlier)
        pose = jax.tree_util.tree_map(
            lambda a, b: jnp.where(worse, b, a), pose1, pose)
        vel = jnp.where(worse, vel, vel1)
        return pose, vel

    def round_body(i, carry):
        pose, vel, inlier = carry
        pose, vel = gn_iters(pose, vel, inlier)
        r, _, depth_ok = _residual_and_jac(pose, points_w, uv,
                                           cam_model, cam_params)
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        inlier = (chi2 <= chi2_th) & valid & depth_ok
        return pose, vel, inlier

    pose, vel, inlier = jax.lax.fori_loop(
        0, rounds, round_body, (pose0, vel0, valid))
    return pose, vel, inlier, jnp.sum(inlier.astype(jnp.int32))
