"""Per-frame pose-inertial optimization (PoseInertialOptimizationLastFrame)."""

import jax.numpy as jnp
import numpy as np

from orb_slam_fusion_tpu import cameras, lie
from orb_slam_fusion_tpu.imu.factors import information_from_cov
from orb_slam_fusion_tpu.imu.preintegration import (make_calib, preintegrate,
                                                    zero_bias)
from orb_slam_fusion_tpu.solver.pose_inertial import (
    pose_inertial_optimization)
from test_imu import simulate_trajectory

CAM = jnp.array([400.0, 400.0, 320.0, 240.0])


def _pose_cw_from_body(R_wb, p_wb):
    """Tbc = I: camera pose (Tcw) from world-from-body state."""
    R_cw = np.asarray(R_wb).T
    t_cw = -R_cw @ np.asarray(p_wb)
    return lie.SE3(jnp.asarray(R_cw, jnp.float32),
                   jnp.asarray(t_cw, jnp.float32))


def test_recovers_perturbed_state():
    accs, gyros, dts, states = simulate_trajectory(T=0.25)
    calib = make_calib()
    pre = preintegrate(jnp.asarray(accs), jnp.asarray(gyros),
                       jnp.asarray(dts), zero_bias(), calib)
    info = information_from_cov(pre)

    R0, p0, v0 = states[0]
    R1, p1, v1 = states[-1]
    prev_pose = _pose_cw_from_body(R0, p0)
    true_pose = _pose_cw_from_body(R1, p1)

    # visual observations of a synthetic cloud from the true pose
    rng = np.random.RandomState(0)
    N = 256
    pts_c = rng.uniform(-2, 2, (N, 3)).astype(np.float32)
    pts_c[:, 2] = rng.uniform(4, 10, N)
    pts_w = np.asarray(lie.se3_apply(lie.se3_inverse(true_pose),
                                     jnp.asarray(pts_c)))
    uv = np.asarray(cameras.pinhole_project(CAM, jnp.asarray(pts_c)))

    # perturbed start
    xi = jnp.asarray([0.05, -0.03, 0.04, 0.01, -0.02, 0.015], jnp.float32)
    pose_init = lie.se3_compose(lie.se3_exp(xi), true_pose)
    vel_init = jnp.asarray(v1 + 0.3 * rng.randn(3), jnp.float32)

    pose, vel, inlier, n_in = pose_inertial_optimization(
        pose_init, vel_init, prev_pose,
        jnp.asarray(v0, jnp.float32), zero_bias(), pre, info, calib,
        jnp.asarray(pts_w), jnp.asarray(uv), jnp.ones(N), jnp.ones(N, bool),
        CAM, rounds=3, iters_per_round=6)

    assert int(n_in) > 200, int(n_in)
    terr = float(jnp.linalg.norm(pose.t - true_pose.t))
    Rerr = float(jnp.linalg.norm(pose.R - true_pose.R))
    verr = float(jnp.linalg.norm(vel - jnp.asarray(v1)))
    assert terr < 2e-3, terr
    assert Rerr < 2e-3, Rerr
    assert verr < 0.05, verr


def test_inertial_pulls_without_vision():
    """With no visual matches, the solve must follow the IMU propagation
    from the previous state (and stay finite)."""
    accs, gyros, dts, states = simulate_trajectory(T=0.25)
    calib = make_calib()
    pre = preintegrate(jnp.asarray(accs), jnp.asarray(gyros),
                       jnp.asarray(dts), zero_bias(), calib)
    info = information_from_cov(pre)
    R0, p0, v0 = states[0]
    R1, p1, v1 = states[-1]
    prev_pose = _pose_cw_from_body(R0, p0)
    true_pose = _pose_cw_from_body(R1, p1)

    N = 32
    pose, vel, inlier, n_in = pose_inertial_optimization(
        prev_pose, jnp.asarray(v0, jnp.float32), prev_pose,
        jnp.asarray(v0, jnp.float32), zero_bias(), pre, info, calib,
        jnp.zeros((N, 3)), jnp.zeros((N, 2)), jnp.ones(N),
        jnp.zeros(N, bool), CAM, rounds=2, iters_per_round=8)
    assert np.isfinite(np.asarray(pose.t)).all()
    terr = float(jnp.linalg.norm(pose.t - true_pose.t))
    assert terr < 0.05, terr
