"""Marginalized 15-dim pose-IMU prior (reference: Optimizer::Marginalize +
ConstraintPoseImu/EdgePriorPoseImu, optimizer.cc:2904/4762-5160,
g2o_types.h:664-722).

Round-1 verdict item #3: the per-frame inertial solve fixed the previous
state outright, discarding inter-keyframe information. These tests verify
the joint [prev+cur] solve converges, the marginalized prior is PSD, and —
the load-bearing property — that carried information survives a visually
starved frame where the fix-the-previous-state solver drifts.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_fusion_tpu import cameras, lie
from orb_slam_fusion_tpu.imu.factors import information_from_cov
from orb_slam_fusion_tpu.imu.preintegration import (GRAVITY, ImuBias,
                                                    make_calib,
                                                    preintegrate_host,
                                                    zero_bias)
from orb_slam_fusion_tpu.solver.pose_inertial_prior import (
    make_initial_prior, pose_inertial_marginalized)

CAM = jnp.array([400.0, 400.0, 376.0, 240.0])
G_W = np.array([0.0, 0.0, -GRAVITY])


def _make_hop(v_w, dt_total=0.05, n_meas=10, bias=None):
    """Integrator-consistent preintegration for a constant-velocity hop
    with identity attitude (specific force = -g in body frame)."""
    calib = make_calib()
    dts = np.full(n_meas, dt_total / n_meas)
    acc = np.tile(-G_W, (n_meas, 1))
    gyro = np.zeros((n_meas, 3))
    if bias is not None:
        acc = acc + np.asarray(bias.acc)
        gyro = gyro + np.asarray(bias.gyro)
    pre = preintegrate_host(acc, gyro, dts, zero_bias(), calib)
    return pre, calib


def _project(pose, pts):
    return cameras.project(cameras.PINHOLE, CAM,
                           lie.se3_apply(pose, jnp.asarray(pts)))


@pytest.fixture(scope="module")
def scene():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-2, 2, (60, 3)).astype(np.float32) + \
        np.array([0, 0, 6], np.float32)
    return pts


def test_joint_solve_converges_and_prior_psd(scene):
    v_w = np.array([0.5, 0.0, 0.2])
    dt = 0.05
    pre, calib = _make_hop(v_w, dt)
    pose0 = lie.se3_identity()
    pose1 = lie.SE3(jnp.eye(3), jnp.asarray(-v_w * dt, jnp.float32))
    uv1 = _project(pose1, scene)

    prior = make_initial_prior(pose0, jnp.asarray(v_w, jnp.float32),
                               zero_bias())
    info = information_from_cov(pre)
    pose_init = lie.se3_boxplus(pose1, jnp.asarray(
        [0.02, -0.01, 0.03, 0.005, -0.004, 0.006], jnp.float32))
    pose, vel, bias, prior2, inlier, n_in = pose_inertial_marginalized(
        prior, pose_init, jnp.asarray(v_w, jnp.float32) + 0.1,
        pre, info, calib, jnp.asarray(scene), uv1,
        jnp.ones(60), jnp.ones(60, bool), CAM)

    assert int(n_in) == 60
    assert float(jnp.linalg.norm(pose.t - pose1.t)) < 1e-4
    assert float(jnp.linalg.norm(
        vel - jnp.asarray(v_w, jnp.float32))) < 1e-3
    H = np.asarray(prior2.H)
    ev = np.linalg.eigvalsh(0.5 * (H + H.T))
    assert ev.min() > -1e-2 * ev.max(), "marginalized prior not PSD"
    # the new prior is anchored at the solved current state
    np.testing.assert_allclose(np.asarray(prior2.pose.t),
                               np.asarray(pose.t))


def test_prior_carries_information_through_starved_frame(scene):
    """Two hops; hop 2 has only 3 visual points (visually starved). The
    marginalized chain must localize hop 2 far better than a fresh weak
    prior — i.e. the information from hop 1's 60 points actually carried."""
    v_w = np.array([0.5, 0.0, 0.2])
    dt = 0.05
    pre, calib = _make_hop(v_w, dt)
    info = information_from_cov(pre)
    poses = [lie.SE3(jnp.eye(3), jnp.asarray(-v_w * dt * k, jnp.float32))
             for k in range(3)]

    v0 = jnp.asarray(v_w, jnp.float32)
    prior = make_initial_prior(poses[0], v0, zero_bias())

    # hop 1: full visual support
    uv1 = _project(poses[1], scene)
    pose, vel, bias, prior, _, _ = pose_inertial_marginalized(
        prior, poses[1], v0, pre, info, calib,
        jnp.asarray(scene), uv1, jnp.ones(60), jnp.ones(60, bool), CAM)

    # hop 2: 3 points only, bad init
    starved = jnp.zeros(60, bool).at[:3].set(True)
    uv2 = _project(poses[2], scene)
    bad_init = lie.se3_boxplus(poses[2], jnp.asarray(
        [0.05, 0.05, -0.05, 0.01, -0.01, 0.01], jnp.float32))
    pose_c, vel_c, _, _, _, _ = pose_inertial_marginalized(
        prior, bad_init, vel, pre, info, calib,
        jnp.asarray(scene), uv2, jnp.ones(60), starved, CAM)
    err_carried = float(jnp.linalg.norm(pose_c.t - poses[2].t))

    # same starved hop but with a WEAK prior (information discarded)
    weak = make_initial_prior(poses[1], vel, bias,
                              pose_info=1e-2, vel_info=1e-2,
                              bias_info_g=1e-2, bias_info_a=1e-2)
    pose_w, _, _, _, _, _ = pose_inertial_marginalized(
        weak, bad_init, vel, pre, info, calib,
        jnp.asarray(scene), uv2, jnp.ones(60), starved, CAM)
    err_weak = float(jnp.linalg.norm(pose_w.t - poses[2].t))

    assert err_carried < 5e-3, err_carried
    assert err_carried < 0.5 * err_weak or err_weak < 1e-4, (
        err_carried, err_weak)


def test_bias_recovered_through_random_walk(scene):
    """A constant gyro/acc bias in the measurements must flow into the
    per-frame bias estimate over several hops (the RW edges let it move)."""
    v_w = np.array([0.3, 0.0, 0.1])
    dt = 0.05
    true_bias = ImuBias(jnp.asarray([0.01, -0.02, 0.015], jnp.float32),
                        jnp.asarray([0.05, 0.08, -0.06], jnp.float32))
    pre, calib = _make_hop(v_w, dt, bias=true_bias)
    info = information_from_cov(pre)

    pose_k = lie.se3_identity()
    vel_k = jnp.asarray(v_w, jnp.float32)
    prior = make_initial_prior(pose_k, vel_k, zero_bias(),
                               bias_info_g=1e2, bias_info_a=1e0)
    bias_est = zero_bias()
    for k in range(1, 12):
        pose_gt = lie.SE3(jnp.eye(3), jnp.asarray(-v_w * dt * k,
                                                  jnp.float32))
        uv = _project(pose_gt, scene)
        pose_k, vel_k, bias_est, prior, _, n_in = \
            pose_inertial_marginalized(
                prior, pose_gt, vel_k, pre, info, calib,
                jnp.asarray(scene), uv, jnp.ones(60), jnp.ones(60, bool),
                CAM)
        assert int(n_in) >= 55

    bg_err = float(jnp.linalg.norm(bias_est.gyro - true_bias.gyro))
    ba_err = float(jnp.linalg.norm(bias_est.acc - true_bias.acc))
    bg0 = float(jnp.linalg.norm(true_bias.gyro))
    ba0 = float(jnp.linalg.norm(true_bias.acc))
    assert bg_err < 0.5 * bg0, (bg_err, bg0)
    assert ba_err < 0.75 * ba0, (ba_err, ba0)
