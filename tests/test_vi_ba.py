"""Visual-inertial BA + IMU initialization on exact synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_fusion_tpu import cameras, lie
from orb_slam_fusion_tpu.imu.preintegration import (
    ImuBias, make_calib, preintegrate, preintegrate_host, zero_bias)
from orb_slam_fusion_tpu.imu.factors import information_from_cov
from orb_slam_fusion_tpu.solver import ba
from orb_slam_fusion_tpu.solver.vi_ba import (
    InertialFactorBatch, VIState, inertial_init, visual_inertial_ba)
from tests.test_imu import simulate_trajectory

CAM = jnp.array([400.0, 400.0, 320.0, 240.0])


def _build_vi_problem(T=1.5, kf_every=0.25, seed=0, n_pts=150):
    """Simulated body trajectory + keyframes + preintegrated windows."""
    dt = 1e-3
    accs, gyros, dts, states = simulate_trajectory(T=T, dt=dt, seed=seed)
    calib = make_calib()
    step = int(kf_every / dt)
    kf_ids = list(range(0, len(states), step))
    K = len(kf_ids)

    R_wb = np.stack([states[i][0] for i in kf_ids])
    p_wb = np.stack([states[i][1] for i in kf_ids])
    v_wb = np.stack([states[i][2] for i in kf_ids])

    # Tcw with Tbc = I: R_cw = R_wb^T, t_cw = -R_wb^T p
    R_cw = np.transpose(R_wb, (0, 2, 1))
    t_cw = -np.einsum("kij,kj->ki", R_cw, p_wb)
    poses = lie.SE3(jnp.asarray(R_cw, jnp.float32),
                    jnp.asarray(t_cw, jnp.float32))

    # preintegrate each inter-KF window (float64 host path — matches how
    # the engine integrates at frame rate)
    pres = []
    for a, b in zip(kf_ids[:-1], kf_ids[1:]):
        pres.append(preintegrate_host(
            accs[a:b], gyros[a:b], dts[a:b], zero_bias(), calib))
    pre_b = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *pres)
    info = jax.vmap(information_from_cov)(pre_b)
    P = K - 1
    ifac = InertialFactorBatch(
        i=jnp.arange(P, dtype=jnp.int32),
        j=jnp.arange(1, K, dtype=jnp.int32),
        pre=pre_b, info=info, valid=jnp.ones(P, bool))
    return poses, jnp.asarray(v_wb, jnp.float32), ifac, calib, K


class TestInertialInit:
    def test_recovers_scale_and_velocity(self):
        poses, vel_true, ifac, calib, K = _build_vi_problem()
        s_true = 2.5
        # shrink the visual poses as a mono system would (scale ambiguity)
        poses_scaled = lie.SE3(poses.R, poses.t / s_true)
        s, R_wg, bias, vel, costs = inertial_init(
            poses_scaled, ifac, calib)
        assert abs(float(s) - s_true) / s_true < 0.02, float(s)
        # gravity already aligned -> R_wg ~ I
        ang = np.arccos(np.clip(
            (np.trace(np.asarray(R_wg)) - 1) / 2, -1, 1))
        assert ang < 0.02, ang
        np.testing.assert_allclose(np.asarray(vel), np.asarray(vel_true),
                                   atol=0.05)
        assert np.abs(np.asarray(bias.gyro)).max() < 5e-3
        assert np.abs(np.asarray(bias.acc)).max() < 5e-2

    def test_recovers_gravity_direction(self):
        poses, vel_true, ifac, calib, K = _build_vi_problem(seed=3)
        # tilt the visual world: the true gravity in this frame is Rot @ g0
        Rot = np.asarray(lie.so3_exp(jnp.array([0.15, -0.1, 0.0])))
        R_cw = np.asarray(poses.R) @ Rot.T  # x_c = R_cw' (Rot x_w) + t
        poses_tilt = lie.SE3(jnp.asarray(R_cw, jnp.float32), poses.t)
        # positions in tilted world: p' = Rot p
        p_w = -np.einsum("kji,kj->ki", R_cw, np.asarray(poses.t))
        s, R_wg, bias, vel, costs = inertial_init(
            lie.SE3(jnp.asarray(R_cw, jnp.float32),
                    jnp.asarray(-np.einsum("kij,kj->ki", R_cw,
                                           np.einsum("ij,kj->ki", Rot,
                                                     -np.einsum("kji,kj->ki", np.asarray(poses.R), np.asarray(poses.t)))),
                                jnp.float32)),
            ifac, calib, optimize_scale=False)
        # recovered gravity = R_wg g0 should equal Rot g0
        g_est = np.asarray(R_wg) @ np.array([0.0, 0.0, -9.81])
        g_true = Rot @ np.array([0.0, 0.0, -9.81])
        cos = g_est @ g_true / (np.linalg.norm(g_est) * np.linalg.norm(g_true))
        assert cos > 0.999, (g_est, g_true)


class TestVisualInertialBA:
    def test_converges_from_perturbation(self):
        poses, vel_true, ifac, calib, K = _build_vi_problem(seed=1)
        # landmarks visible from all KFs
        rng = np.random.RandomState(0)
        n_pts = 120
        # put points in front of the first camera
        pts = rng.uniform(-3, 3, (n_pts, 3)).astype(np.float32)
        pts[:, 2] = np.abs(pts[:, 2]) + 3.0
        pts_j = jnp.asarray(pts)
        kf_idx = jnp.repeat(jnp.arange(K), n_pts).astype(jnp.int32)
        mp_idx = jnp.tile(jnp.arange(n_pts), K).astype(jnp.int32)
        pc = lie.se3_apply(lie.SE3(poses.R[kf_idx], poses.t[kf_idx]),
                           pts_j[mp_idx])
        uv = cameras.pinhole_project(CAM, pc)
        valid = pc[:, 2] > 0.2
        fixed = jnp.zeros(K, bool).at[0].set(True)
        prob = ba.make_problem(
            poses, pts_j, kf_idx, mp_idx, uv, jnp.ones(uv.shape[0]),
            valid, fixed, CAM, max_obs=K)

        # perturb states
        dxi = 0.02 * rng.randn(K, 6).astype(np.float32)
        dxi[0] = 0
        state0 = VIState(
            poses=lie.se3_boxplus(poses, jnp.asarray(dxi)),
            vel=jnp.asarray(vel_true) + 0.1 * jnp.asarray(
                rng.randn(K, 3), jnp.float32),
            bg=jnp.zeros((K, 3)) + 0.005,
            ba=jnp.zeros((K, 3)) + 0.05,
        )
        prob = prob._replace(
            points=pts_j + 0.05 * jnp.asarray(rng.randn(n_pts, 3),
                                              jnp.float32))

        state, points, costs = visual_inertial_ba(
            state0, prob, ifac, calib, fixed_pose=fixed)
        costs = np.asarray(costs)
        # the floor is the (huge-information-weighted) discretization
        # residual between the simulation integrator and preintegration,
        # not zero — check state recovery, not absolute cost
        assert costs[-1] < costs[0] * 0.25, costs
        rel = lie.se3_compose(state.poses, lie.se3_inverse(poses))
        errs = np.asarray(jax.vmap(lie.se3_log)(rel))
        assert np.abs(errs).max() < 5e-3, np.abs(errs).max()
        verr = np.abs(np.asarray(state.vel) - np.asarray(vel_true)).max()
        assert verr < 0.05, verr
        assert np.abs(np.asarray(state.bg)).max() < 5e-3
