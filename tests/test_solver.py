"""Tests for the LM solver: pose optimization and bundle adjustment."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_fusion_tpu import cameras, lie
from orb_slam_fusion_tpu.solver import pose_opt, ba

CAM = jnp.array([400.0, 400.0, 320.0, 240.0])


def _make_world(key, n_points=200, spread=4.0, depth=6.0):
    kp, _ = jax.random.split(key)
    pts = jax.random.uniform(kp, (n_points, 3), minval=-1.0, maxval=1.0)
    pts = pts * jnp.array([spread, spread, 2.0]) + jnp.array([0.0, 0.0, depth])
    return pts


class TestPoseOptimization:
    def test_converges_from_perturbed_pose(self):
        key = jax.random.PRNGKey(0)
        pts = _make_world(key)
        true_pose = lie.se3_exp(
            jnp.array([0.1, -0.2, 0.05, 0.02, -0.01, 0.03]))
        uv = cameras.pinhole_project(CAM, lie.se3_apply(true_pose, pts))
        # perturb
        pose0 = lie.se3_compose(
            lie.se3_exp(jnp.array([0.05, 0.05, -0.08, 0.02, 0.03, -0.01])),
            true_pose)
        inv_sigma2 = jnp.ones(pts.shape[0])
        valid = jnp.ones(pts.shape[0], dtype=bool)
        pose, inliers, n = pose_opt.pose_optimization(
            pose0, pts, uv, inv_sigma2, valid, CAM)
        err = lie.se3_log(lie.se3_compose(pose, lie.se3_inverse(true_pose)))
        assert np.linalg.norm(np.asarray(err)) < 1e-3
        assert int(n) == pts.shape[0]

    def test_rejects_outliers(self):
        key = jax.random.PRNGKey(1)
        pts = _make_world(key)
        true_pose = lie.se3_identity()
        uv = cameras.pinhole_project(CAM, lie.se3_apply(true_pose, pts))
        # corrupt 20% of observations badly
        n = pts.shape[0]
        n_out = n // 5
        uv = uv.at[:n_out].add(
            60.0 * jax.random.normal(jax.random.PRNGKey(2), (n_out, 2)))
        # add small noise elsewhere
        uv = uv.at[n_out:].add(
            0.3 * jax.random.normal(jax.random.PRNGKey(3), (n - n_out, 2)))
        pose0 = lie.se3_exp(jnp.array([0.03, -0.02, 0.05, 0.01, 0.01, -0.02]))
        inv_sigma2 = jnp.ones(n)
        valid = jnp.ones(n, dtype=bool)
        pose, inliers, num = pose_opt.pose_optimization(
            pose0, pts, uv, inv_sigma2, valid, CAM)
        inliers = np.asarray(inliers)
        # outliers identified
        assert inliers[:n_out].sum() < n_out * 0.2
        assert inliers[n_out:].sum() > (n - n_out) * 0.9
        err = lie.se3_log(lie.se3_compose(pose, lie.se3_inverse(true_pose)))
        assert np.linalg.norm(np.asarray(err)) < 5e-3

    def test_padding_is_inert(self):
        key = jax.random.PRNGKey(4)
        pts = _make_world(key, 64)
        true_pose = lie.se3_identity()
        uv = cameras.pinhole_project(CAM, lie.se3_apply(true_pose, pts))
        pose0 = lie.se3_exp(jnp.array([0.02, 0.01, -0.03, 0.0, 0.01, 0.0]))
        # pad with garbage
        pts_p = jnp.concatenate([pts, jnp.full((32, 3), 1e6)])
        uv_p = jnp.concatenate([uv, jnp.full((32, 2), -1e6)])
        valid = jnp.concatenate([jnp.ones(64, bool), jnp.zeros(32, bool)])
        pose, _, n = pose_opt.pose_optimization(
            pose0, pts_p, uv_p, jnp.ones(96), valid, CAM)
        err = lie.se3_log(pose)
        assert np.linalg.norm(np.asarray(err)) < 1e-3
        assert int(n) == 64


class TestBundleAdjustment:
    def _synthetic_ba(self, key, n_kf=6, n_pts=120, noise=0.5,
                      perturb=0.05):
        pts = _make_world(key, n_pts)
        # cameras on an arc looking at the cloud
        poses_true = []
        for k in range(n_kf):
            xi = jnp.array([0.3 * k, 0.02 * k, 0.0, 0.0, 0.05 * k, 0.0])
            poses_true.append(lie.se3_exp(xi))
        poses_true = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *poses_true)

        kf_idx = jnp.repeat(jnp.arange(n_kf), n_pts).astype(jnp.int32)
        mp_idx = jnp.tile(jnp.arange(n_pts), n_kf).astype(jnp.int32)
        pc = lie.se3_apply(
            lie.SE3(poses_true.R[kf_idx], poses_true.t[kf_idx]),
            pts[mp_idx])
        uv = cameras.pinhole_project(CAM, pc)
        uv = uv + noise * jax.random.normal(jax.random.PRNGKey(7), uv.shape)
        valid = jnp.ones(uv.shape[0], dtype=bool)

        # perturb initial estimates (keep pose 0 fixed as gauge)
        kp1, kp2 = jax.random.split(jax.random.PRNGKey(8))
        dxi = perturb * jax.random.normal(kp1, (n_kf, 6))
        dxi = dxi.at[0].set(0.0).at[1].set(0.0)
        poses0 = lie.se3_boxplus(poses_true, dxi)
        pts0 = pts + 0.1 * jax.random.normal(kp2, pts.shape)

        # Fix two poses: one for the SE3 gauge, a second to pin the
        # monocular scale gauge (otherwise error is only defined up to Sim3).
        fixed = jnp.zeros(n_kf, bool).at[0].set(True).at[1].set(True)
        prob = ba.make_problem(
            poses0, pts0, kf_idx, mp_idx, uv, jnp.ones(uv.shape[0]),
            valid, fixed, CAM)
        return prob, poses_true, pts

    def test_ba_converges(self):
        prob, poses_true, pts_true = self._synthetic_ba(
            jax.random.PRNGKey(5), noise=0.0)
        poses, points, inlier, costs = ba.bundle_adjustment(prob)
        # pose error
        rel = lie.se3_compose(poses, lie.se3_inverse(poses_true))
        errs = np.asarray(jax.vmap(lie.se3_log)(rel))
        assert np.abs(errs).max() < 1e-3, errs
        pt_err = np.abs(np.asarray(points - pts_true)).max()
        assert pt_err < 5e-3, pt_err

    def test_ba_with_noise_reduces_cost(self):
        prob, _, _ = self._synthetic_ba(jax.random.PRNGKey(6), noise=0.5)
        poses, points, inlier, costs = ba.bundle_adjustment(prob)
        costs = np.asarray(costs)
        assert costs[-1] < costs[0] * 0.5
        assert np.asarray(inlier).mean() > 0.95

    def test_fixed_pose_stays_fixed(self):
        prob, poses_true, _ = self._synthetic_ba(jax.random.PRNGKey(9))
        poses, _, _, _ = ba.bundle_adjustment(prob)
        np.testing.assert_allclose(
            np.asarray(poses.R[0]), np.asarray(prob.poses.R[0]), atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(poses.t[0]), np.asarray(prob.poses.t[0]), atol=1e-7)
