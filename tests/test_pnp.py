"""PnP RANSAC and relocalization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_fusion_tpu import cameras, lie
from orb_slam_fusion_tpu.solver.pnp import pnp_ransac

CAM = jnp.array([400.0, 400.0, 320.0, 240.0])


class TestPnP:
    def test_exact(self):
        key = jax.random.PRNGKey(0)
        X = jax.random.uniform(key, (100, 3), minval=-3, maxval=3) \
            + jnp.array([0.0, 0.0, 6.0])
        pose = lie.se3_exp(jnp.array([0.2, -0.1, 0.3, 0.1, -0.05, 0.15]))
        uv = cameras.pinhole_project(CAM, lie.se3_apply(pose, X))
        res = pnp_ransac(X, uv, jnp.ones(100, bool), CAM,
                         jax.random.PRNGKey(1))
        assert bool(res.ok)
        err = lie.se3_log(lie.se3_compose(res.pose, lie.se3_inverse(pose)))
        assert np.linalg.norm(np.asarray(err)) < 1e-3
        assert int(res.n_inliers) > 95

    def test_with_outliers(self):
        key = jax.random.PRNGKey(2)
        X = jax.random.uniform(key, (120, 3), minval=-3, maxval=3) \
            + jnp.array([0.0, 0.0, 6.0])
        pose = lie.se3_exp(jnp.array([0.1, 0.2, -0.1, 0.05, 0.1, -0.05]))
        uv = cameras.pinhole_project(CAM, lie.se3_apply(pose, X))
        n_out = 40
        uv = uv.at[:n_out].add(
            80.0 * jax.random.normal(jax.random.PRNGKey(3), (n_out, 2)))
        uv = uv + 0.3 * jax.random.normal(jax.random.PRNGKey(4), uv.shape)
        res = pnp_ransac(X, uv, jnp.ones(120, bool), CAM,
                         jax.random.PRNGKey(5))
        assert bool(res.ok)
        err = lie.se3_log(lie.se3_compose(res.pose, lie.se3_inverse(pose)))
        assert np.linalg.norm(np.asarray(err)) < 5e-3
        inl = np.asarray(res.inliers)
        assert inl[:n_out].mean() < 0.2
        assert inl[n_out:].mean() > 0.85

    def test_mlpnp_refine_converges(self):
        """The null-space bearing ML estimator recovers the pose from a
        perturbed start, with no projection model in the loop."""
        from orb_slam_fusion_tpu.solver.pnp import mlpnp_refine
        key = jax.random.PRNGKey(7)
        X = jax.random.uniform(key, (80, 3), minval=-3, maxval=3) \
            + jnp.array([0.0, 0.0, 6.0])
        pose = lie.se3_exp(jnp.array([0.15, -0.2, 0.1, 0.08, -0.04, 0.1]))
        bearings = lie.se3_apply(pose, X)          # any scale: normalized
        pose0 = lie.se3_boxplus(
            pose, jnp.array([0.05, -0.04, 0.06, 0.02, 0.03, -0.02]))
        ref, cost = mlpnp_refine(pose0, X, bearings,
                                 jnp.ones(80), jnp.ones(80, bool))
        err = lie.se3_log(lie.se3_compose(ref, lie.se3_inverse(pose)))
        assert np.linalg.norm(np.asarray(err)) < 1e-4
        assert float(cost) < 1e-8

    def test_mlpnp_weighting_downweights_noisy(self):
        """Information weighting: corrupting low-weight observations moves
        the ML solution less than corrupting high-weight ones."""
        from orb_slam_fusion_tpu.solver.pnp import mlpnp_refine
        key = jax.random.PRNGKey(8)
        X = jax.random.uniform(key, (60, 3), minval=-3, maxval=3) \
            + jnp.array([0.0, 0.0, 6.0])
        pose = lie.se3_exp(jnp.array([0.1, 0.1, -0.1, 0.03, 0.02, -0.04]))
        clean = lie.se3_apply(pose, X)
        noise = 0.02 * jax.random.normal(jax.random.PRNGKey(9), (20, 3))
        bear = clean.at[:20].add(noise)
        pose0 = lie.se3_boxplus(pose, 0.03 * jnp.ones(6))
        w_lo = jnp.ones(60).at[:20].set(0.05)   # noisy obs downweighted
        w_hi = jnp.ones(60).at[:20].set(4.0)    # noisy obs upweighted
        p_lo, _ = mlpnp_refine(pose0, X, bear, w_lo, jnp.ones(60, bool))
        p_hi, _ = mlpnp_refine(pose0, X, bear, w_hi, jnp.ones(60, bool))
        e_lo = np.linalg.norm(np.asarray(lie.se3_log(
            lie.se3_compose(p_lo, lie.se3_inverse(pose)))))
        e_hi = np.linalg.norm(np.asarray(lie.se3_log(
            lie.se3_compose(p_hi, lie.se3_inverse(pose)))))
        assert e_lo < e_hi

    def test_mlpnp_fisheye_bearings(self):
        """Projection-free: works with KB8 fisheye bearings directly."""
        from orb_slam_fusion_tpu.solver.pnp import mlpnp_refine
        kb8 = jnp.array([280.0, 280.0, 320.0, 240.0,
                         -0.01, 0.02, -0.005, 0.001])
        key = jax.random.PRNGKey(10)
        X = jax.random.uniform(key, (90, 3), minval=-4, maxval=4) \
            + jnp.array([0.0, 0.0, 5.0])
        pose = lie.se3_exp(jnp.array([0.1, -0.1, 0.2, 0.05, 0.02, -0.03]))
        uv = cameras.project(cameras.KANNALA_BRANDT8, kb8,
                             lie.se3_apply(pose, X))
        rays = cameras.unproject(cameras.KANNALA_BRANDT8, kb8, uv)
        ok = np.all(np.isfinite(np.asarray(uv)), axis=1)
        pose0 = lie.se3_boxplus(
            pose, jnp.array([-0.04, 0.05, 0.03, 0.01, -0.02, 0.02]))
        ref, _ = mlpnp_refine(pose0, X, rays, jnp.ones(90),
                              jnp.asarray(ok))
        err = lie.se3_log(lie.se3_compose(ref, lie.se3_inverse(pose)))
        assert np.linalg.norm(np.asarray(err)) < 5e-3

    def test_degenerate_fails(self):
        # all points coplanar AND collinear-ish with few valid -> no success
        X = jnp.zeros((30, 3)).at[:, 2].set(5.0)
        uv = jnp.broadcast_to(jnp.array([320.0, 240.0]), (30, 2))
        res = pnp_ransac(X, uv, jnp.ones(30, bool), CAM,
                         jax.random.PRNGKey(6), min_inliers=25)
        # degenerate geometry: pose is meaningless; we only require no crash
        assert np.all(np.isfinite(np.asarray(res.pose.t))) or not bool(res.ok)
