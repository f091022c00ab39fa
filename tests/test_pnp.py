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

    def test_degenerate_fails(self):
        # all points coplanar AND collinear-ish with few valid -> no success
        X = jnp.zeros((30, 3)).at[:, 2].set(5.0)
        uv = jnp.broadcast_to(jnp.array([320.0, 240.0]), (30, 2))
        res = pnp_ransac(X, uv, jnp.ones(30, bool), CAM,
                         jax.random.PRNGKey(6), min_inliers=25)
        # degenerate geometry: pose is meaningless; we only require no crash
        assert np.all(np.isfinite(np.asarray(res.pose.t))) or not bool(res.ok)
