"""Unit tests for camera models and triangulation."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_fusion_tpu import cameras, lie

PINHOLE_PARAMS = jnp.array([458.654, 457.296, 367.215, 248.375])  # EuRoC-like
KB8_PARAMS = jnp.array(
    [190.97847, 190.9733, 254.93170, 256.89742,
     0.0034823894, 0.00077133023, -0.0000034, 0.00000069]
)  # TUM-VI-like fisheye


def _rand_points(key, n=64):
    p = jax.random.uniform(key, (n, 3), minval=-1.0, maxval=1.0)
    return p.at[:, 2].set(jax.random.uniform(key, (n,), minval=0.5, maxval=5.0))


class TestPinhole:
    def test_project_unproject(self):
        key = jax.random.PRNGKey(0)
        xyz = _rand_points(key)
        uv = cameras.pinhole_project(PINHOLE_PARAMS, xyz)
        rays = cameras.pinhole_unproject(PINHOLE_PARAMS, uv)
        # rays should be proportional to xyz
        expected = xyz / xyz[:, 2:3]
        np.testing.assert_allclose(np.asarray(rays), np.asarray(expected), atol=1e-4)

    def test_jacobian_matches_autodiff(self):
        key = jax.random.PRNGKey(1)
        xyz = _rand_points(key, 16)
        J = cameras.pinhole_project_jac(PINHOLE_PARAMS, xyz)
        J_auto = jax.vmap(jax.jacfwd(lambda p: cameras.pinhole_project(PINHOLE_PARAMS, p)))(xyz)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto), atol=1e-3)


class TestKB8:
    def test_project_unproject(self):
        key = jax.random.PRNGKey(2)
        xyz = _rand_points(key)
        uv = cameras.kb8_project(KB8_PARAMS, xyz)
        rays = cameras.kb8_unproject(KB8_PARAMS, uv)
        expected = xyz / xyz[:, 2:3]
        np.testing.assert_allclose(np.asarray(rays), np.asarray(expected), atol=1e-3)

    def test_jacobian_matches_autodiff(self):
        key = jax.random.PRNGKey(3)
        xyz = _rand_points(key, 16)
        J = cameras.kb8_project_jac(KB8_PARAMS, xyz)
        J_auto = jax.vmap(jax.jacfwd(lambda p: cameras.kb8_project(KB8_PARAMS, p)))(xyz)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto), rtol=1e-3, atol=1e-3)

    def test_wide_angle(self):
        # fisheye handles points at > 90 deg off axis
        xyz = jnp.array([[2.0, 0.0, 0.5], [0.0, 3.0, 0.2]])
        uv = cameras.kb8_project(KB8_PARAMS, xyz)
        assert np.all(np.isfinite(np.asarray(uv)))


class TestTriangulation:
    def _setup(self, key, n=32):
        pts = _rand_points(key, n) + jnp.array([0.0, 0.0, 2.0])
        # camera 2 displaced to the right with slight rotation
        T21 = lie.SE3(
            lie.so3_exp(jnp.array([0.01, -0.03, 0.02])),
            jnp.array([-0.2, 0.01, 0.005]),
        )
        p2 = lie.se3_apply(T21, pts)
        ray1 = pts / pts[:, 2:3]
        ray2 = p2 / p2[:, 2:3]
        return pts, ray1, ray2, T21

    def test_dlt(self):
        # fp32 4x4 SVD is only coarsely accurate — DLT is an initializer.
        pts, ray1, ray2, T21 = self._setup(jax.random.PRNGKey(4))
        X = cameras.triangulate_dlt(ray1, ray2, T21.R, T21.t)
        np.testing.assert_allclose(np.asarray(X), np.asarray(pts), atol=0.15)

    def test_midpoint(self):
        pts, ray1, ray2, T21 = self._setup(jax.random.PRNGKey(5))
        X = cameras.triangulate_midpoint(ray1, ray2, T21.R, T21.t)
        np.testing.assert_allclose(np.asarray(X), np.asarray(pts), atol=1e-2)

    def test_refined(self):
        pts, ray1, ray2, T21 = self._setup(jax.random.PRNGKey(6))
        X = cameras.triangulate(ray1, ray2, T21.R, T21.t)
        np.testing.assert_allclose(np.asarray(X), np.asarray(pts), atol=2e-3)


class TestRadTanUndistort:
    """Radial-tangential undistortion (reference Frame::UndistortKeyPoints)."""

    DIST = jnp.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05])
    # EuRoC cam0 plumb-bob coefficients

    def _distorted_pixels(self, key, n=200):
        # normalized points well inside the FOV, distort, map through K
        xy = jax.random.uniform(key, (n, 2), minval=-0.55, maxval=0.55)
        xyd = cameras.radtan_distort_normalized(self.DIST, xy)
        fx, fy, cx, cy = [float(v) for v in PINHOLE_PARAMS]
        uv_d = jnp.stack([xyd[:, 0] * fx + cx, xyd[:, 1] * fy + cy], axis=-1)
        uv_true = jnp.stack([xy[:, 0] * fx + cx, xy[:, 1] * fy + cy], axis=-1)
        return uv_d, uv_true

    def test_round_trip(self):
        uv_d, uv_true = self._distorted_pixels(jax.random.PRNGKey(7))
        uv = cameras.undistort_points(PINHOLE_PARAMS, self.DIST, uv_d)
        np.testing.assert_allclose(np.asarray(uv), np.asarray(uv_true),
                                   atol=5e-2)  # pixels

    def test_matches_opencv(self):
        import cv2

        uv_d, _ = self._distorted_pixels(jax.random.PRNGKey(8))
        uv = np.asarray(cameras.undistort_points(
            PINHOLE_PARAMS, self.DIST, uv_d))
        fx, fy, cx, cy = [float(v) for v in PINHOLE_PARAMS]
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)
        ref = cv2.undistortPoints(
            np.asarray(uv_d, np.float64).reshape(-1, 1, 2),
            K, np.asarray(self.DIST, np.float64), P=K).reshape(-1, 2)
        np.testing.assert_allclose(uv, ref, atol=5e-2)

    def test_zero_distortion_is_identity(self):
        uv = jnp.array([[10.0, 20.0], [300.0, 400.0]])
        out = cameras.undistort_points(PINHOLE_PARAMS, jnp.zeros(4), uv)
        np.testing.assert_allclose(np.asarray(out), np.asarray(uv), atol=1e-5)
