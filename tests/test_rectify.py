"""Golden tests: stereo rectification vs OpenCV on the EuRoC calibration.

The reference delegates to cv::stereoRectify / cv::initUndistortRectifyMap /
cv::remap (src/config/settings.cc:521-563, src/system.cc:271-281); these
tests hold our host-side numpy + device-side gather implementation to
OpenCV's output on the real EuRoC stereo rig numbers.
"""

import cv2
import jax.numpy as jnp
import numpy as np

from orb_slam_fusion_tpu.frontend import rectify

# EuRoC MAV stereo rig (reference settings/EuRoC.yaml)
K1 = np.array([[458.654, 0, 367.215], [0, 457.296, 248.375], [0, 0, 1]])
D1 = np.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05])
K2 = np.array([[457.587, 0, 379.999], [0, 456.134, 255.238], [0, 0, 1]])
D2 = np.array([-0.28368365, 0.07451284, -0.00010473, -3.55590700e-05])
T_C1_C2 = np.array([
    [0.999997256477797, -0.002317135723275, -0.000343393120620,
     0.110074137800478],
    [0.002312067192432, 0.999898048507103, -0.014090668452683,
     -0.000156612054392],
    [0.000376008102320, 0.014089835846691, 0.999900662638081,
     0.000889382785432],
    [0, 0, 0, 1.0]])
SIZE = (752, 480)  # (w, h)


def _relative():
    # x2 = R x1 + t  (camera1 frame -> camera2 frame) = inv(T_c1_c2)
    T21 = np.linalg.inv(T_C1_C2)
    return T21[:3, :3], T21[:3, 3]


class TestStereoRectify:
    def test_matches_opencv(self):
        R, t = _relative()
        R1, R2, P1, P2 = rectify.stereo_rectify(K1, D1, K2, D2, R, t, SIZE)
        cvR1, cvR2, cvP1, cvP2, _, _, _ = cv2.stereoRectify(
            K1, D1, K2, D2, SIZE, R, t.reshape(3, 1),
            flags=cv2.CALIB_ZERO_DISPARITY, alpha=-1, newImageSize=SIZE)
        np.testing.assert_allclose(R1, cvR1, atol=1e-8)
        np.testing.assert_allclose(R2, cvR2, atol=1e-8)
        # principal point agrees to ~0.01 px (OpenCV's internal corner
        # undistortion stops at a looser tolerance than ours)
        np.testing.assert_allclose(P1, cvP1, atol=2e-2)
        np.testing.assert_allclose(P2, cvP2, atol=2e-2)

    def test_map_matches_opencv(self):
        R, t = _relative()
        R1, R2, P1, P2 = rectify.stereo_rectify(K1, D1, K2, D2, R, t, SIZE)
        for K, D, Rr, P in ((K1, D1, R1, P1), (K2, D2, R2, P2)):
            m = rectify.rectify_map(K, D, Rr, P[:3, :3], SIZE)
            mx, my = cv2.initUndistortRectifyMap(
                K, D, Rr, P[:3, :3], SIZE, cv2.CV_32FC1)
            np.testing.assert_allclose(m[..., 0], mx, atol=2e-3)
            np.testing.assert_allclose(m[..., 1], my, atol=2e-3)

    def test_remap_matches_opencv(self):
        rng = np.random.RandomState(3)
        img = rng.rand(480, 752).astype(np.float32) * 255
        img = cv2.GaussianBlur(img, (7, 7), 2.0)  # smooth so interp error
        # differences stay sub-pixel-noise sized
        R, t = _relative()
        R1, _, P1, _ = rectify.stereo_rectify(K1, D1, K2, D2, R, t, SIZE)
        m = rectify.rectify_map(K1, D1, R1, P1[:3, :3], SIZE)
        ours = np.asarray(rectify.remap_bilinear(jnp.asarray(img),
                                                 jnp.asarray(m)))
        ref = cv2.remap(img, m[..., 0], m[..., 1], cv2.INTER_LINEAR,
                        borderMode=cv2.BORDER_CONSTANT, borderValue=0)
        # cv uses fixed-point 5-bit interpolation weights -> small quantization
        assert np.abs(ours - ref).max() < 1.0
        assert np.abs(ours - ref).mean() < 0.05

    def test_row_alignment(self):
        """The point of rectification: corresponding observations land on
        the same row. Project a 3D point into both raw cameras, remap the
        pixels through the rectification, rows must agree."""
        R, t = _relative()
        R1, R2, P1, P2 = rectify.stereo_rectify(K1, D1, K2, D2, R, t, SIZE)
        rng = np.random.RandomState(0)
        X1 = rng.uniform(-1, 1, (64, 3))
        X1[:, 2] = rng.uniform(2.0, 8.0, 64)   # in camera-1 frame
        X2 = X1 @ R.T + t

        def raw_project(K, D, X):
            xn = X[:, :2] / X[:, 2:3]
            k1, k2, p1, p2 = D
            r2 = (xn ** 2).sum(-1)
            rad = 1 + r2 * (k1 + k2 * r2)
            xd = xn[:, 0] * rad + 2 * p1 * xn[:, 0] * xn[:, 1] \
                + p2 * (r2 + 2 * xn[:, 0] ** 2)
            yd = xn[:, 1] * rad + p1 * (r2 + 2 * xn[:, 1] ** 2) \
                + 2 * p2 * xn[:, 0] * xn[:, 1]
            return np.stack([K[0, 0] * xd + K[0, 2],
                             K[1, 1] * yd + K[1, 2]], -1)

        def rectified(P, Rr, X):
            Xr = X @ np.asarray(Rr).T
            return np.stack([P[0, 0] * Xr[:, 0] / Xr[:, 2] + P[0, 2],
                             P[1, 1] * Xr[:, 1] / Xr[:, 2] + P[1, 2]], -1)

        uv1 = rectified(P1, R1, X1)
        uv2 = rectified(P2, R2, X2)
        np.testing.assert_allclose(uv1[:, 1], uv2[:, 1], atol=1e-6)
        # and the disparity matches P2's baseline term
        bf = -P2[0, 3]
        disp = uv1[:, 0] - uv2[:, 0]
        z = X1 @ np.asarray(R1)[2]  # rectified depth
        np.testing.assert_allclose(disp * z, np.full(64, bf), rtol=1e-6)
        # raw projections are consistent with the rectify maps: remapping
        # the rectified pixel through the map gives the raw pixel
        m1 = rectify.rectify_map(K1, D1, R1, P1[:3, :3], SIZE)
        raw1 = raw_project(K1, D1, X1)
        ix = np.clip(np.round(uv1[:, 0]).astype(int), 0, SIZE[0] - 1)
        iy = np.clip(np.round(uv1[:, 1]).astype(int), 0, SIZE[1] - 1)
        src = m1[iy, ix]
        assert np.median(np.abs(src - raw1)) < 1.5  # nearest-pixel sampling
