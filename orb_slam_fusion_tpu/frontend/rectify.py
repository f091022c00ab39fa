"""Stereo rectification for unrectified pinhole rigs.

TPU-native split of the reference's rectification path:

* `Settings::precomputeRectificationMaps` (reference:
  src/config/settings.cc:521-563) — `cv::stereoRectify` (Bouguet's
  algorithm, CALIB_ZERO_DISPARITY, alpha=-1) + `cv::initUndistortRectifyMap`
  — happens ONCE at configuration load. Here it is plain fp64 numpy on the
  host (`stereo_rectify`, `rectify_map`): no reason to burn device cycles.
* `System::TrackStereo`'s per-frame `cv::remap` (reference:
  src/system.cc:271-281) is the per-frame hot part: here it is a jitted
  bilinear gather (`remap_bilinear`) that fuses into the extraction program
  on device — both images remap as one batched dispatch.

The rectified rig is an ideal row-aligned pinhole pair: new intrinsics come
from P1 and the tracker's plain rectified-row stereo matcher applies.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _rodrigues(r: np.ndarray) -> np.ndarray:
    """Rotation vector -> matrix (fp64)."""
    th = float(np.linalg.norm(r))
    if th < 1e-12:
        return np.eye(3)
    k = r / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def _rodrigues_inv(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> vector (fp64)."""
    c = np.clip((np.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    th = float(np.arccos(c))
    if th < 1e-12:
        return np.zeros(3)
    w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return w * (th / (2.0 * np.sin(th)))


def _undistort_normalized_np(K: np.ndarray, D: np.ndarray, uv: np.ndarray,
                             iters: int = 20) -> np.ndarray:
    """Pixel -> undistorted normalized coords, fixed-point inverse (numpy)."""
    k1, k2, p1, p2 = [float(v) for v in D[:4]]
    xd = (uv[:, 0] - K[0, 2]) / K[0, 0]
    yd = (uv[:, 1] - K[1, 2]) / K[1, 1]
    x, y = xd.copy(), yd.copy()
    for _ in range(iters):
        r2 = x * x + y * y
        rad = 1.0 + r2 * (k1 + k2 * r2)
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (xd - dx) / rad
        y = (yd - dy) / rad
    return np.stack([x, y], axis=-1)


def stereo_rectify(K1: np.ndarray, D1: np.ndarray, K2: np.ndarray,
                   D2: np.ndarray, R: np.ndarray, t: np.ndarray,
                   size: Tuple[int, int]
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Bouguet stereo rectification (cv::stereoRectify semantics with
    CALIB_ZERO_DISPARITY, alpha=-1, newImageSize == size).

    R, t: x2 = R @ x1 + t (points from camera-1 frame into camera-2 frame).
    size: (width, height).
    Returns (R1, R2, P1, P2): per-camera rectifying rotations and 3x4 new
    projection matrices.
    """
    w, h = size
    # split the relative rotation evenly between the two cameras
    om = _rodrigues_inv(np.asarray(R, np.float64))
    r_r = _rodrigues(om * -0.5)
    tt = r_r @ np.asarray(t, np.float64).reshape(3)

    # rotate the baseline onto the x (or y) axis
    idx = 0 if abs(tt[0]) > abs(tt[1]) else 1
    uu = np.zeros(3)
    uu[idx] = 1.0 if tt[idx] > 0 else -1.0
    ww = np.cross(tt, uu)
    nw = np.linalg.norm(ww)
    nt = np.linalg.norm(tt)
    if nw > 0.0:
        ww *= np.arccos(abs(tt[idx]) / nt) / nw
    wR = _rodrigues(ww)
    R1 = wR @ r_r.T
    R2 = wR @ r_r
    tnew = R2 @ np.asarray(t, np.float64).reshape(3)

    # common focal length: mean of the vertical focals (OpenCV >= 5
    # semantics; earlier OpenCV used min with a radial-distortion shrink)
    fc_new = 0.5 * (float(np.asarray(K1, np.float64)[1, 1])
                    + float(np.asarray(K2, np.float64)[1, 1]))

    # principal points from the undistorted+rotated image corners
    cc_new = []
    corners = np.array([[0, 0], [w - 1, 0], [0, h - 1], [w - 1, h - 1]],
                       np.float64)
    for K, D, Rk in ((K1, D1, R1), (K2, D2, R2)):
        xy = _undistort_normalized_np(np.asarray(K, np.float64),
                                      np.asarray(D, np.float64), corners)
        X = np.concatenate([xy, np.ones((4, 1))], axis=1) @ np.asarray(
            Rk, np.float64).T
        pu = fc_new * X[:, 0] / X[:, 2]
        pv = fc_new * X[:, 1] / X[:, 2]
        cc_new.append(np.array([(w - 1) * 0.5 - pu.mean(),
                                (h - 1) * 0.5 - pv.mean()]))
    # CALIB_ZERO_DISPARITY: identical principal points
    cc = (cc_new[0] + cc_new[1]) * 0.5

    P1 = np.array([[fc_new, 0, cc[0], 0],
                   [0, fc_new, cc[1], 0],
                   [0, 0, 1, 0]], np.float64)
    P2 = P1.copy()
    P2[idx, 3] = tnew[idx] * fc_new
    return R1, R2, P1, P2


def rectify_map(K: np.ndarray, D: np.ndarray, R_rect: np.ndarray,
                K_new: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Per-pixel source coordinates for remapping one camera
    (cv::initUndistortRectifyMap semantics). Returns (H, W, 2) float32 of
    raw-image (x, y) for every rectified pixel."""
    w, h = size
    K = np.asarray(K, np.float64)
    D = np.asarray(D, np.float64)
    u, v = np.meshgrid(np.arange(w, dtype=np.float64),
                       np.arange(h, dtype=np.float64))
    x = (u - K_new[0, 2]) / K_new[0, 0]
    y = (v - K_new[1, 2]) / K_new[1, 1]
    X = np.stack([x, y, np.ones_like(x)], axis=-1) @ np.asarray(
        R_rect, np.float64)  # == R_rect^T applied to each vector
    xn = X[..., 0] / X[..., 2]
    yn = X[..., 1] / X[..., 2]
    k1, k2, p1, p2 = [float(c) for c in D[:4]]
    r2 = xn * xn + yn * yn
    rad = 1.0 + r2 * (k1 + k2 * r2)
    xd = xn * rad + 2 * p1 * xn * yn + p2 * (r2 + 2 * xn * xn)
    yd = yn * rad + p1 * (r2 + 2 * yn * yn) + 2 * p2 * xn * yn
    mx = K[0, 0] * xd + K[0, 2]
    my = K[1, 1] * yd + K[1, 2]
    return np.stack([mx, my], axis=-1).astype(np.float32)


@jax.jit
def remap_bilinear(img: jnp.ndarray, map_xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear image resampling on device (cv::remap INTER_LINEAR with
    BORDER_CONSTANT 0). img (H, W) or (..., H, W); map_xy (H', W', 2)."""
    h, w = img.shape[-2], img.shape[-1]
    x = map_xy[..., 0]
    y = map_xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi = jnp.clip(xi, 0, w - 1)
        yi = jnp.clip(yi, 0, h - 1)
        return jnp.where(inb, img[..., yi, xi], 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


@functools.partial(jax.jit)
def remap_stereo_pair(imgL: jnp.ndarray, imgR: jnp.ndarray,
                      mapL: jnp.ndarray, mapR: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Both remaps in one dispatch (the reference spends two cv::remap
    calls per frame, system.cc:271-281)."""
    return remap_bilinear(imgL, mapL), remap_bilinear(imgR, mapR)
