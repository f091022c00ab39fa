"""Batched camera models: Pinhole and Kannala-Brandt-8 fisheye.

TPU-native replacement for the reference's GeometricCamera hierarchy
(reference: include/cam/camera_models/geometric_camera.h:42-113,
src/cam/camera_models/{pinhole,kannalabrandt8}_model.cc). Instead of virtual
dispatch over per-point calls, each model is a set of pure functions over
``(..., 3)`` point batches plus a flat parameter vector, selected statically
at trace time (camera model choice is config, not data — no dynamic dispatch
inside jit).

Parameter layouts
-----------------
* Pinhole: ``[fx, fy, cx, cy]``
* KannalaBrandt8: ``[fx, fy, cx, cy, k1, k2, k3, k4]`` (equidistant
  distortion: d(theta) = theta + k1 th^3 + k2 th^5 + k3 th^7 + k4 th^9)

All functions broadcast over leading batch dims and are differentiable.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

PINHOLE = "pinhole"
KANNALA_BRANDT8 = "kannala_brandt8"

_EPS = 1e-9


# ---------------------------------------------------------------------------
# Pinhole
# ---------------------------------------------------------------------------


def pinhole_project(params: jnp.ndarray, xyz: jnp.ndarray) -> jnp.ndarray:
    """Project camera-frame points (...,3) -> pixels (...,2).

    Reference semantics: Pinhole::project (pinhole_model.cc).
    """
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    z = xyz[..., 2]
    zi = 1.0 / jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    u = fx * xyz[..., 0] * zi + cx
    v = fy * xyz[..., 1] * zi + cy
    return jnp.stack([u, v], axis=-1)


def pinhole_project_jac(params: jnp.ndarray, xyz: jnp.ndarray) -> jnp.ndarray:
    """Analytic d(uv)/d(xyz): (..., 2, 3).

    Reference semantics: Pinhole::projectJac.
    """
    fx, fy = params[0], params[1]
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    zi = 1.0 / jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    zi2 = zi * zi
    zero = jnp.zeros_like(x)
    row0 = jnp.stack([fx * zi, zero, -fx * x * zi2], axis=-1)
    row1 = jnp.stack([zero, fy * zi, -fy * y * zi2], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def pinhole_unproject(params: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixels (...,2) -> unit-depth bearing rays (...,3) with z=1."""
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


# ---------------------------------------------------------------------------
# Kannala-Brandt 8 (fisheye, equidistant model)
# ---------------------------------------------------------------------------


def kb8_project(params: jnp.ndarray, xyz: jnp.ndarray) -> jnp.ndarray:
    """KB8 fisheye projection (...,3) -> (...,2).

    Reference semantics: KannalaBrandt8::project
    (src/cam/camera_models/kannalabrandt8_model.cc).
    """
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    k1, k2, k3, k4 = params[4], params[5], params[6], params[7]
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    r2 = x * x + y * y
    r = jnp.sqrt(jnp.maximum(r2, _EPS * _EPS))
    theta = jnp.arctan2(r, z)
    th2 = theta * theta
    d = theta * (1.0 + th2 * (k1 + th2 * (k2 + th2 * (k3 + th2 * k4))))
    scale = d / r
    u = fx * scale * x + cx
    v = fy * scale * y + cy
    return jnp.stack([u, v], axis=-1)


def kb8_project_jac(params: jnp.ndarray, xyz: jnp.ndarray) -> jnp.ndarray:
    """Analytic d(uv)/d(xyz) for KB8: (..., 2, 3).

    Derived symbolically (matches KannalaBrandt8::projectJac semantics,
    kannalabrandt8_model.cc).
    """
    fx, fy = params[0], params[1]
    k1, k2, k3, k4 = params[4], params[5], params[6], params[7]
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    r2 = x * x + y * y
    r = jnp.sqrt(jnp.maximum(r2, _EPS * _EPS))
    r3 = r2 * r
    theta = jnp.arctan2(r, z)
    th2 = theta * theta
    d = theta * (1.0 + th2 * (k1 + th2 * (k2 + th2 * (k3 + th2 * k4))))
    dd_dth = 1.0 + th2 * (3 * k1 + th2 * (5 * k2 + th2 * (7 * k3 + th2 * 9 * k4)))
    # clamped r in every division so the Jacobian stays FINITE at the
    # degenerate point pc=(0,0,0) (padded table slots project there; masked
    # rows must never produce NaN — 0 * NaN poisons weighted reductions)
    norm2 = r * r + z * z
    dth_dr = z / norm2
    dth_dz = -r / norm2

    # u = fx * d(theta(x,y,z)) * x / r(x,y)
    dr_dx = x / r
    dr_dy = y / r
    dscale_dr = (dd_dth * dth_dr * r - d) / (r * r)
    dscale_dz = dd_dth * dth_dz / r
    scale = d / r

    du_dx = fx * (dscale_dr * dr_dx * x + scale)
    du_dy = fx * (dscale_dr * dr_dy * x)
    du_dz = fx * dscale_dz * x
    dv_dx = fy * (dscale_dr * dr_dx * y)
    dv_dy = fy * (dscale_dr * dr_dy * y + scale)
    dv_dz = fy * dscale_dz * y

    row0 = jnp.stack([du_dx, du_dy, du_dz], axis=-1)
    row1 = jnp.stack([dv_dx, dv_dy, dv_dz], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def kb8_unproject(params: jnp.ndarray, uv: jnp.ndarray,
                  num_iters: int = 10) -> jnp.ndarray:
    """KB8 unprojection via fixed-count Newton iteration on theta.

    The reference runs a data-dependent Newton loop with early exit
    (kannalabrandt8_model.cc unproject); here the iteration count is static
    (10) so the whole op stays inside one XLA program — the extra iterations
    are vectorized and essentially free on the VPU.
    Returns unit-depth rays (z=1 convention, matching the reference).
    """
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    k1, k2, k3, k4 = params[4], params[5], params[6], params[7]
    mx = (uv[..., 0] - cx) / fx
    my = (uv[..., 1] - cy) / fy
    rd = jnp.sqrt(mx * mx + my * my)  # distorted radius = d(theta)
    rd = jnp.minimum(rd, jnp.pi / 2.0)  # clamp like the reference

    def body(_, th):
        th2 = th * th
        d = th * (1.0 + th2 * (k1 + th2 * (k2 + th2 * (k3 + th2 * k4))))
        dd = 1.0 + th2 * (3 * k1 + th2 * (5 * k2 + th2 * (7 * k3 + th2 * 9 * k4)))
        return th - (d - rd) / dd

    theta = jax.lax.fori_loop(0, num_iters, body, rd)
    scale = jnp.where(rd > _EPS, jnp.tan(theta) / jnp.maximum(rd, _EPS), 1.0)
    return jnp.stack([mx * scale, my * scale, jnp.ones_like(mx)], axis=-1)


# ---------------------------------------------------------------------------
# Static dispatch
# ---------------------------------------------------------------------------


def project(model: str, params: jnp.ndarray, xyz: jnp.ndarray) -> jnp.ndarray:
    if model == PINHOLE:
        return pinhole_project(params, xyz)
    if model == KANNALA_BRANDT8:
        return kb8_project(params, xyz)
    raise ValueError(f"unknown camera model {model!r}")


def project_jac(model: str, params: jnp.ndarray, xyz: jnp.ndarray) -> jnp.ndarray:
    if model == PINHOLE:
        return pinhole_project_jac(params, xyz)
    if model == KANNALA_BRANDT8:
        return kb8_project_jac(params, xyz)
    raise ValueError(f"unknown camera model {model!r}")


def unproject(model: str, params: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    if model == PINHOLE:
        return pinhole_unproject(params, uv)
    if model == KANNALA_BRANDT8:
        return kb8_unproject(params, uv)
    raise ValueError(f"unknown camera model {model!r}")


# ---------------------------------------------------------------------------
# Triangulation (batched DLT)
# ---------------------------------------------------------------------------


def triangulate_dlt(ray1: jnp.ndarray, ray2: jnp.ndarray,
                    R21: jnp.ndarray, t21: jnp.ndarray) -> jnp.ndarray:
    """Batched two-view DLT triangulation.

    Given normalized bearing rays in camera 1 and camera 2 and the relative
    pose of camera 1 in camera 2 (x2 = R21 x1 + t21), return 3D points in
    camera-1 frame. Replaces GeometricTools::Triangulate
    (src/utils/geometric_tools.cc) — but solves the 4x4 DLT system with a
    closed-form smallest-eigenvector via solving the normal equations, which
    batches cleanly (jnp.linalg.svd on (...,4,4) also works and is used here
    for robustness; XLA batches it).

    ray1, ray2: (..., 3) with z=1 normalization; R21: (..., 3, 3) or (3,3);
    t21: (..., 3) or (3,).
    """
    # Projection matrices: P1 = [I | 0], P2 = [R21 | t21]
    x1, y1 = ray1[..., 0], ray1[..., 1]
    x2, y2 = ray2[..., 0], ray2[..., 1]
    batch = jnp.broadcast_shapes(ray1.shape[:-1], ray2.shape[:-1],
                                 R21.shape[:-2], t21.shape[:-1])
    R = jnp.broadcast_to(R21, batch + (3, 3))
    t = jnp.broadcast_to(t21, batch + (3,))
    x1 = jnp.broadcast_to(x1, batch)
    y1 = jnp.broadcast_to(y1, batch)
    x2 = jnp.broadcast_to(x2, batch)
    y2 = jnp.broadcast_to(y2, batch)

    zeros = jnp.zeros(batch, dtype=ray1.dtype)
    ones = jnp.ones(batch, dtype=ray1.dtype)
    # Rows of A (4x4): [x1*P1_3 - P1_1 ; y1*P1_3 - P1_2 ; same for view 2]
    P1_rows = [
        jnp.stack([-ones, zeros, x1, zeros], axis=-1),
        jnp.stack([zeros, -ones, y1, zeros], axis=-1),
    ]
    P2_1 = jnp.concatenate([R[..., 0, :], t[..., 0:1]], axis=-1)
    P2_2 = jnp.concatenate([R[..., 1, :], t[..., 1:2]], axis=-1)
    P2_3 = jnp.concatenate([R[..., 2, :], t[..., 2:3]], axis=-1)
    P2_rows = [
        x2[..., None] * P2_3 - P2_1,
        y2[..., None] * P2_3 - P2_2,
    ]
    A = jnp.stack(P1_rows + P2_rows, axis=-2)  # (..., 4, 4)
    # Smallest right singular vector.
    _, _, vt = jnp.linalg.svd(A)
    Xh = vt[..., 3, :]
    w = Xh[..., 3]
    w = jnp.where(jnp.abs(w) < _EPS, _EPS, w)
    return Xh[..., :3] / w[..., None]


def triangulate_refine(X0: jnp.ndarray, ray1: jnp.ndarray, ray2: jnp.ndarray,
                       R21: jnp.ndarray, t21: jnp.ndarray,
                       iters: int = 3) -> jnp.ndarray:
    """Batched Gauss-Newton polish of triangulated points.

    Minimizes the two-view normalized-image-plane reprojection error (4
    residuals, 3 unknowns) with a fixed iteration count. In fp32 this
    recovers the accuracy the reference gets from double-precision SVD
    (geometric_tools.cc Triangulate) at a fraction of the cost — the 3x3
    normal-equation solves batch perfectly on TPU.
    """

    def body(_, X):
        # view 1: residual of X/z against ray1 (x,y)
        z1 = jnp.where(jnp.abs(X[..., 2]) < _EPS, _EPS, X[..., 2])
        r1 = X[..., :2] / z1[..., None] - ray1[..., :2]
        # d(x/z,y/z)/dX
        zi = 1.0 / z1
        zeros = jnp.zeros_like(zi)
        J1 = jnp.stack([
            jnp.stack([zi, zeros, -X[..., 0] * zi * zi], axis=-1),
            jnp.stack([zeros, zi, -X[..., 1] * zi * zi], axis=-1),
        ], axis=-2)  # (...,2,3)

        X2 = jnp.einsum("...ij,...j->...i", R21, X) + t21
        z2 = jnp.where(jnp.abs(X2[..., 2]) < _EPS, _EPS, X2[..., 2])
        r2 = X2[..., :2] / z2[..., None] - ray2[..., :2]
        zi2 = 1.0 / z2
        J2p = jnp.stack([
            jnp.stack([zi2, zeros, -X2[..., 0] * zi2 * zi2], axis=-1),
            jnp.stack([zeros, zi2, -X2[..., 1] * zi2 * zi2], axis=-1),
        ], axis=-2)
        J2 = jnp.einsum("...ij,...jk->...ik", J2p,
                        jnp.broadcast_to(R21, X.shape + (3,)))

        J = jnp.concatenate([J1, J2], axis=-2)      # (...,4,3)
        r = jnp.concatenate([r1, r2], axis=-1)      # (...,4)
        H = jnp.einsum("...ki,...kj->...ij", J, J) + 1e-9 * jnp.eye(3, dtype=X.dtype)
        g = jnp.einsum("...ki,...k->...i", J, r)
        dX = -jnp.linalg.solve(H, g[..., None])[..., 0]
        return X + dX

    return jax.lax.fori_loop(0, iters, body, X0)


def triangulate(ray1: jnp.ndarray, ray2: jnp.ndarray,
                R21: jnp.ndarray, t21: jnp.ndarray) -> jnp.ndarray:
    """Default triangulation: midpoint init + Gauss-Newton polish."""
    X0 = triangulate_midpoint(ray1, ray2, R21, t21)
    return triangulate_refine(X0, ray1, ray2, R21, t21)


def triangulate_midpoint(ray1: jnp.ndarray, ray2: jnp.ndarray,
                         R21: jnp.ndarray, t21: jnp.ndarray) -> jnp.ndarray:
    """Cheap midpoint triangulation (no SVD), for RANSAC inner loops.

    Same argument convention as `triangulate_dlt`. Finds the depths along
    both rays minimizing the midpoint distance, returns point in cam-1 frame.
    """
    # Rays in a common (cam 2) frame: d1 = R21 @ ray1, origin o1 = t21
    d1 = jnp.einsum("...ij,...j->...i", R21, ray1)
    d2 = ray2
    o1 = jnp.broadcast_to(t21, d1.shape)
    a = jnp.sum(d1 * d1, axis=-1)
    b = jnp.sum(d1 * d2, axis=-1)
    c = jnp.sum(d2 * d2, axis=-1)
    d = jnp.sum(d1 * o1, axis=-1)
    e = jnp.sum(d2 * o1, axis=-1)
    denom = a * c - b * b
    denom = jnp.where(jnp.abs(denom) < _EPS, _EPS, denom)
    s = (b * e - c * d) / denom  # depth along ray1 (in cam2 frame)
    # point in cam1 frame = s * ray1
    return s[..., None] * ray1


def radtan_distort_normalized(dist: jnp.ndarray, xy: jnp.ndarray
                              ) -> jnp.ndarray:
    """Apply radial-tangential (plumb-bob) distortion to normalized coords.

    dist = (k1, k2, p1, p2[, k3]); xy (..., 2) at z=1.
    """
    k1, k2, p1, p2 = dist[0], dist[1], dist[2], dist[3]
    k3 = dist[4] if dist.shape[0] > 4 else 0.0
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    rad = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * rad + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * rad + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(params: jnp.ndarray, dist: jnp.ndarray,
                     uv: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Undistort pixel keypoints under the radial-tangential model.

    TPU-native equivalent of Frame::UndistortKeyPoints (reference:
    src/map/frame.cc, which calls cv::undistortPoints with P=K): normalize
    by K, invert the distortion by fixed-point iteration (the same scheme
    cv::undistortPoints uses), re-apply K. Batched over all keypoints; a
    fixed iteration count keeps the shape static under jit.
    """
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    xd = (uv[..., 0] - cx) / fx
    yd = (uv[..., 1] - cy) / fy
    k1, k2, p1, p2 = dist[0], dist[1], dist[2], dist[3]
    k3 = dist[4] if dist.shape[0] > 4 else 0.0
    x, y = xd, yd
    for _ in range(iters):
        r2 = x * x + y * y
        rad = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (xd - dx) / rad
        y = (yd - dy) / rad
    return jnp.stack([x * fx + cx, y * fy + cy], axis=-1)
