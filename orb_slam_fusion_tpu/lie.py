"""Batched Lie-group operations for TPU: SO(3), SE(3), Sim(3).

This is the math core (layer L0) of the TPU-native SLAM engine — the
functional, batch-first replacement for the reference's header-only Sophus
library (reference: 3rdparty/Sophus/sophus/{so3,se3,sim3}.hpp). Every function
here broadcasts over arbitrary leading batch dimensions and is jit/vmap/grad
compatible, so entire keyframe tables can be transformed in one fused XLA op
instead of per-object C++ calls.

Conventions
-----------
* Rotations are 3x3 matrices with shape ``(..., 3, 3)``.
* SE(3) is a pytree pair ``(R, t)`` with ``R: (..., 3, 3)``, ``t: (..., 3)``;
  the transform acts on points as ``x' = R @ x + t``.
* SE(3) tangent vectors are ``[v, w]`` (translation first, rotation last),
  matching Sophus' ``(upsilon, omega)`` ordering (se3.hpp exp/log).
* Sim(3) is a triple ``(s, R, t)`` with scalar scale ``s: (...,)`` acting as
  ``x' = s * R @ x + t`` (reference: 3rdparty/g2o/g2o/types/sim3.h).
* Default dtype float32; pass float64 arrays for the rare double-critical
  paths (Sim3 accumulation in pose-graph optimization).

All small-angle branches are implemented with `jnp.where` on Taylor expansions
so the functions are smooth, branch-free, and safe under `jax.grad`.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-8


class SE3(NamedTuple):
    """Batched rigid transform x -> R @ x + t."""

    R: jnp.ndarray  # (..., 3, 3)
    t: jnp.ndarray  # (..., 3)


class Sim3(NamedTuple):
    """Batched similarity transform x -> s * R @ x + t."""

    s: jnp.ndarray  # (...,)
    R: jnp.ndarray  # (..., 3, 3)
    t: jnp.ndarray  # (..., 3)


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of (...,3) vectors -> (...,3,3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `hat`: (...,3,3) skew matrix -> (...,3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _theta_terms(w: jnp.ndarray):
    """Differentiation-safe angle terms from a rotation vector.

    Returns (th2_raw, small, theta_safe, th2_safe). `th2_raw = sum(w^2)` is
    smooth everywhere (unlike `norm(w)`, whose JVP is NaN at 0) so Taylor
    branches must be written in terms of it; the `_safe` values are only
    valid where ~small and exist to keep the untaken general branch free of
    0/0 in both primal and tangent computations.
    """
    th2_raw = jnp.sum(w * w, axis=-1)
    small = th2_raw < 1e-8
    th2_safe = jnp.where(small, 1.0, th2_raw)
    theta_safe = jnp.sqrt(th2_safe)
    return th2_raw, small, theta_safe, th2_safe


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Exponential map R^3 -> SO(3) (Rodrigues), batched.

    Replaces Sophus::SO3::exp (3rdparty/Sophus/sophus/so3.hpp). All
    small-angle branches are polynomial in sum(w^2) so jacfwd/jacrev are
    exact and finite at w = 0.
    """
    th2, small, th, _ = _theta_terms(w)
    W = hat(w)
    W2 = W @ W
    a = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    b = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / (th * th))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Log map SO(3) -> R^3, robust near 0 and pi.

    Uses the quaternion route (matrix -> unit quaternion -> axis-angle) which
    is numerically stable for all angles, unlike the arccos-trace formula.
    """
    q = quat_from_mat(R)  # (..., 4) wxyz, w >= 0
    return quat_log(q)


def quat_from_mat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z), w >= 0.

    Branchless Shepperd's method: compute all four candidate forms and select
    the best-conditioned one with `where` so it vectorizes on the VPU.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot is the largest.
    def _cand(pivot, a, b, c, d):
        s = jnp.sqrt(jnp.maximum(pivot, _EPS)) * 2.0
        return jnp.stack([a / s, b / s, c / s, d / s], axis=-1), s

    q0, _ = _cand(1.0 + tr, 1.0 + tr, m21 - m12, m02 - m20, m10 - m01)
    q1, _ = _cand(1.0 + m00 - m11 - m22, m21 - m12, 1.0 + m00 - m11 - m22,
                  m01 + m10, m02 + m20)
    q2, _ = _cand(1.0 - m00 + m11 - m22, m02 - m20, m01 + m10,
                  1.0 - m00 + m11 - m22, m12 + m21)
    q3, _ = _cand(1.0 - m00 - m11 + m22, m10 - m01, m02 + m20,
                  m12 + m21, 1.0 - m00 - m11 + m22)

    # Pick the candidate whose pivot is largest.
    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22,
         1.0 - m00 - m11 + m22],
        axis=-1,
    )
    idx = jnp.argmax(pivots, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(qs, idx[..., None, None].repeat(4, axis=-1),
                            axis=-2)[..., 0, :]
    # Canonicalize sign (w >= 0) and normalize.
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_log(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w,x,y,z) -> rotation vector."""
    w = q[..., 0]
    v = q[..., 1:]
    vnorm = jnp.linalg.norm(v, axis=-1)
    # angle = 2 * atan2(|v|, w); factor = angle / |v| with Taylor fallback
    angle = 2.0 * jnp.arctan2(vnorm, w)
    small = vnorm < 1e-6
    vn = jnp.where(small, 1.0, vnorm)
    factor = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), angle / vn)
    return v * factor[..., None]


def mat_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w,x,y,z) -> rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([ww + xx - yy - zz, 2 * (xy - wz), 2 * (xz + wy)], -1),
            jnp.stack([2 * (xy + wz), ww - xx + yy - zz, 2 * (yz - wx)], -1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), ww - xx - yy + zz], -1),
        ],
        axis=-2,
    )


def so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J_l of SO(3): exp(w+dw) ~ exp(J_l dw) exp(w)."""
    th2, small, th, _ = _theta_terms(w)
    W = hat(w)
    W2 = W @ W
    b = jnp.where(small, 0.5 - th2 / 24.0,
                  (1.0 - jnp.cos(th)) / (th * th))[..., None, None]
    c = jnp.where(small, 1.0 / 6.0 - th2 / 120.0,
                  (th - jnp.sin(th)) / (th ** 3))[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b * W + c * W2


def so3_right_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Right Jacobian J_r of SO(3): exp(w+dw) ~ exp(w) exp(J_r dw).

    Used by IMU preintegration (reference: include/imu/imu_types.h:260-269
    RightJacobianSO3) and the inertial factors.
    """
    return so3_left_jacobian(-w)


def so3_right_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    """Inverse right Jacobian of SO(3), closed form with Taylor fallback.

    Reference semantics: imu_types.h InverseRightJacobianSO3.
    """
    th2, small, ts, ts2 = _theta_terms(w)
    W = hat(-w)  # J_r^{-1}(w) = J_l^{-1}(-w)
    W2 = W @ W
    # coefficient: 1/theta^2 - (1+cos)/(2 theta sin)
    coef = jnp.where(
        small,
        1.0 / 12.0 + th2 / 720.0,
        1.0 / ts2 - (1.0 + jnp.cos(ts)) / (2.0 * ts * jnp.sin(ts)),
    )[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + coef * W2


def so3_normalize(R: jnp.ndarray) -> jnp.ndarray:
    """Re-orthonormalize a rotation matrix (Gram-Schmidt via quaternion)."""
    return mat_from_quat(quat_from_mat(R))


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------


def se3_identity(batch_shape: Tuple[int, ...] = (), dtype=jnp.float32) -> SE3:
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
    t = jnp.zeros(batch_shape + (3,), dtype=dtype)
    return SE3(R, t)


def se3_exp(xi: jnp.ndarray) -> SE3:
    """Exp map R^6 -> SE(3); xi = [v (translation), w (rotation)]."""
    v, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    V = so3_left_jacobian(w)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return SE3(R, t)


def se3_log(T: SE3) -> jnp.ndarray:
    """Log map SE(3) -> R^6 = [v, w]."""
    w = so3_log(T.R)
    Vinv = _so3_left_jacobian_inv(w)
    v = jnp.einsum("...ij,...j->...i", Vinv, T.t)
    return jnp.concatenate([v, w], axis=-1)


def _so3_left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    """Inverse left Jacobian: J_l^{-1}(w) = J_r^{-1}(-w)."""
    return so3_right_jacobian_inv(-w)


def se3_inverse(T: SE3) -> SE3:
    Rt = jnp.swapaxes(T.R, -1, -2)
    return SE3(Rt, -jnp.einsum("...ij,...j->...i", Rt, T.t))


def se3_compose(A: SE3, B: SE3) -> SE3:
    """A then-apply-after B: (A*B)(x) = A(B(x))."""
    return SE3(A.R @ B.R, jnp.einsum("...ij,...j->...i", A.R, B.t) + A.t)


def se3_apply(T: SE3, x: jnp.ndarray) -> jnp.ndarray:
    """Transform points x: (..., 3)."""
    return jnp.einsum("...ij,...j->...i", T.R, x) + T.t


def se3_adjoint(T: SE3) -> jnp.ndarray:
    """Adjoint matrix (..., 6, 6) in [v, w] ordering."""
    top = jnp.concatenate([T.R, hat(T.t) @ T.R], axis=-1)
    bottom = jnp.concatenate([jnp.zeros_like(T.R), T.R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_boxplus(T: SE3, xi: jnp.ndarray) -> SE3:
    """Left-multiplicative update: exp(xi) * T (the solver's retraction)."""
    return se3_compose(se3_exp(xi), T)


def se3_from_matrix(M: jnp.ndarray) -> SE3:
    return SE3(M[..., :3, :3], M[..., :3, 3])


def se3_to_matrix(T: SE3) -> jnp.ndarray:
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.t.dtype),
        T.t.shape[:-1] + (4,),
    )
    top = jnp.concatenate([T.R, T.t[..., None]], axis=-1)
    return jnp.concatenate([top, bottom[..., None, :]], axis=-2)


# ---------------------------------------------------------------------------
# Sim(3)
# ---------------------------------------------------------------------------


def sim3_identity(batch_shape: Tuple[int, ...] = (), dtype=jnp.float32) -> Sim3:
    return Sim3(
        jnp.ones(batch_shape, dtype=dtype),
        jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3)),
        jnp.zeros(batch_shape + (3,), dtype=dtype),
    )


def sim3_exp(xi: jnp.ndarray) -> Sim3:
    """Exp map R^7 -> Sim(3); xi = [v, w, sigma] (sigma = log scale).

    Matches g2o::Sim3 semantics (3rdparty/g2o/g2o/types/sim3.h) with the
    scale acting on the rotation: x' = s R x + t.
    """
    v, w, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(w)
    W = _sim3_W(w, sigma)
    t = jnp.einsum("...ij,...j->...i", W, v)
    return Sim3(s, R, t)


def _sim3_W(w: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """The Sim(3) 'W' matrix coupling translation with rotation+scale.

    W = A * Wx + B * Wx^2 + C * I with coefficients depending on (theta,
    sigma); all four limit cases (small theta / small sigma) handled with
    Taylor expansions so the function stays smooth.
    """
    dtype = w.dtype
    th2_raw, small_th, th_s, th2 = _theta_terms(w)
    Wx = hat(w)
    Wx2 = Wx @ Wx
    s = jnp.exp(sigma)

    small_sig = jnp.abs(sigma) < 1e-5
    sig_s = jnp.where(small_sig, 1.0, sigma)

    # C = (s - 1) / sigma, -> 1 as sigma -> 0
    C = jnp.where(small_sig, 1.0 + sigma / 2.0 + sigma * sigma / 6.0,
                  (s - 1.0) / sig_s)

    sig2 = sig_s * sig_s
    denom = sig2 + th2

    # General case (sigma != 0, theta != 0):
    A_gen = (s * jnp.sin(th_s) * sig_s + (1.0 - s * jnp.cos(th_s)) * th_s) / (
        th_s * denom
    )
    B_gen = (
        C
        - ((s * jnp.cos(th_s) - 1.0) * sig_s + s * jnp.sin(th_s) * th_s) / denom
    ) / th2

    # sigma -> 0 limits (pure SO(3) left Jacobian):
    A_sig0 = jnp.where(small_th, 0.5 - th2_raw / 24.0,
                       (1.0 - jnp.cos(th_s)) / th2)
    B_sig0 = jnp.where(
        small_th,
        1.0 / 6.0 - th2_raw / 120.0,
        (th_s - jnp.sin(th_s)) / (th_s ** 3),
    )

    # theta -> 0 limits:
    A_th0 = jnp.where(
        small_sig,
        0.5 + sigma / 3.0,
        ((sig_s - 1.0) * s + 1.0) / sig2,
    )
    B_th0 = jnp.where(
        small_sig,
        1.0 / 6.0 + sigma / 8.0,
        (s * (0.5 * sig2 - sig_s + 1.0) - 1.0) / (sig2 * sig_s),
    )

    A = jnp.where(small_th, A_th0, jnp.where(small_sig, A_sig0, A_gen))
    B = jnp.where(small_th, B_th0, jnp.where(small_sig, B_sig0, B_gen))

    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), Wx.shape)
    return (
        A[..., None, None] * Wx + B[..., None, None] * Wx2 + C[..., None, None] * eye
    )


def sim3_log(S: Sim3) -> jnp.ndarray:
    """Log map Sim(3) -> R^7 = [v, w, sigma]."""
    sigma = jnp.log(S.s)
    w = so3_log(S.R)
    W = _sim3_W(w, sigma)
    v = jnp.linalg.solve(W, S.t[..., None])[..., 0]
    return jnp.concatenate([v, w, sigma[..., None]], axis=-1)


def sim3_inverse(S: Sim3) -> Sim3:
    Rt = jnp.swapaxes(S.R, -1, -2)
    s_inv = 1.0 / S.s
    t_inv = -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, S.t)
    return Sim3(s_inv, Rt, t_inv)


def sim3_compose(A: Sim3, B: Sim3) -> Sim3:
    return Sim3(
        A.s * B.s,
        A.R @ B.R,
        A.s[..., None] * jnp.einsum("...ij,...j->...i", A.R, B.t) + A.t,
    )


def sim3_apply(S: Sim3, x: jnp.ndarray) -> jnp.ndarray:
    return S.s[..., None] * jnp.einsum("...ij,...j->...i", S.R, x) + S.t


def sim3_from_se3(T: SE3, s=None) -> Sim3:
    scale = jnp.ones(T.t.shape[:-1], dtype=T.t.dtype) if s is None else s
    return Sim3(scale, T.R, T.t)


def se3_from_sim3(S: Sim3) -> SE3:
    """Drop scale: translation divided by scale (g2o loop-closing convention:
    [R t/s; 0 1], see reference src/loopclosing.cc corrected-pose recovery)."""
    return SE3(S.R, S.t / S.s[..., None])
