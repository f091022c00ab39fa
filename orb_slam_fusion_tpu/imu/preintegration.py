"""On-manifold IMU preintegration (Forster et al.), batched for TPU.

Reference semantics: IMU::Preintegrated::IntegrateNewMeasurement
(src/imu/imu_types.cc:106-239): forward Euler on-manifold integration of
rotation/velocity/position deltas, 15x15 covariance propagation via the A/B
matrices, and first-order bias-correction Jacobians JRg/JVg/JVa/JPg/JPa.
Here the per-measurement loop is a `lax.scan` with static length and dt=0
padding (a zero-dt step is the identity update), so preintegration over any
window compiles once; `jax.vmap` batches windows (e.g. all keyframe gaps of
a trajectory at once for FullInertialBA re-integration).

Gravity magnitude 9.81 (imu_types.h:42).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .. import lie

GRAVITY = 9.81
GRAVITY_VEC = jnp.array([0.0, 0.0, -GRAVITY], jnp.float32)


class ImuCalib(NamedTuple):
    """Sensor calibration (reference IMU::Calib, imu_types.h)."""

    Tbc_R: jnp.ndarray      # (3,3) camera-to-body rotation
    Tbc_t: jnp.ndarray      # (3,)  camera-to-body translation
    noise_gyro: jnp.ndarray  # () rad/s/sqrt(Hz) * sqrt(freq)
    noise_acc: jnp.ndarray   # () m/s^2/sqrt(Hz) * sqrt(freq)
    walk_gyro: jnp.ndarray   # () bias random walk
    walk_acc: jnp.ndarray    # ()


def make_calib(Tbc_R=None, Tbc_t=None, noise_gyro=1.7e-4, noise_acc=2e-3,
               walk_gyro=1.9e-5, walk_acc=3e-3, freq=200.0) -> ImuCalib:
    """Build calib with discrete-time noise densities (sigma * sqrt(freq))."""
    sf = jnp.sqrt(jnp.asarray(freq, jnp.float32))
    if Tbc_R is None:
        Tbc_R = jnp.eye(3, dtype=jnp.float32)
    if Tbc_t is None:
        Tbc_t = jnp.zeros(3, jnp.float32)
    return ImuCalib(
        Tbc_R=jnp.asarray(Tbc_R, jnp.float32),
        Tbc_t=jnp.asarray(Tbc_t, jnp.float32),
        noise_gyro=jnp.asarray(noise_gyro, jnp.float32) * sf,
        noise_acc=jnp.asarray(noise_acc, jnp.float32) * sf,
        walk_gyro=jnp.asarray(walk_gyro, jnp.float32),
        walk_acc=jnp.asarray(walk_acc, jnp.float32),
    )


class ImuBias(NamedTuple):
    gyro: jnp.ndarray  # (3,)
    acc: jnp.ndarray   # (3,)


def zero_bias(dtype=jnp.float32) -> ImuBias:
    return ImuBias(jnp.zeros(3, dtype), jnp.zeros(3, dtype))


class Preintegrated(NamedTuple):
    """Preintegrated deltas between two frames/keyframes.

    All quantities are expressed at the linearization bias `bias0`.
    """

    dT: jnp.ndarray       # () total time
    dR: jnp.ndarray       # (3,3)
    dV: jnp.ndarray       # (3,)
    dP: jnp.ndarray       # (3,)
    cov: jnp.ndarray      # (15,15) [phi, v, p, bg, ba]
    JRg: jnp.ndarray      # (3,3) d(dR)/d(bg)
    JVg: jnp.ndarray      # (3,3)
    JVa: jnp.ndarray      # (3,3)
    JPg: jnp.ndarray      # (3,3)
    JPa: jnp.ndarray      # (3,3)
    bias0: ImuBias        # linearization bias
    avg_acc: jnp.ndarray  # (3,) mean specific force (for gravity init)
    avg_gyro: jnp.ndarray  # (3,)


def preintegrate(acc: jnp.ndarray, gyro: jnp.ndarray, dts: jnp.ndarray,
                 bias: ImuBias, calib: ImuCalib) -> Preintegrated:
    """Integrate a padded measurement window.

    acc, gyro: (N, 3); dts: (N,) with 0 for padding rows. Semantics match
    Preintegrated::IntegrateNewMeasurement (imu_types.cc:106): position and
    velocity updated with the *previous* rotation, then rotation advanced;
    covariance propagated with the analytic A/B blocks.
    """
    dtype = acc.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    Nga = jnp.diag(jnp.concatenate([
        jnp.full(3, calib.noise_gyro ** 2),
        jnp.full(3, calib.noise_acc ** 2)])).astype(dtype)
    NgaWalk = jnp.diag(jnp.concatenate([
        jnp.full(3, calib.walk_gyro ** 2),
        jnp.full(3, calib.walk_acc ** 2)])).astype(dtype)

    def step(carry, inp):
        (dT, dR, dV, dP, C, JRg, JVg, JVa, JPg, JPa, sum_a, sum_w) = carry
        a, w, dt = inp
        live = dt > 0
        acc_c = a - bias.acc
        gyro_c = w - bias.gyro

        dt2 = dt * dt
        acc_hat = lie.hat(acc_c)

        # position/velocity with previous rotation (imu_types.cc:128-133)
        dP_n = dP + dV * dt + 0.5 * (dR @ acc_c) * dt2
        dV_n = dV + (dR @ acc_c) * dt

        # covariance blocks A (9x9) and B (9x6) for [phi, v, p]
        dRa = dR @ acc_hat
        A = jnp.zeros((9, 9), dtype)
        B = jnp.zeros((9, 6), dtype)
        A = A.at[3:6, 0:3].set(-dt * dRa)
        A = A.at[6:9, 0:3].set(-0.5 * dt2 * dRa)
        A = A.at[6:9, 3:6].set(dt * eye3)
        A = A.at[6:9, 6:9].set(eye3)
        A = A.at[3:6, 3:6].set(eye3)
        B = B.at[3:6, 3:6].set(dt * dR)
        B = B.at[6:9, 3:6].set(0.5 * dt2 * dR)

        # bias jacobians (imu_types.cc:139-144), using previous JRg
        JPa_n = JPa + JVa * dt - 0.5 * dt2 * dR
        JPg_n = JPg + JVg * dt - 0.5 * dt2 * dRa @ JRg
        JVa_n = JVa - dt * dR
        JVg_n = JVg - dt * dRa @ JRg

        # rotation update
        w_dt = gyro_c * dt
        dRi = lie.so3_exp(w_dt)
        rightJ = lie.so3_right_jacobian(w_dt)
        dR_n = dR @ dRi
        A = A.at[0:3, 0:3].set(dRi.T)
        B = B.at[0:3, 0:3].set(rightJ * dt)

        # covariance propagation (imu_types.cc:155-158)
        C9 = A @ C[:9, :9] @ A.T + B @ Nga @ B.T
        Cb = C[9:, 9:] + NgaWalk
        C_n = C.at[:9, :9].set(C9).at[9:, 9:].set(Cb)

        JRg_n = dRi.T @ JRg - rightJ * dt

        new = (dT + dt, dR_n, dV_n, dP_n, C_n,
               JRg_n, JVg_n, JVa_n, JPg_n, JPa_n,
               sum_a + a * dt, sum_w + w * dt)
        old = (dT, dR, dV, dP, C, JRg, JVg, JVa, JPg, JPa, sum_a, sum_w)
        return jax.tree_util.tree_map(
            lambda n, o: jnp.where(live, n, o), new, old), None

    zero3 = jnp.zeros(3, dtype)
    init = (jnp.asarray(0.0, dtype), eye3, zero3, zero3,
            jnp.zeros((15, 15), dtype),
            jnp.zeros((3, 3), dtype), jnp.zeros((3, 3), dtype),
            jnp.zeros((3, 3), dtype), jnp.zeros((3, 3), dtype),
            jnp.zeros((3, 3), dtype), zero3, zero3)
    out, _ = jax.lax.scan(step, init, (acc, gyro, dts))
    (dT, dR, dV, dP, C, JRg, JVg, JVa, JPg, JPa, sum_a, sum_w) = out
    dT_safe = jnp.maximum(dT, 1e-9)
    return Preintegrated(
        dT=dT, dR=lie.so3_normalize(dR), dV=dV, dP=dP, cov=C,
        JRg=JRg, JVg=JVg, JVa=JVa, JPg=JPg, JPa=JPa, bias0=bias,
        avg_acc=sum_a / dT_safe, avg_gyro=sum_w / dT_safe)


def preintegrate_host(acc: "np.ndarray", gyro: "np.ndarray",
                      dts: "np.ndarray", bias: ImuBias,
                      calib: ImuCalib) -> Preintegrated:
    """Float64 host-side preintegration (numpy), identical semantics.

    The per-frame integration runs at IMU rate (~200 Hz) on a handful of
    measurements — scalar-sequential work that belongs on the host, and in
    double precision: fp32 accumulation noise (~1e-3 over a 0.25 s window)
    is amplified by the ~1e8 information of a tactical IMU and would
    dominate the inertial cost (the reference integrates in double
    throughout, imu_types.cc). Returns float32 device arrays for the
    solvers.
    """
    import numpy as np

    acc = np.asarray(acc, np.float64)
    gyro = np.asarray(gyro, np.float64)
    dts = np.asarray(dts, np.float64)
    bg = np.asarray(bias.gyro, np.float64)
    ba_ = np.asarray(bias.acc, np.float64)
    ng2 = float(calib.noise_gyro) ** 2
    na2 = float(calib.noise_acc) ** 2
    wg2 = float(calib.walk_gyro) ** 2
    wa2 = float(calib.walk_acc) ** 2

    eye3 = np.eye(3)
    dR = np.eye(3)
    dV = np.zeros(3)
    dP = np.zeros(3)
    C = np.zeros((15, 15))
    JRg = np.zeros((3, 3))
    JVg = np.zeros((3, 3))
    JVa = np.zeros((3, 3))
    JPg = np.zeros((3, 3))
    JPa = np.zeros((3, 3))
    dT = 0.0
    sum_a = np.zeros(3)
    sum_w = np.zeros(3)
    Nga = np.diag([ng2] * 3 + [na2] * 3)
    NgaWalk = np.diag([wg2] * 3 + [wa2] * 3)

    def _hat(v):
        return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]],
                         [-v[1], v[0], 0.0]])

    def _exp(w):
        th = np.linalg.norm(w)
        W = _hat(w)
        if th < 1e-9:
            return eye3 + W + 0.5 * W @ W
        return (eye3 + np.sin(th) / th * W
                + (1 - np.cos(th)) / (th * th) * W @ W)

    def _rightJ(w):
        th = np.linalg.norm(w)
        W = _hat(w)
        if th < 1e-7:
            return eye3 - 0.5 * W
        return (eye3 - (1 - np.cos(th)) / (th * th) * W
                + (th - np.sin(th)) / (th ** 3) * W @ W)

    for k in range(len(dts)):
        dt = dts[k]
        if dt <= 0:
            continue
        a = acc[k] - ba_
        w = gyro[k] - bg
        dt2 = dt * dt
        acc_hat = _hat(a)
        dRa = dR @ acc_hat

        dP = dP + dV * dt + 0.5 * (dR @ a) * dt2
        dV = dV + (dR @ a) * dt

        A = np.zeros((9, 9))
        B = np.zeros((9, 6))
        A[3:6, 0:3] = -dt * dRa
        A[6:9, 0:3] = -0.5 * dt2 * dRa
        A[6:9, 3:6] = dt * eye3
        A[6:9, 6:9] = eye3
        A[3:6, 3:6] = eye3
        B[3:6, 3:6] = dt * dR
        B[6:9, 3:6] = 0.5 * dt2 * dR

        JPa = JPa + JVa * dt - 0.5 * dt2 * dR
        JPg = JPg + JVg * dt - 0.5 * dt2 * dRa @ JRg
        JVa = JVa - dt * dR
        JVg = JVg - dt * dRa @ JRg

        w_dt = w * dt
        dRi = _exp(w_dt)
        rJ = _rightJ(w_dt)
        dR = dR @ dRi
        A[0:3, 0:3] = dRi.T
        B[0:3, 0:3] = rJ * dt

        C[:9, :9] = A @ C[:9, :9] @ A.T + B @ Nga @ B.T
        C[9:, 9:] = C[9:, 9:] + NgaWalk

        JRg = dRi.T @ JRg - rJ * dt
        dT += dt
        sum_a += acc[k] * dt
        sum_w += gyro[k] * dt

    # re-orthonormalize
    u, _, vt = np.linalg.svd(dR)
    dR = u @ np.diag([1.0, 1.0, np.linalg.det(u @ vt)]) @ vt
    dT_safe = max(dT, 1e-9)
    f32 = lambda x: jnp.asarray(np.asarray(x), jnp.float32)
    return Preintegrated(
        dT=f32(dT), dR=f32(dR), dV=f32(dV), dP=f32(dP), cov=f32(C),
        JRg=f32(JRg), JVg=f32(JVg), JVa=f32(JVa), JPg=f32(JPg),
        JPa=f32(JPa), bias0=bias, avg_acc=f32(sum_a / dT_safe),
        avg_gyro=f32(sum_w / dT_safe))


def bias_corrected_delta(pre: Preintegrated, bias: ImuBias
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """First-order bias-corrected (dR, dV, dP) at a new bias.

    Reference: Preintegrated::GetDeltaRotation/Velocity/Position
    (imu_types.cc:198-214).
    """
    dbg = bias.gyro - pre.bias0.gyro
    dba = bias.acc - pre.bias0.acc
    dR = pre.dR @ lie.so3_exp(pre.JRg @ dbg)
    dV = pre.dV + pre.JVg @ dbg + pre.JVa @ dba
    dP = pre.dP + pre.JPg @ dbg + pre.JPa @ dba
    return dR, dV, dP


def preintegrate_backward(acc: jnp.ndarray, gyro: jnp.ndarray,
                          dts: jnp.ndarray, bias: ImuBias,
                          calib: ImuCalib) -> Preintegrated:
    """Backward preintegration: deltas of state i as seen from state j.

    Integrates the time-reversed measurement stream with negated rates —
    equivalent to preintegrating from t_j backwards to t_i. Gives the
    'bidirectional IMU integration' capability the reference only advertises
    (README.md:8, unimplemented — SURVEY.md §0): the backward factor
    `inertial_residual_backward` constrains (pose_i, v_i) from (pose_j,
    v_j), which symmetrizes information flow when biases or gravity are
    re-estimated mid-window.
    """
    # Time reversal: reversed measurement order, negated rates AND negated
    # specific force (in backward time velocity flips sign, so measured
    # acceleration contributes with opposite sign). Padding rows (dt=0) are
    # identity updates, so their position after reversal is irrelevant.
    return preintegrate(-acc[::-1], -gyro[::-1], dts[::-1],
                        ImuBias(-bias.gyro, -bias.acc), calib)


def bias_corrected_delta_backward(pre: Preintegrated, bias: ImuBias
                                  ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                             jnp.ndarray]:
    """Bias correction for a backward Preintegrated (sign-mapped bias)."""
    return bias_corrected_delta(pre, ImuBias(-bias.gyro, -bias.acc))
