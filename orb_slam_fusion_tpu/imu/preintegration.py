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
