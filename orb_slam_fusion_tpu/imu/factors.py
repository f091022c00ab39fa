"""Inertial residuals (forward and backward 9-dim preintegration factors).

Reference: EdgeInertial::computeError (src/solver/g2o_solver/g2o_types.cc,
header :458): the 9-dim residual [r_dR, r_dV, r_dP] between two
(pose, velocity, bias) states through a Preintegrated measurement, with the
first-order bias correction. The backward variant is this build's
implementation of the reference README's promised-but-absent 'bidirectional
imu integration' (SURVEY.md §0).

States use the IMU/body frame: R_wb (world-from-body rotation), p_w, v_w.
Gravity vector g_w defaults to (0, 0, -9.81).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .. import lie
from .preintegration import (GRAVITY_VEC, ImuBias, Preintegrated,
                             bias_corrected_delta,
                             bias_corrected_delta_backward)


def inertial_residual(
    pre: Preintegrated,
    R_i: jnp.ndarray, p_i: jnp.ndarray, v_i: jnp.ndarray,
    R_j: jnp.ndarray, p_j: jnp.ndarray, v_j: jnp.ndarray,
    bias: ImuBias,
    g_w: jnp.ndarray = GRAVITY_VEC,
) -> jnp.ndarray:
    """(9,) residual [er, ev, ep]; zero for a perfectly consistent state."""
    dR, dV, dP = bias_corrected_delta(pre, bias)
    dt = pre.dT
    er = lie.so3_log(dR.T @ R_i.T @ R_j)
    ev = R_i.T @ (v_j - v_i - g_w * dt) - dV
    ep = R_i.T @ (p_j - p_i - v_i * dt - 0.5 * g_w * dt * dt) - dP
    return jnp.concatenate([er, ev, ep])


def inertial_residual_backward(
    pre_bwd: Preintegrated,
    R_i: jnp.ndarray, p_i: jnp.ndarray, v_i: jnp.ndarray,
    R_j: jnp.ndarray, p_j: jnp.ndarray, v_j: jnp.ndarray,
    bias: ImuBias,
    g_w: jnp.ndarray = GRAVITY_VEC,
) -> jnp.ndarray:
    """(9,) backward residual: state i constrained from state j.

    `pre_bwd` must come from `preintegrate_backward`. Derivation (with
    forward relations R_j = R_i dR, v_j = v_i + g dt + R_i dV,
    p_j = p_i + v_i dt + 1/2 g dt^2 + R_i dP):

        R_i = R_j dR~           with dR~ = dR^T
        v_i = v_j + g~ dt + R_j dV~     g~ = -g,  dV~ = -dR^T dV
        p_i = p_j - v_j dt - 1/2 g~ dt^2 ... + R_j dP~,
              dP~ = dR^T (dP - dt dV)

    all of which the time-reversed scan produces directly.
    """
    dR, dV, dP = bias_corrected_delta_backward(pre_bwd, bias)
    dt = pre_bwd.dT
    er = lie.so3_log(dR.T @ R_j.T @ R_i)
    ev = R_j.T @ (v_i - v_j + g_w * dt) - dV
    ep = R_j.T @ (p_i - p_j + v_j * dt - 0.5 * g_w * dt * dt) + dP
    return jnp.concatenate([er, ev, ep])


def information_from_cov(pre: Preintegrated, eps: float = 1e-8,
                         max_info: float = 1e6) -> jnp.ndarray:
    """(9,9) information = inverse of the [phi, v, p] covariance block.

    Reference: EdgeInertial ctor inverts C.block<9,9>(0,0) (g2o_types.cc).
    Symmetrized, jittered, and **spectrum-capped**: a tactical-grade IMU
    yields rotation information ~1e8, which next to ~1e2 visual blocks puts
    the joint normal equations beyond fp32 Cholesky range (the reference
    factorizes in double). Scaling the information so its largest diagonal
    is <= `max_info` keeps the factor's *relative* weighting while bounding
    the joint condition number — the statistical loss is a slightly loose
    inertial weight, invisible next to discretization error.
    """
    C = pre.cov[:9, :9]
    C = 0.5 * (C + C.T) + eps * jnp.eye(9, dtype=C.dtype)
    info = jnp.linalg.inv(C)
    scale = jnp.minimum(1.0, max_info / jnp.maximum(
        jnp.max(jnp.diag(info)), 1.0))
    return info * scale


def bias_walk_residual(bias_i: ImuBias, bias_j: ImuBias
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random-walk residuals between consecutive keyframe biases.

    Reference: EdgeGyroRW / EdgeAccRW (g2o_types.h:592,629).
    """
    return bias_j.gyro - bias_i.gyro, bias_j.acc - bias_i.acc
