"""IMU preintegration tests against exact numerical simulation."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_fusion_tpu import lie
from orb_slam_fusion_tpu.imu import (
    GRAVITY, ImuBias, inertial_residual, inertial_residual_backward,
    preintegrate)
from orb_slam_fusion_tpu.imu.preintegration import (
    make_calib, preintegrate_backward, zero_bias)

G_W = np.array([0.0, 0.0, -GRAVITY])


def simulate_trajectory(T=1.0, dt=1e-3, seed=0):
    """Simulate rigid-body motion; returns states + exact IMU readings.

    Body has sinusoidal world acceleration and constant-ish angular rate.
    States propagated with fine-step Euler matching the preintegration
    discretization convention (v/p updated with the pre-step rotation).
    """
    rng = np.random.RandomState(seed)
    n = int(T / dt)
    w_b = np.array([0.3, -0.2, 0.5])           # body angular rate (const)
    amp = rng.uniform(-2, 2, 3)
    freq = rng.uniform(0.5, 2.0, 3)

    R = np.eye(3)
    p = np.zeros(3)
    v = np.array([0.2, -0.1, 0.05])
    states = [(R.copy(), p.copy(), v.copy())]
    accs, gyros = [], []
    for k in range(n):
        t = k * dt
        a_w = amp * np.sin(2 * np.pi * freq * t)       # world acceleration
        acc_body = R.T @ (a_w - G_W)                   # specific force
        accs.append(acc_body)
        gyros.append(w_b)
        # integrate exactly like the preintegrator: p,v with old R
        p = p + v * dt + 0.5 * a_w * dt * dt
        v = v + a_w * dt
        R = R @ np.asarray(lie.so3_exp(jnp.asarray(w_b * dt)))
        states.append((R.copy(), p.copy(), v.copy()))
    return (np.asarray(accs, np.float32), np.asarray(gyros, np.float32),
            np.full(n, dt, np.float32), states)


class TestPreintegration:
    def test_forward_residual_zero(self):
        accs, gyros, dts, states = simulate_trajectory()
        calib = make_calib()
        pre = preintegrate(jnp.asarray(accs), jnp.asarray(gyros),
                           jnp.asarray(dts), zero_bias(), calib)
        R0, p0, v0 = states[0]
        R1, p1, v1 = states[-1]
        r = inertial_residual(
            pre, jnp.asarray(R0), jnp.asarray(p0), jnp.asarray(v0),
            jnp.asarray(R1), jnp.asarray(p1), jnp.asarray(v1), zero_bias())
        assert np.abs(np.asarray(r)).max() < 5e-3, np.asarray(r)

    def test_backward_residual_zero(self):
        accs, gyros, dts, states = simulate_trajectory(seed=1)
        calib = make_calib()
        pre_b = preintegrate_backward(
            jnp.asarray(accs), jnp.asarray(gyros), jnp.asarray(dts),
            zero_bias(), calib)
        R0, p0, v0 = states[0]
        R1, p1, v1 = states[-1]
        r = inertial_residual_backward(
            pre_b, jnp.asarray(R0), jnp.asarray(p0), jnp.asarray(v0),
            jnp.asarray(R1), jnp.asarray(p1), jnp.asarray(v1), zero_bias())
        assert np.abs(np.asarray(r)).max() < 5e-3, np.asarray(r)

    def test_padding_inert(self):
        accs, gyros, dts, states = simulate_trajectory(T=0.5)
        calib = make_calib()
        pre1 = preintegrate(jnp.asarray(accs), jnp.asarray(gyros),
                            jnp.asarray(dts), zero_bias(), calib)
        # pad with garbage rows at dt=0
        pad = 100
        accs_p = np.concatenate([accs, np.full((pad, 3), 1e3, np.float32)])
        gyros_p = np.concatenate([gyros, np.full((pad, 3), -1e3, np.float32)])
        dts_p = np.concatenate([dts, np.zeros(pad, np.float32)])
        pre2 = preintegrate(jnp.asarray(accs_p), jnp.asarray(gyros_p),
                            jnp.asarray(dts_p), zero_bias(), calib)
        np.testing.assert_allclose(np.asarray(pre2.dR), np.asarray(pre1.dR),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(pre2.dP), np.asarray(pre1.dP),
                                   atol=1e-6)
        np.testing.assert_allclose(float(pre2.dT), float(pre1.dT), rtol=1e-6)

    def test_bias_correction_first_order(self):
        accs, gyros, dts, states = simulate_trajectory(T=0.5, seed=2)
        calib = make_calib()
        db = np.array([0.02, -0.01, 0.015, -0.05, 0.08, 0.03], np.float32)
        bias_lin = ImuBias(jnp.asarray(db[:3]), jnp.asarray(db[3:]))
        # integrate at a WRONG linearization bias; evaluating the residual at
        # the TRUE bias (zero) must be ~zero thanks to the Jacobian correction
        accs_b = accs + db[3:]
        gyros_b = gyros + db[:3]
        pre = preintegrate(jnp.asarray(accs_b), jnp.asarray(gyros_b),
                           jnp.asarray(dts), bias_lin, calib)
        # with bias = bias_lin the residual uses raw deltas: exact
        R0, p0, v0 = states[0]
        R1, p1, v1 = states[-1]
        r_lin = inertial_residual(
            pre, jnp.asarray(R0), jnp.asarray(p0), jnp.asarray(v0),
            jnp.asarray(R1), jnp.asarray(p1), jnp.asarray(v1), bias_lin)
        assert np.abs(np.asarray(r_lin)).max() < 5e-3

        # now pretend the estimate moves to a slightly different bias
        bias_new = ImuBias(bias_lin.gyro + 1e-3, bias_lin.acc - 2e-3)
        accs_b2 = accs + np.asarray(bias_new.acc)
        gyros_b2 = gyros + np.asarray(bias_new.gyro)
        pre_exact = preintegrate(jnp.asarray(accs_b2), jnp.asarray(gyros_b2),
                                 jnp.asarray(dts), bias_new, calib)
        r_corr = inertial_residual(
            pre, jnp.asarray(R0), jnp.asarray(p0), jnp.asarray(v0),
            jnp.asarray(R1), jnp.asarray(p1), jnp.asarray(v1), bias_new)
        r_exact = inertial_residual(
            pre_exact, jnp.asarray(R0), jnp.asarray(p0), jnp.asarray(v0),
            jnp.asarray(R1), jnp.asarray(p1), jnp.asarray(v1), bias_new)
        # first-order correction ~ exact reintegration for small delta
        assert np.abs(np.asarray(r_corr) - np.asarray(r_exact)).max() < 1e-2

    def test_covariance_grows(self):
        accs, gyros, dts, _ = simulate_trajectory(T=0.5)
        calib = make_calib()
        pre = preintegrate(jnp.asarray(accs), jnp.asarray(gyros),
                           jnp.asarray(dts), zero_bias(), calib)
        C = np.asarray(pre.cov)
        assert np.all(np.isfinite(C))
        evs = np.linalg.eigvalsh(0.5 * (C[:9, :9] + C[:9, :9].T))
        assert evs.min() >= -1e-10
        assert evs.max() > 0

    def test_vmap_over_windows(self):
        accs, gyros, dts, _ = simulate_trajectory(T=0.2)
        calib = make_calib()
        batch_acc = jnp.stack([jnp.asarray(accs)] * 4)
        batch_gyro = jnp.stack([jnp.asarray(gyros)] * 4)
        batch_dt = jnp.stack([jnp.asarray(dts)] * 4)
        pres = jax.vmap(lambda a, g, d: preintegrate(
            a, g, d, zero_bias(), calib))(batch_acc, batch_gyro, batch_dt)
        assert pres.dR.shape == (4, 3, 3)
        np.testing.assert_allclose(np.asarray(pres.dR[0]),
                                   np.asarray(pres.dR[3]), atol=1e-7)
