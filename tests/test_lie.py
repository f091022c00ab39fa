"""Unit tests for the batched Lie-group core (SO3/SE3/Sim3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_fusion_tpu import lie


def _rand_w(key, batch=(), scale=1.0):
    """Random rotation vectors with |w| < pi (log-map principal branch)."""
    k1, k2 = jax.random.split(key)
    d = jax.random.normal(k1, batch + (3,), dtype=jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    mag = jax.random.uniform(k2, batch + (1,), minval=0.0,
                             maxval=min(scale, 3.1))
    return d * mag


class TestSO3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(0)
        w = _rand_w(key, (64,), scale=1.5)
        R = lie.so3_exp(w)
        w2 = lie.so3_log(R)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=2e-5)

    def test_exp_is_rotation(self):
        key = jax.random.PRNGKey(1)
        w = _rand_w(key, (32,), scale=3.0)
        R = lie.so3_exp(w)
        RtR = jnp.einsum("...ji,...jk->...ik", R, R)
        np.testing.assert_allclose(
            np.asarray(RtR), np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5
        )
        det = jnp.linalg.det(R)
        np.testing.assert_allclose(np.asarray(det), 1.0, atol=1e-5)

    def test_small_angle(self):
        w = jnp.array([[1e-9, -2e-9, 1e-9], [0.0, 0.0, 0.0]], dtype=jnp.float32)
        R = lie.so3_exp(w)
        np.testing.assert_allclose(
            np.asarray(R), np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6
        )
        w2 = lie.so3_log(R)
        assert np.all(np.isfinite(np.asarray(w2)))

    def test_near_pi(self):
        # Rotations very close to pi are where the naive log breaks down.
        axis = jnp.array([1.0, 0.5, -0.25])
        axis = axis / jnp.linalg.norm(axis)
        for ang in [np.pi - 1e-3, np.pi - 1e-5]:
            w = (ang * axis).astype(jnp.float32)
            R = lie.so3_exp(w)
            w2 = lie.so3_log(R)
            R2 = lie.so3_exp(w2)
            np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)

    def test_quat_roundtrip(self):
        key = jax.random.PRNGKey(2)
        w = _rand_w(key, (64,), scale=2.0)
        R = lie.so3_exp(w)
        q = lie.quat_from_mat(R)
        R2 = lie.mat_from_quat(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)

    def test_right_jacobian_fd(self):
        # exp(w + dw) ≈ exp(w) exp(Jr(w) dw)
        key = jax.random.PRNGKey(3)
        w = _rand_w(key, (), scale=1.0)
        Jr = lie.so3_right_jacobian(w)
        eps = 1e-4
        for i in range(3):
            dw = jnp.zeros(3).at[i].set(eps)
            lhs = lie.so3_exp(w + dw)
            rhs = lie.so3_exp(w) @ lie.so3_exp(Jr @ dw)
            np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-6)

    def test_right_jacobian_inv(self):
        key = jax.random.PRNGKey(4)
        w = _rand_w(key, (16,), scale=1.5)
        Jr = lie.so3_right_jacobian(w)
        Jri = lie.so3_right_jacobian_inv(w)
        prod = Jr @ Jri
        np.testing.assert_allclose(
            np.asarray(prod), np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-4
        )


class TestSE3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(5)
        xi = jax.random.normal(key, (32, 6), dtype=jnp.float32)
        xi = xi.at[:, 3:].multiply(0.9)  # keep |w| < pi (principal branch)
        T = lie.se3_exp(xi)
        xi2 = lie.se3_log(T)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)

    def test_compose_inverse(self):
        key = jax.random.PRNGKey(6)
        xi = jax.random.normal(key, (8, 6), dtype=jnp.float32)
        T = lie.se3_exp(xi)
        I = lie.se3_compose(T, lie.se3_inverse(T))
        np.testing.assert_allclose(
            np.asarray(I.R), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(I.t), 0.0, atol=1e-5)

    def test_action_matches_matrix(self):
        key = jax.random.PRNGKey(7)
        k1, k2 = jax.random.split(key)
        xi = jax.random.normal(k1, (6,), dtype=jnp.float32)
        x = jax.random.normal(k2, (10, 3), dtype=jnp.float32)
        T = lie.se3_exp(xi)
        M = lie.se3_to_matrix(T)
        xh = jnp.concatenate([x, jnp.ones((10, 1))], axis=-1)
        expected = (M @ xh.T).T[:, :3]
        np.testing.assert_allclose(
            np.asarray(lie.se3_apply(T, x)), np.asarray(expected), atol=1e-5
        )

    def test_adjoint(self):
        # Ad_T such that T exp(xi) T^-1 = exp(Ad_T xi)
        key = jax.random.PRNGKey(8)
        k1, k2 = jax.random.split(key)
        T = lie.se3_exp(jax.random.normal(k1, (6,), dtype=jnp.float32))
        xi = 1e-3 * jax.random.normal(k2, (6,), dtype=jnp.float32)
        lhs = lie.se3_compose(lie.se3_compose(T, lie.se3_exp(xi)), lie.se3_inverse(T))
        rhs = lie.se3_exp(lie.se3_adjoint(T) @ xi)
        np.testing.assert_allclose(np.asarray(lhs.R), np.asarray(rhs.R), atol=1e-6)
        np.testing.assert_allclose(np.asarray(lhs.t), np.asarray(rhs.t), atol=1e-6)


class TestSim3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(9)
        xi = jax.random.normal(key, (32, 7), dtype=jnp.float32)
        xi = xi.at[:, 6].multiply(0.3)  # keep scales reasonable
        xi = xi.at[:, 3:6].multiply(0.5)  # keep |w| < pi (principal branch)
        S = lie.sim3_exp(xi)
        xi2 = lie.sim3_log(S)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=3e-4)

    def test_zero_is_identity(self):
        S = lie.sim3_exp(jnp.zeros(7))
        np.testing.assert_allclose(np.asarray(S.s), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(S.R), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(S.t), 0.0, atol=1e-6)

    def test_compose_inverse(self):
        key = jax.random.PRNGKey(10)
        xi = jax.random.normal(key, (8, 7), dtype=jnp.float32)
        xi = xi.at[:, 6].multiply(0.3)
        S = lie.sim3_exp(xi)
        I = lie.sim3_compose(S, lie.sim3_inverse(S))
        np.testing.assert_allclose(np.asarray(I.s), 1.0, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(I.R), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(I.t), 0.0, atol=1e-4)

    def test_pure_scale(self):
        xi = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.5])
        S = lie.sim3_exp(xi)
        np.testing.assert_allclose(np.asarray(S.s), np.exp(0.5), atol=1e-6)
        x = jnp.array([1.0, 2.0, 3.0])
        np.testing.assert_allclose(
            np.asarray(lie.sim3_apply(S, x)), np.exp(0.5) * np.asarray(x), atol=1e-5
        )

    def test_sim3_action_consistency(self):
        key = jax.random.PRNGKey(11)
        k1, k2, k3 = jax.random.split(key, 3)
        xi1 = jax.random.normal(k1, (7,), dtype=jnp.float32) * 0.5
        xi2 = jax.random.normal(k2, (7,), dtype=jnp.float32) * 0.5
        x = jax.random.normal(k3, (5, 3), dtype=jnp.float32)
        A, B = lie.sim3_exp(xi1), lie.sim3_exp(xi2)
        lhs = lie.sim3_apply(lie.sim3_compose(A, B), x)
        rhs = lie.sim3_apply(A, lie.sim3_apply(B, x))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


def test_jit_and_vmap_compose():
    f = jax.jit(lambda xi: lie.se3_log(lie.se3_exp(xi)))
    xi = jnp.linspace(-1, 1, 6 * 4).reshape(4, 6).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(f(xi)), np.asarray(xi), atol=1e-4)
    g = jax.vmap(lambda w: lie.so3_log(lie.so3_exp(w)))
    w = xi[:, :3]
    np.testing.assert_allclose(np.asarray(g(w)), np.asarray(w), atol=1e-5)
