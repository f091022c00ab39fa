"""Tests for two-view RANSAC initialization and the map tables."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_fusion_tpu import cameras, lie, two_view
from orb_slam_fusion_tpu.map import (
    make_empty_map, add_keyframe, add_map_points, covisibility_matrix,
    observation_triples)


def _make_pair(key, n=300, outlier_frac=0.2, planar=False):
    kp, ko = jax.random.split(key)
    if planar:
        pts = jax.random.uniform(kp, (n, 3), minval=-2, maxval=2)
        pts = pts.at[:, 2].set(5.0 + 0.3 * pts[:, 0])  # near-planar slab
    else:
        pts = jax.random.uniform(kp, (n, 3), minval=-2, maxval=2) \
            + jnp.array([0.0, 0.0, 5.0])
    T21 = lie.SE3(lie.so3_exp(jnp.array([0.02, -0.05, 0.01])),
                  jnp.array([-0.6, 0.05, 0.02]))
    p2 = lie.se3_apply(T21, pts)
    rays1 = pts / pts[:, 2:3]
    rays2 = p2 / p2[:, 2:3]
    n_out = int(n * outlier_frac)
    noise = jax.random.normal(ko, (n_out, 3)) * 0.2
    rays2 = rays2.at[:n_out].add(noise.at[:, 2].set(0.0))
    return rays1, rays2, T21, pts, n_out


class TestTwoView:
    def test_recovers_pose(self):
        rays1, rays2, T21, pts, n_out = _make_pair(jax.random.PRNGKey(0))
        res = two_view.two_view_init(
            rays1, rays2, jnp.ones(rays1.shape[0], bool),
            jax.random.PRNGKey(1))
        assert bool(res.ok)
        # rotation error
        dR = res.R21 @ T21.R.T
        ang = np.arccos(np.clip((np.trace(np.asarray(dR)) - 1) / 2, -1, 1))
        assert ang < 0.01, ang
        # translation direction error (scale-free)
        t_true = np.asarray(T21.t) / np.linalg.norm(np.asarray(T21.t))
        t_est = np.asarray(res.t21)
        assert min(np.linalg.norm(t_est - t_true),
                   np.linalg.norm(t_est + t_true)) < 0.02
        # outliers rejected
        inl = np.asarray(res.inliers)
        assert inl[:n_out].mean() < 0.2
        assert inl[n_out:].mean() > 0.8
        # triangulated structure matches up to the recovered scale
        s = np.linalg.norm(np.asarray(T21.t))
        X = np.asarray(res.points1)[n_out:] * s
        good = np.asarray(res.inliers)[n_out:]
        err = np.linalg.norm(X[good] - np.asarray(pts)[n_out:][good], axis=1)
        assert np.median(err) < 0.05, np.median(err)

    def test_planar_scene(self):
        rays1, rays2, T21, pts, n_out = _make_pair(
            jax.random.PRNGKey(2), outlier_frac=0.1, planar=True)
        res = two_view.two_view_init(
            rays1, rays2, jnp.ones(rays1.shape[0], bool),
            jax.random.PRNGKey(3))
        assert bool(res.ok)
        dR = res.R21 @ T21.R.T
        ang = np.arccos(np.clip((np.trace(np.asarray(dR)) - 1) / 2, -1, 1))
        assert ang < 0.02, ang

    def test_degenerate_fails_gracefully(self):
        # identical frames: no parallax -> must not report success with
        # a confident translation
        key = jax.random.PRNGKey(4)
        pts = jax.random.uniform(key, (200, 3), minval=-2, maxval=2) \
            + jnp.array([0.0, 0.0, 5.0])
        rays = pts / pts[:, 2:3]
        res = two_view.two_view_init(
            rays, rays, jnp.ones(200, bool), jax.random.PRNGKey(5))
        assert not bool(res.ok)


class TestMapState:
    def test_add_and_covisibility(self):
        F, M, K = 8, 32, 4
        m = make_empty_map(K, M, F)
        uv = jnp.zeros((F, 2))
        desc = jnp.zeros((F, 8), jnp.uint32)
        octv = jnp.zeros(F, jnp.int32)
        fv = jnp.ones(F, bool)

        # add 10 map points
        pos = jnp.arange(30, dtype=jnp.float32).reshape(10, 3)
        m, ids = add_map_points(
            m, pos, jnp.zeros((10, 8), jnp.uint32), jnp.zeros((10, 3)),
            jnp.int32(0), jnp.int32(0), jnp.ones(10, bool))
        assert int(m.n_mp) == 10
        np.testing.assert_array_equal(np.asarray(ids), np.arange(10))

        # kf0 observes mps 0..7, kf1 observes 4..11 (only 4..9 valid)
        obs0 = jnp.arange(8, dtype=jnp.int32)
        obs1 = jnp.arange(4, 12, dtype=jnp.int32)
        m, k0 = add_keyframe(m, lie.se3_identity(), 0.0, uv, desc, octv, fv, obs0)
        m, k1 = add_keyframe(m, lie.se3_identity(), 1.0, uv, desc, octv, fv, obs1)
        assert int(k0) == 0 and int(k1) == 1

        W = np.asarray(covisibility_matrix(m))
        # shared = mps 4..7 -> 4 (obs1's 10,11 are invalid mp ids)
        assert W[0, 1] == 4 and W[1, 0] == 4
        assert W[0, 0] == 0

    def test_observation_triples(self):
        F, M, K = 4, 16, 3
        m = make_empty_map(K, M, F)
        m, _ = add_map_points(
            m, jnp.ones((6, 3)), jnp.zeros((6, 8), jnp.uint32),
            jnp.zeros((6, 3)), jnp.int32(0), jnp.int32(0), jnp.ones(6, bool))
        uv = jnp.arange(8, dtype=jnp.float32).reshape(4, 2)
        m, _ = add_keyframe(
            m, lie.se3_identity(), 0.0, uv, jnp.zeros((F, 8), jnp.uint32),
            jnp.zeros(F, jnp.int32), jnp.ones(F, bool),
            jnp.array([0, 2, -1, 5], jnp.int32))
        kf_idx, mp_idx, uv_o, octv, valid = observation_triples(
            m, jnp.array([0, -1], jnp.int32))
        valid = np.asarray(valid)
        assert valid.sum() == 3  # features 0,1,3 of kf0
        assert set(np.asarray(mp_idx)[valid].tolist()) == {0, 2, 5}

    def test_capacity_overflow_is_safe(self):
        m = make_empty_map(1, 4, 2)
        uv = jnp.zeros((2, 2))
        args = (uv, jnp.zeros((2, 8), jnp.uint32), jnp.zeros(2, jnp.int32),
                jnp.ones(2, bool), jnp.full(2, -1, jnp.int32))
        m, k0 = add_keyframe(m, lie.se3_identity(), 0.0, *args)
        m, k1 = add_keyframe(m, lie.se3_identity(), 1.0, *args)
        assert int(k0) == 0 and int(k1) == -1
        assert int(m.n_kf) == 1
        # map point overflow
        m, ids = add_map_points(
            m, jnp.ones((6, 3)), jnp.zeros((6, 8), jnp.uint32),
            jnp.zeros((6, 3)), jnp.int32(0), jnp.int32(0), jnp.ones(6, bool))
        assert int(m.n_mp) == 4
        assert (np.asarray(ids) == -1).sum() == 2
