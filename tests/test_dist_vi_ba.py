"""Distributed (landmark-sharded) VI-BA vs the single-device solver.

The distributed variant (parallel/dist_vi_ba.py) shards the visual factor
evaluation + Schur elimination over the 8-device virtual mesh and keeps
the O(K) inertial chain replicated; it must descend and land on the same
state as solver.vi_ba.visual_inertial_ba (identical math, different
reduction order).
"""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_fusion_tpu import cameras, lie
from orb_slam_fusion_tpu.parallel import (
    distributed_visual_inertial_ba, make_slam_mesh)
from orb_slam_fusion_tpu.solver import ba
from orb_slam_fusion_tpu.solver.vi_ba import VIState, visual_inertial_ba
from tests.test_vi_ba import _build_vi_problem

CAM = jnp.array([400.0, 400.0, 320.0, 240.0])


def _problem(seed=1, n_pts=120):
    poses, vel_true, ifac, calib, K = _build_vi_problem(seed=seed)
    rng = np.random.RandomState(0)
    pts = rng.uniform(-3, 3, (n_pts, 3)).astype(np.float32)
    pts[:, 2] = np.abs(pts[:, 2]) + 3.0
    pts_j = jnp.asarray(pts)
    kf_idx = jnp.repeat(jnp.arange(K), n_pts).astype(jnp.int32)
    mp_idx = jnp.tile(jnp.arange(n_pts), K).astype(jnp.int32)
    pc = lie.se3_apply(lie.SE3(poses.R[kf_idx], poses.t[kf_idx]),
                       pts_j[mp_idx])
    uv = cameras.pinhole_project(CAM, pc)
    valid = pc[:, 2] > 0.2
    fixed = jnp.zeros(K, bool).at[0].set(True)
    prob = ba.make_problem(
        poses, pts_j, kf_idx, mp_idx, uv, jnp.ones(uv.shape[0]),
        valid, fixed, CAM, max_obs=K)

    dxi = 0.02 * rng.randn(K, 6).astype(np.float32)
    dxi[0] = 0
    state0 = VIState(
        poses=lie.se3_boxplus(poses, jnp.asarray(dxi)),
        vel=jnp.asarray(vel_true) + 0.1 * jnp.asarray(
            rng.randn(K, 3), jnp.float32),
        bg=jnp.zeros((K, 3)) + 0.005,
        ba=jnp.zeros((K, 3)) + 0.05,
    )
    prob = prob._replace(
        points=pts_j + 0.05 * jnp.asarray(rng.randn(n_pts, 3),
                                          jnp.float32))
    return state0, prob, ifac, calib, fixed, poses, vel_true


class TestDistributedVIBA:
    def test_descends_and_recovers_state(self):
        state0, prob, ifac, calib, fixed, poses_true, vel_true = _problem()
        mesh = make_slam_mesh(8)
        state, points, costs = distributed_visual_inertial_ba(
            state0, prob, ifac, calib, mesh, fixed_pose=fixed)
        costs = np.asarray(costs)
        assert costs[-1] < costs[0] * 0.25, costs
        rel = lie.se3_compose(state.poses, lie.se3_inverse(poses_true))
        errs = np.asarray(jax.vmap(lie.se3_log)(rel))
        assert np.abs(errs).max() < 5e-3, np.abs(errs).max()
        verr = np.abs(np.asarray(state.vel) - np.asarray(vel_true)).max()
        assert verr < 0.05, verr
        assert np.abs(np.asarray(state.bg)).max() < 5e-3

    def test_matches_single_device(self):
        state0, prob, ifac, calib, fixed, _, _ = _problem(seed=2)
        mesh = make_slam_mesh(8)
        d_state, d_points, d_costs = distributed_visual_inertial_ba(
            state0, prob, ifac, calib, mesh, fixed_pose=fixed, iters=8)
        s_state, s_points, s_costs = visual_inertial_ba(
            state0, prob, ifac, calib, fixed_pose=fixed, iters=8)
        # same math, different fp reduction order: states agree to ~1e-3
        terr = np.abs(np.asarray(d_state.poses.t)
                      - np.asarray(s_state.poses.t)).max()
        assert terr < 2e-3, terr
        verr = np.abs(np.asarray(d_state.vel)
                      - np.asarray(s_state.vel)).max()
        assert verr < 5e-3, verr

    def test_nondivisible_landmark_count(self):
        state0, prob, ifac, calib, fixed, _, _ = _problem(n_pts=101)
        mesh = make_slam_mesh(8)
        state, points, costs = distributed_visual_inertial_ba(
            state0, prob, ifac, calib, mesh, fixed_pose=fixed, iters=6)
        costs = np.asarray(costs)
        assert np.isfinite(costs).all()
        assert costs[-1] < costs[0]
        assert points.shape[0] == 101
