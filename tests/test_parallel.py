"""Distributed BA on the 8-device virtual CPU mesh + fused-step checks."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_fusion_tpu import cameras, lie
from orb_slam_fusion_tpu.engine.step import fused_track_step
from orb_slam_fusion_tpu.parallel import (
    distributed_bundle_adjustment, make_slam_mesh)
from orb_slam_fusion_tpu.solver import ba

CAM = jnp.array([400.0, 400.0, 320.0, 240.0])


def _synthetic_problem(key, n_kf=6, n_pts=96, perturb=0.04):
    kp, k2, k3 = jax.random.split(key, 3)
    pts = jax.random.uniform(kp, (n_pts, 3), minval=-2, maxval=2) \
        + jnp.array([0.0, 0.0, 6.0])
    poses = jax.tree_util.tree_map(
        lambda *x: jnp.stack(x),
        *[lie.se3_exp(jnp.array([0.3 * k, 0.0, 0.0, 0.0, 0.04 * k, 0.0]))
          for k in range(n_kf)])
    kf_idx = jnp.repeat(jnp.arange(n_kf), n_pts).astype(jnp.int32)
    mp_idx = jnp.tile(jnp.arange(n_pts), n_kf).astype(jnp.int32)
    pc = lie.se3_apply(lie.SE3(poses.R[kf_idx], poses.t[kf_idx]), pts[mp_idx])
    uv = cameras.pinhole_project(CAM, pc)
    dxi = perturb * jax.random.normal(k2, (n_kf, 6))
    dxi = dxi.at[0].set(0).at[1].set(0)
    fixed = jnp.zeros(n_kf, bool).at[0].set(True).at[1].set(True)
    prob = ba.make_problem(
        lie.se3_boxplus(poses, dxi),
        pts + 0.08 * jax.random.normal(k3, pts.shape),
        kf_idx, mp_idx, uv, jnp.ones(uv.shape[0]),
        jnp.ones(uv.shape[0], bool), fixed, CAM)
    return prob, poses, pts


class TestDistributedBA:
    def test_matches_single_device_descent(self):
        prob, poses_true, pts_true = _synthetic_problem(jax.random.PRNGKey(0))
        mesh = make_slam_mesh(8)
        poses, points, costs = distributed_bundle_adjustment(
            prob, mesh, iters=12)
        costs = np.asarray(costs)
        assert costs[-1] < costs[0] * 1e-2, costs
        rel = lie.se3_compose(poses, lie.se3_inverse(poses_true))
        errs = np.asarray(jax.vmap(lie.se3_log)(rel))
        assert np.abs(errs).max() < 5e-3, errs

    def test_nondivisible_landmark_count(self):
        # 96 pts already divisible; try 50 (pads to 56)
        prob, poses_true, _ = _synthetic_problem(
            jax.random.PRNGKey(1), n_pts=50)
        mesh = make_slam_mesh(8)
        poses, points, costs = distributed_bundle_adjustment(
            prob, mesh, iters=8)
        costs = np.asarray(costs)
        assert np.isfinite(costs).all()
        assert costs[-1] < costs[0] * 0.1
        assert points.shape[0] == 50


class TestFusedStep:
    def test_tracks_synthetic_frame(self):
        key = jax.random.PRNGKey(2)
        M, F = 256, 128
        pts = jax.random.uniform(key, (M, 3), minval=-2, maxval=2) \
            + jnp.array([0.0, 0.0, 6.0])
        desc = jax.random.randint(
            jax.random.PRNGKey(3), (M, 8), 0, 2 ** 31 - 1,
            dtype=jnp.int32).astype(jnp.uint32)
        true_pose = lie.se3_exp(
            jnp.array([0.05, -0.02, 0.1, 0.01, 0.02, -0.01]))
        pc = lie.se3_apply(true_pose, pts)
        uv = cameras.pinhole_project(CAM, pc)
        inb = ((uv[:, 0] >= 0) & (uv[:, 0] < 752)
               & (uv[:, 1] >= 0) & (uv[:, 1] < 480))
        sel = jnp.nonzero(inb, size=F, fill_value=0)[0]
        kp_uv = uv[sel]
        kp_desc = desc[sel]
        kp_valid = inb[sel]

        res = fused_track_step(
            pts, desc, jnp.ones(M, bool),
            lie.se3_identity(), lie.se3_identity(),
            kp_uv, kp_desc, kp_valid, jnp.zeros(F, jnp.int32),
            jnp.ones(F), CAM)
        err = lie.se3_log(lie.se3_compose(res.pose,
                                          lie.se3_inverse(true_pose)))
        assert np.linalg.norm(np.asarray(err)) < 1e-3
        assert int(res.n_inliers) > F // 2


class TestDistributedPoseGraph:
    def test_matches_single_device(self):
        """Edge-sharded pose graph descends and matches the single-device
        optimizer's result on a drifted loop."""
        from orb_slam_fusion_tpu.parallel import distributed_pose_graph
        from orb_slam_fusion_tpu.solver.pose_graph import (
            PoseGraphProblem, optimize_pose_graph)

        K = 12
        gt = []
        for k in range(K):
            ang = 2 * np.pi * k / K
            R = np.asarray(lie.so3_exp(jnp.array([0.0, ang, 0.0])))
            t = np.array([np.sin(ang) * 3, 0.0, 3 - np.cos(ang) * 3])
            gt.append(lie.Sim3(jnp.asarray(1.0),
                               jnp.asarray(R, jnp.float32),
                               jnp.asarray(t, jnp.float32)))
        edges_i, edges_j, rels = [], [], []
        for k in range(K - 1):
            rels.append(lie.sim3_compose(gt[k + 1], lie.sim3_inverse(gt[k])))
            edges_i.append(k)
            edges_j.append(k + 1)
        rels.append(lie.sim3_compose(gt[0], lie.sim3_inverse(gt[K - 1])))
        edges_i.append(K - 1)
        edges_j.append(0)
        rel_b = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *rels)

        rng = np.random.RandomState(3)
        drift = []
        for k in range(K):
            xi = np.zeros(7, np.float32)
            xi[:3] = rng.randn(3) * 0.05 * (k / K)
            xi[6] = 0.1 * (k / K)
            drift.append(lie.sim3_compose(
                lie.sim3_exp(jnp.asarray(xi)), gt[k]))
        init_b = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *drift)

        prob = PoseGraphProblem(
            poses=init_b,
            edge_i=jnp.asarray(edges_i, jnp.int32),
            edge_j=jnp.asarray(edges_j, jnp.int32),
            edge_rel=rel_b,
            edge_weight=jnp.ones(K, jnp.float32),
            edge_valid=jnp.ones(K, bool),
            fixed=jnp.zeros(K, bool).at[0].set(True),
        )
        mesh = make_slam_mesh(8)
        # E = 12 edges pads to 16 over 8 devices
        dposes, dcosts = distributed_pose_graph(prob, mesh, iters=25)
        sposes, scosts = optimize_pose_graph(prob, iters=25)
        dcosts, scosts = np.asarray(dcosts), np.asarray(scosts)
        assert dcosts[-1] < 1e-6, dcosts[-5:]
        terr = np.abs(np.asarray(dposes.t) - np.asarray(sposes.t)).max()
        assert terr < 1e-3, terr


class TestDistributedTracking:
    """Map-sharded per-frame tracking (parallel/dist_track.py)."""

    def _frame(self, M=256, F=128):
        key = jax.random.PRNGKey(2)
        pts = jax.random.uniform(key, (M, 3), minval=-2, maxval=2) \
            + jnp.array([0.0, 0.0, 6.0])
        desc = jax.random.randint(
            jax.random.PRNGKey(3), (M, 8), 0, 2 ** 31 - 1,
            dtype=jnp.int32).astype(jnp.uint32)
        true_pose = lie.se3_exp(
            jnp.array([0.05, -0.02, 0.1, 0.01, 0.02, -0.01]))
        pc = lie.se3_apply(true_pose, pts)
        uv = cameras.pinhole_project(CAM, pc)
        inb = ((uv[:, 0] >= 0) & (uv[:, 0] < 752)
               & (uv[:, 1] >= 0) & (uv[:, 1] < 480))
        sel = jnp.nonzero(inb, size=F, fill_value=0)[0]
        return pts, desc, true_pose, uv[sel], desc[sel], inb[sel]

    def test_recovers_pose_on_mesh(self):
        from orb_slam_fusion_tpu.parallel import (
            distributed_frame_update, pad_map_for_mesh)
        M, F = 256, 128
        pts, desc, true_pose, kp_uv, kp_desc, kp_valid = self._frame(M, F)
        mesh = make_slam_mesh(8)
        mp = pad_map_for_mesh(mesh, pts, desc, jnp.ones(M, bool),
                              jnp.zeros(M, jnp.int32), jnp.zeros(M, jnp.int32))
        res = distributed_frame_update(
            *mp, lie.se3_identity(), lie.se3_identity(),
            kp_uv, kp_desc, kp_valid, jnp.ones(F), CAM, mesh, iters=10)
        err = lie.se3_log(lie.se3_compose(res.pose,
                                          lie.se3_inverse(true_pose)))
        assert np.linalg.norm(np.asarray(err)) < 1e-3
        n_match, n_in = np.asarray(res.counts)
        assert n_in > F // 2
        # counters updated only on owned (valid) rows
        assert int(res.mp_found.sum()) == n_in

    def test_matches_single_device_step(self):
        """Mesh result == single-device fused step (same semantics)."""
        from orb_slam_fusion_tpu.parallel import (
            distributed_frame_update, pad_map_for_mesh)
        M, F = 256, 128
        pts, desc, true_pose, kp_uv, kp_desc, kp_valid = self._frame(M, F)

        single = fused_track_step(
            pts, desc, jnp.ones(M, bool),
            lie.se3_identity(), lie.se3_identity(),
            kp_uv, kp_desc, kp_valid, jnp.zeros(F, jnp.int32),
            jnp.ones(F), CAM)

        mesh = make_slam_mesh(8)
        mp = pad_map_for_mesh(mesh, pts, desc, jnp.ones(M, bool),
                              jnp.zeros(M, jnp.int32), jnp.zeros(M, jnp.int32))
        res = distributed_frame_update(
            *mp, lie.se3_identity(), lie.se3_identity(),
            kp_uv, kp_desc, kp_valid, jnp.ones(F), CAM, mesh)

        rel = lie.se3_log(lie.se3_compose(res.pose,
                                          lie.se3_inverse(single.pose)))
        assert np.linalg.norm(np.asarray(rel)) < 1e-2, rel
