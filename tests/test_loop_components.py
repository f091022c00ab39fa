"""Tests: place recognition, Sim3 RANSAC/refinement, pose-graph optimization."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_fusion_tpu import cameras, lie
from orb_slam_fusion_tpu.place import KeyFrameDatabase, make_vocabulary
from orb_slam_fusion_tpu.place.vocabulary import bow_vector
from orb_slam_fusion_tpu.solver.pose_graph import (
    PoseGraphProblem, optimize_pose_graph)
from orb_slam_fusion_tpu.solver.sim3 import (
    horn_alignment, optimize_sim3, sim3_ransac)

CAM = jnp.array([400.0, 400.0, 320.0, 240.0])


def _random_desc(rng, n):
    return jnp.asarray(
        rng.randint(0, 2 ** 32, (n, 8), dtype=np.uint64).astype(np.uint32))


class TestPlaceRecognition:
    def test_same_place_scores_highest(self):
        rng = np.random.RandomState(0)
        vocab = make_vocabulary(1024)
        db = KeyFrameDatabase(vocab, max_kf=16)
        n = 256
        base = [_random_desc(rng, n) for _ in range(6)]
        valid = jnp.ones(n, bool)
        for i, d in enumerate(base):
            db.add(i, d, valid)
        # query = noisy copy of place 3 (flip a few bits per descriptor)
        d3 = np.asarray(base[3]).copy()
        for _ in range(4):
            w = rng.randint(0, 8, n)
            b = rng.randint(0, 32, n).astype(np.uint32)
            d3[np.arange(n), w] ^= (np.uint32(1) << b)
        q = db.compute_bow(jnp.asarray(d3), valid)
        ids, scores = db.query(q, jnp.zeros(16, bool), top_k=3)
        assert int(ids[0]) == 3, (ids, scores)
        assert float(scores[0]) > float(scores[1]) + 0.05

    def test_exclusion(self):
        rng = np.random.RandomState(1)
        vocab = make_vocabulary(1024)
        db = KeyFrameDatabase(vocab, max_kf=8)
        valid = jnp.ones(128, bool)
        descs = [_random_desc(rng, 128) for _ in range(4)]
        for i, d in enumerate(descs):
            db.add(i, d, valid)
        q = db.compute_bow(descs[2], valid)
        excl = jnp.zeros(8, bool).at[2].set(True)
        ids, _ = db.query(q, excl, top_k=2)
        assert 2 not in np.asarray(ids).tolist()


class TestSim3:
    def _corresp(self, key, n=100, scale=1.4):
        kp, kn = jax.random.split(key)
        x1 = jax.random.uniform(kp, (n, 3), minval=-2, maxval=2) \
            + jnp.array([0.0, 0.0, 5.0])
        S = lie.Sim3(jnp.asarray(scale),
                     lie.so3_exp(jnp.array([0.1, -0.2, 0.3])),
                     jnp.array([0.5, -0.3, 0.8]))
        x2 = lie.sim3_apply(S, x1)
        return x1, x2, S

    def test_horn_exact(self):
        x1, x2, S = self._corresp(jax.random.PRNGKey(0))
        s, R, t = horn_alignment(x1, x2)
        assert abs(float(s) - float(S.s)) < 1e-4
        np.testing.assert_allclose(np.asarray(R), np.asarray(S.R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), np.asarray(S.t), atol=1e-4)

    def test_ransac_with_outliers(self):
        x1, x2, S = self._corresp(jax.random.PRNGKey(1), n=120)
        # corrupt 30%
        n_out = 36
        x2 = x2.at[:n_out].add(
            jax.random.normal(jax.random.PRNGKey(2), (n_out, 3)) * 2.0)
        uv1 = cameras.pinhole_project(CAM, x1)
        uv2 = cameras.pinhole_project(CAM, x2)
        # uv2 of outliers corresponds to corrupted points: recompute from
        # TRUE x2 so the reprojection check rejects them
        x2_true = lie.sim3_apply(S, x1)
        uv2 = cameras.pinhole_project(CAM, x2_true)
        res = sim3_ransac(x1, x2, jnp.ones(120, bool), uv1, uv2, CAM,
                          jax.random.PRNGKey(3))
        assert bool(res.ok)
        assert abs(float(res.sim.s) - float(S.s)) < 0.02
        inl = np.asarray(res.inliers)
        assert inl[:n_out].mean() < 0.2
        assert inl[n_out:].mean() > 0.9

    def test_optimize_sim3_refines(self):
        x1, x2, S = self._corresp(jax.random.PRNGKey(4))
        uv1 = cameras.pinhole_project(CAM, x1)
        uv2 = cameras.pinhole_project(CAM, x2)
        # perturb the initial Sim3
        S0 = lie.sim3_compose(
            lie.sim3_exp(jnp.array([0.05, -0.03, 0.04, 0.02, -0.01,
                                    0.03, 0.05])), S)
        n = x1.shape[0]
        S_ref, inlier, n_in = optimize_sim3(
            S0, x1, x2, jnp.ones(n, bool), uv1, uv2,
            jnp.ones(n), jnp.ones(n), CAM)
        assert int(n_in) > n * 0.9
        assert abs(float(S_ref.s) - float(S.s)) < 1e-3
        np.testing.assert_allclose(np.asarray(S_ref.t), np.asarray(S.t),
                                   atol=5e-3)


class TestPoseGraph:
    def test_loop_correction(self):
        """Circular trajectory with accumulated drift; a loop edge between
        last and first keyframe must pull the loop closed."""
        K = 24
        # ground-truth poses on a circle (Sim3 with s=1)
        gt = []
        for k in range(K):
            ang = 2 * np.pi * k / K
            R = np.asarray(lie.so3_exp(jnp.array([0.0, ang, 0.0])))
            t = np.array([np.sin(ang) * 3, 0.0, 3 - np.cos(ang) * 3])
            gt.append(lie.Sim3(jnp.asarray(1.0), jnp.asarray(R, jnp.float32),
                               jnp.asarray(t, jnp.float32)))
        gt_b = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *gt)

        # odometry edges = exact relative poses S_rel[e] for (i -> j=i+1):
        # residual Log(S_rel S_i S_j^-1) = 0 at ground truth
        # residual = Log(rel * S_i * S_j^-1) => zero at GT iff
        # rel = S_j S_i^-1 for edge (i, j)
        edges_i, edges_j, rels = [], [], []
        for k in range(K - 1):
            rels.append(lie.sim3_compose(
                gt[k + 1], lie.sim3_inverse(gt[k])))  # S_j S_i^-1, j=k+1
            edges_i.append(k)
            edges_j.append(k + 1)
        # loop edge: i=K-1, j=0
        rels.append(lie.sim3_compose(gt[0], lie.sim3_inverse(gt[K - 1])))
        edges_i.append(K - 1)
        edges_j.append(0)
        rel_b = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *rels)

        # drift-corrupted initial estimates: noise + scale drift
        rng = np.random.RandomState(0)
        drift = []
        for k in range(K):
            xi = np.zeros(7, np.float32)
            xi[:3] = rng.randn(3) * 0.05 * (k / K)
            xi[3:6] = rng.randn(3) * 0.02 * (k / K)
            xi[6] = 0.15 * (k / K)  # growing scale drift
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
        poses, costs = optimize_pose_graph(prob, iters=30)
        costs = np.asarray(costs)
        assert costs[-1] < 1e-6, costs[-8:]
        # poses recover ground truth (anchored at pose 0)
        terr = np.abs(np.asarray(poses.t) - np.asarray(gt_b.t)).max()
        serr = np.abs(np.asarray(poses.s) - 1.0).max()
        assert terr < 2e-2, terr
        assert serr < 1e-3, serr


class TestPoseGraph4Dof:
    def test_yaw_drift_corrected(self):
        """4-DoF mode: yaw + translation drift is absorbed; roll/pitch and
        scale stay untouched (reference OptimizeEssentialGraph4DoF)."""
        K = 10
        gt = []
        for k in range(K):
            ang = 2 * np.pi * k / K
            # camera yawing about the world z axis on a circle
            R = np.asarray(lie.so3_exp(jnp.array([0.0, 0.0, ang])))
            t = np.array([np.sin(ang) * 2, 1 - np.cos(ang) * 2, 0.0])
            gt.append(lie.Sim3(jnp.asarray(1.0),
                               jnp.asarray(R, jnp.float32),
                               jnp.asarray(t, jnp.float32)))
        gt_b = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *gt)

        edges_i, edges_j, rels = [], [], []
        for k in range(K - 1):
            rels.append(lie.sim3_compose(gt[k + 1], lie.sim3_inverse(gt[k])))
            edges_i.append(k)
            edges_j.append(k + 1)
        rels.append(lie.sim3_compose(gt[0], lie.sim3_inverse(gt[K - 1])))
        edges_i.append(K - 1)
        edges_j.append(0)
        rel_b = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *rels)

        # drift only in the 4 observable dofs (world-side perturbation)
        rng = np.random.RandomState(1)
        drift = []
        for k in range(K):
            xi = np.zeros(7, np.float32)
            xi[:3] = rng.randn(3) * 0.05 * (k / K)
            xi[5] = 0.1 * (k / K)  # growing yaw drift (world z)
            drift.append(lie.sim3_compose(gt[k],
                                          lie.sim3_exp(jnp.asarray(xi))))
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
        poses, costs = optimize_pose_graph(prob, iters=30, four_dof=True)
        costs = np.asarray(costs)
        assert costs[-1] < 1e-6, costs[-8:]
        terr = np.abs(np.asarray(poses.t) - np.asarray(gt_b.t)).max()
        assert terr < 2e-2, terr
        # scale never moves in 4-DoF mode
        serr = np.abs(np.asarray(poses.s) - 1.0).max()
        assert serr < 1e-6, serr
