"""End-to-end loop closing on a constructed drifted map.

Drift-free synthetic tracking never needs explicit loop closure (revisits
re-match the original map points — the implicit loop). This test builds the
situation the reference's LoopClosing thread exists for: a keyframe chain
with accumulated (Sim3) drift whose tail revisits the head's scene with
duplicated map points, and verifies detection + Sim3 estimation + pose-graph
correction recover the ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_fusion_tpu import cameras, lie
from orb_slam_fusion_tpu.engine import SlamConfig
from orb_slam_fusion_tpu.engine.loop_closing import LoopCloser
from orb_slam_fusion_tpu.frontend.extractor import OrbParams
from orb_slam_fusion_tpu.map import map_state as ms

CAM = (400.0, 400.0, 376.0, 240.0)
N_FEAT = 256


class FakeTracker:
    """Minimal tracker facade for LoopCloser (map + cam + last KF)."""

    def __init__(self, m, cam_params, last_kf_id):
        self.map = m
        self.cam_params = jnp.asarray(cam_params)
        self.last_kf_id = last_kf_id
        self.cur_pose = lie.SE3(m.kf_pose.R[last_kf_id],
                                m.kf_pose.t[last_kf_id])
        self.velocity = lie.se3_identity()

    def _reset_prior(self):
        pass


def drive_loop_closer(closer, tracker, m, K):
    """Feed the tail keyframes one by one (temporal consistency needs the
    candidate region re-detected over >=3 consecutive keyframes,
    reference loopclosing.cc:303-391)."""
    closed = False
    for k in range(max(0, K - 5), K):
        tracker.last_kf_id = k
        tracker.cur_pose = lie.SE3(tracker.map.kf_pose.R[k],
                                   tracker.map.kf_pose.t[k])
        closed = closer.try_close(tracker) or closed
    # the production engine ticks the chunked background GBA per frame;
    # this harness has no frame loop, so drain it before asserting
    closer.gba_drain(tracker)
    return closed


def build_drifted_loop_map(K=20, n_world=3000, seed=0):
    """Circle of K keyframes with compounding drift; KF K-1 revisits KF 0."""
    rng = np.random.RandomState(seed)
    world = np.stack([
        rng.uniform(-9, 9, n_world),
        rng.uniform(-2.5, 2.5, n_world),
        rng.uniform(-6, 12, n_world),
    ], axis=1).astype(np.float32)
    desc = rng.randint(0, 2 ** 32, size=(n_world, 8),
                       dtype=np.uint64).astype(np.uint32)

    # GT poses on the circle (camera heading tangential)
    gt = []
    for k in range(K):
        ang = 2 * np.pi * k / K
        pos = np.array([3 * np.sin(ang), 0.0, 3 * (1 - np.cos(ang))])
        yaw = np.pi / 2 - ang
        R_wc = np.asarray(lie.so3_exp(jnp.array([0.0, yaw, 0.0])))
        R_cw = R_wc.T
        gt.append(lie.SE3(jnp.asarray(R_cw, jnp.float32),
                          jnp.asarray(-R_cw @ pos, jnp.float32)))

    # drift: smoothly growing rigid (SE3) error applied to the WORLD of
    # each keyframe; D_k maps true world -> drifted world, D_0 = I. (Scale
    # drift correction is exercised by the Sim3 pose-graph unit test; rigid
    # drift keeps the stored keyframe poses valid SE3s.)
    drifts = []
    for k in range(K):
        t = k / (K - 1)
        xi = np.zeros(6, np.float32)
        xi[:3] = t * np.array([0.35, -0.12, 0.3])
        xi[3:6] = t * np.array([0.02, 0.06, -0.03])
        drifts.append(lie.se3_exp(jnp.asarray(xi)))

    cfg = SlamConfig(cam_params=CAM, image_size=(480, 752),
                     orb=OrbParams(n_features=N_FEAT),
                     max_keyframes=K + 4, max_map_points=8192)
    m = ms.make_empty_map(K + 4, 8192, N_FEAT)
    cam = jnp.asarray(CAM)

    for k in range(K):
        # drifted pose: camera unchanged relative to its local scene, so
        # Tcw_drift = Tcw_gt o D_k^-1  (x_c = Tcw_gt (D_k^-1 x_drifted))
        D = drifts[k]
        pose_k = lie.se3_compose(gt[k], lie.se3_inverse(D))

        # visible world points (use GT geometry)
        pc_gt = np.asarray(lie.se3_apply(gt[k], jnp.asarray(world)))
        uv = np.asarray(cameras.pinhole_project(cam, jnp.asarray(pc_gt)))
        vis = (pc_gt[:, 2] > 0.3) & (pc_gt[:, 2] < 25) \
            & (uv[:, 0] >= 8) & (uv[:, 0] < 744) \
            & (uv[:, 1] >= 8) & (uv[:, 1] < 472)
        sal = np.random.RandomState(99).rand(n_world)
        idx = np.nonzero(vis)[0]
        idx = idx[np.argsort(-sal[idx])][:N_FEAT]
        n = len(idx)

        # drifted world position of these points as THIS KF sees them
        Xd = np.asarray(lie.se3_apply(D, jnp.asarray(world[idx])))

        f_uv = np.zeros((N_FEAT, 2), np.float32)
        f_desc = np.zeros((N_FEAT, 8), np.uint32)
        f_val = np.zeros(N_FEAT, bool)
        f_uv[:n] = uv[idx]
        f_desc[:n] = desc[idx]
        f_val[:n] = True

        # create NEW map points for every feature (duplicates across KFs —
        # worst case for fuse, and guarantees head/tail duplication)
        pos_new = np.zeros((N_FEAT, 3), np.float32)
        pos_new[:n] = Xd
        normals = np.zeros((N_FEAT, 3), np.float32)
        normals[:, 2] = 1.0
        m, mp_ids = ms.add_map_points(
            m, jnp.asarray(pos_new), jnp.asarray(f_desc),
            jnp.asarray(normals), jnp.int32(k), jnp.int32(k),
            jnp.asarray(f_val))
        m, kf_id = ms.add_keyframe(
            m, pose_k, float(k), jnp.asarray(f_uv), jnp.asarray(f_desc),
            jnp.zeros(N_FEAT, jnp.int32), jnp.asarray(f_val), mp_ids)

    return m, gt, drifts, cfg


def test_loop_detect_and_correct():
    m, gt, drifts, cfg = build_drifted_loop_map()
    K = len(gt)
    tracker = FakeTracker(m, CAM, K - 1)

    closer = LoopCloser(cfg, cfg.max_keyframes, vocab_words=2048)
    for k in range(K):
        closer.add_keyframe(k, m.kf_desc[k], m.kf_feat_valid[k])

    closed = drive_loop_closer(closer, tracker, m, K)
    assert closed, "loop was not detected/closed"
    assert len(closer.loop_edges) == 1  # edge persisted for later solves

    # after correction the keyframe poses should match GT up to the global
    # gauge anchored at the loop candidate keyframe
    mm = tracker.map
    # candidate should be near KF 0; measure trajectory alignment quality
    centers = []
    gt_centers = []
    for k in range(K):
        Twc = lie.se3_inverse(lie.SE3(mm.kf_pose.R[k], mm.kf_pose.t[k]))
        centers.append(np.asarray(Twc.t))
        gt_centers.append(np.asarray(lie.se3_inverse(gt[k]).t))
    centers = np.asarray(centers)
    gt_centers = np.asarray(gt_centers)
    from orb_slam_fusion_tpu.io import ate_rmse
    before = []
    for k in range(K):
        S = drifts[k]
        # drifted center for reference
        pose_k = lie.SE3(mm.kf_pose.R[k], mm.kf_pose.t[k])
        before.append(0)
    err = ate_rmse(centers, gt_centers, with_scale=False)
    assert err < 0.25, f"post-correction ATE {err:.3f}"


def test_loop_closing_with_tree_vocabulary(tmp_path):
    """Same loop, but candidates retrieved through a DBoW2-style tree
    vocabulary loaded from disk via SlamConfig.vocab_path (reference:
    System loads ORBvoc.bin at startup, system.cc:129)."""
    from orb_slam_fusion_tpu.place.tree_vocabulary import (
        save_tree_binary, train_vocabulary)

    m, gt, drifts, cfg = build_drifted_loop_map()
    K = len(gt)

    # train a small tree on the map's own descriptors and save it in the
    # fork's binary format
    all_desc = np.asarray(m.kf_desc[:K]).reshape(-1, 8)
    vocab = train_vocabulary(all_desc[:2000], k=8, levels=3, seed=1)
    path = str(tmp_path / "voc.bin")
    save_tree_binary(path, vocab, levels=3)

    cfg = cfg._replace(vocab_path=path)
    tracker = FakeTracker(m, CAM, K - 1)
    closer = LoopCloser(cfg, cfg.max_keyframes)
    assert closer.db.levels == 3
    for k in range(K):
        closer.add_keyframe(k, m.kf_desc[k], m.kf_feat_valid[k])

    closed = drive_loop_closer(closer, tracker, m, K)
    assert closed, "loop was not detected/closed with tree vocabulary"

    mm = tracker.map
    centers = np.asarray([
        np.asarray(lie.se3_inverse(
            lie.SE3(mm.kf_pose.R[k], mm.kf_pose.t[k])).t)
        for k in range(K)])
    gt_centers = np.asarray([
        np.asarray(lie.se3_inverse(gt[k]).t) for k in range(K)])
    from orb_slam_fusion_tpu.io import ate_rmse
    err = ate_rmse(centers, gt_centers, with_scale=False)
    assert err < 0.25, f"post-correction ATE {err:.3f}"


def test_aliased_single_hit_rejected():
    """Perceptual-aliasing stress (round-1 verdict item #6): ONE keyframe
    whose descriptors mimic a far-away scene but whose geometry differs must
    NOT close a loop. The temporal-consistency window (>=3 consecutive
    keyframe hits, reference loopclosing.cc:303-391) rejects the one-off
    hit before any Sim3 machinery runs; even when verification is reached,
    the Sim3-guided projection validation (loopclosing.cc:640-813) fails on
    the inconsistent geometry."""
    rng = np.random.RandomState(7)
    K = 18
    n_feat = N_FEAT
    cfg = SlamConfig(cam_params=CAM, image_size=(480, 752),
                     orb=OrbParams(n_features=n_feat),
                     max_keyframes=K + 4, max_map_points=8192)
    m = ms.make_empty_map(K + 4, 8192, n_feat)
    cam = jnp.asarray(CAM)

    head_desc = rng.randint(0, 2 ** 32, (n_feat, 8),
                            dtype=np.uint64).astype(np.uint32)
    for k in range(K):
        # straight corridor, no revisit
        pose_k = lie.SE3(jnp.eye(3),
                         jnp.asarray([0.0, 0.0, -0.5 * k], jnp.float32))
        pos = rng.uniform(-3, 3, (n_feat, 3)).astype(np.float32)
        pos[:, 2] += 0.5 * k + 5.0
        uv = np.asarray(cameras.pinhole_project(
            cam, jnp.asarray(pos - np.array([0, 0, -0.5 * k],
                                            np.float32))))
        if k == 0 or k == K - 2:
            # aliased pair: SAME descriptors, DIFFERENT geometry
            desc = head_desc
        else:
            desc = rng.randint(0, 2 ** 32, (n_feat, 8),
                               dtype=np.uint64).astype(np.uint32)
        f_val = np.ones(n_feat, bool)
        mn, mx = ms.scale_invariance_band(
            jnp.asarray(np.linalg.norm(pos, axis=1)),
            jnp.zeros(n_feat, jnp.int32), cfg.orb.num_levels)
        m, mp_ids = ms.add_map_points(
            m, jnp.asarray(pos), jnp.asarray(desc),
            jnp.asarray(pos / np.linalg.norm(pos, axis=1, keepdims=True)),
            jnp.int32(k), jnp.int32(k), jnp.asarray(f_val),
            min_dist=mn, max_dist=mx)
        m, _ = ms.add_keyframe(
            m, pose_k, float(k), jnp.asarray(uv.astype(np.float32)),
            jnp.asarray(desc), jnp.zeros(n_feat, jnp.int32),
            jnp.asarray(f_val), mp_ids)

    tracker = FakeTracker(m, CAM, K - 1)
    closer = LoopCloser(cfg, cfg.max_keyframes, vocab_words=2048)
    for k in range(K):
        closer.add_keyframe(k, m.kf_desc[k], m.kf_feat_valid[k])

    closed = drive_loop_closer(closer, tracker, m, K)
    assert not closed, "aliased one-off hit must not close a loop"
    assert closer.num_closed == 0
