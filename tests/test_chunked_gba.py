"""Chunked/abortable background global BA (reference: the GBA thread
spawned per loop closure with cooperative abort, loopclosing.cc:1104-1105
and RunGlobalBundleAdjustment correction propagation 2117-2327).

The TPU-native equivalent keeps the LM carry device-resident and advances
it by fixed-size lm_chunk dispatches interleaved with tracking; these tests
drive the host protocol: in-flight state after a closure, per-tick
progress, adoption into the live map (incl. keyframes created mid-solve),
and abort on compaction."""

import jax.numpy as jnp
import numpy as np

from orb_slam_fusion_tpu import lie
from orb_slam_fusion_tpu.engine.loop_closing import LoopCloser
from orb_slam_fusion_tpu.io import ate_rmse
from orb_slam_fusion_tpu.map import map_state as ms

from test_loop_closing_e2e import CAM, FakeTracker, build_drifted_loop_map


def _drive_no_drain(closer, tracker, K):
    closed = False
    for k in range(max(0, K - 5), K):
        tracker.last_kf_id = k
        tracker.cur_pose = lie.SE3(tracker.map.kf_pose.R[k],
                                   tracker.map.kf_pose.t[k])
        closed = closer.try_close(tracker) or closed
    return closed


def _centers(m, K):
    return np.asarray([
        np.asarray(lie.se3_inverse(
            lie.SE3(m.kf_pose.R[k], m.kf_pose.t[k])).t) for k in range(K)])


def test_gba_in_flight_then_adopt():
    m, gt, drifts, cfg = build_drifted_loop_map()
    K = len(gt)
    tracker = FakeTracker(m, CAM, K - 1)
    closer = LoopCloser(cfg, cfg.max_keyframes, vocab_words=2048)
    for k in range(K):
        closer.add_keyframe(k, m.kf_desc[k], m.kf_feat_valid[k])

    closed = _drive_no_drain(closer, tracker, K)
    assert closed
    # background mode: the closure returns with the GBA still in flight
    assert closer.pending_gba is not None
    assert not closer.pending_gba.done

    # tick to completion like the tracker's per-frame loop does
    ticks = 0
    while closer.pending_gba is not None:
        closer.gba_tick(tracker)
        ticks += 1
    assert ticks >= 2          # (3 + 7 iters) / chunk=2 -> several ticks
    gt_centers = np.asarray([
        np.asarray(lie.se3_inverse(g).t) for g in gt])
    err = ate_rmse(_centers(tracker.map, K), gt_centers, with_scale=False)
    assert err < 0.25, f"post-GBA ATE {err:.3f}"


def test_gba_abort_on_compaction():
    m, gt, drifts, cfg = build_drifted_loop_map()
    K = len(gt)
    tracker = FakeTracker(m, CAM, K - 1)
    closer = LoopCloser(cfg, cfg.max_keyframes, vocab_words=2048)
    for k in range(K):
        closer.add_keyframe(k, m.kf_desc[k], m.kf_feat_valid[k])
    assert _drive_no_drain(closer, tracker, K)
    assert closer.pending_gba is not None
    # a compaction invalidates the snapshot rows -> abort
    ident = np.arange(m.max_kf, dtype=np.int32)
    closer.on_kf_remap(ident, ident)
    assert closer.pending_gba is None


def test_gba_propagates_to_keyframes_created_mid_solve():
    """Keyframes inserted while the GBA runs are corrected through their
    relative pose to the newest snapshot keyframe (reference spanning-tree
    propagation, loopclosing.cc:2162-2230)."""
    m, gt, drifts, cfg = build_drifted_loop_map()
    K = len(gt)
    tracker = FakeTracker(m, CAM, K - 1)
    closer = LoopCloser(cfg, cfg.max_keyframes, vocab_words=2048)
    for k in range(K):
        closer.add_keyframe(k, m.kf_desc[k], m.kf_feat_valid[k])
    assert _drive_no_drain(closer, tracker, K)
    g = closer.pending_gba
    assert g is not None
    anchor = g.snap_n_kf - 1

    # insert a keyframe AFTER the snapshot with a known pose relative to
    # the anchor
    mm = tracker.map
    rel = lie.se3_exp(jnp.asarray(
        [0.2, -0.05, 0.1, 0.01, 0.04, -0.02], jnp.float32))
    T_anchor = lie.SE3(mm.kf_pose.R[anchor], mm.kf_pose.t[anchor])
    T_new = lie.se3_compose(rel, T_anchor)
    F = mm.n_feat
    mm, new_id = ms.add_keyframe(
        mm, T_new, float(K), jnp.zeros((F, 2), jnp.float32),
        jnp.zeros((F, 8), jnp.uint32), jnp.zeros(F, jnp.int32),
        jnp.zeros(F, bool), jnp.full(F, -1, jnp.int32))
    tracker.map = mm
    tracker.last_kf_id = int(new_id)

    while closer.pending_gba is not None:
        closer.gba_tick(tracker)

    mm = tracker.map
    T_anchor2 = lie.SE3(mm.kf_pose.R[anchor], mm.kf_pose.t[anchor])
    T_new2 = lie.SE3(mm.kf_pose.R[int(new_id)], mm.kf_pose.t[int(new_id)])
    rel2 = lie.se3_compose(T_new2, lie.se3_inverse(T_anchor2))
    np.testing.assert_allclose(np.asarray(rel2.R), np.asarray(rel.R),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(rel2.t), np.asarray(rel.t),
                               atol=1e-4)
