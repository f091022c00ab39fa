"""Loop-closing false-positive stress (perceptual aliasing).

The reference never accepts a loop from appearance alone: BoW candidates
must survive temporal consistency (loopclosing.cc:303-391), Sim3 RANSAC,
and staged Sim3-guided projection validation (>=50 / >=80 matches,
loopclosing.cc:640-813). This test builds the adversarial case those
stages exist for — a corridor whose far end is PERCEPTUALLY IDENTICAL to
its start (the exact same descriptor multiset) but geometrically
unrelated (scrambled 3D arrangement). A single-shot BoW+pose accept would
close a catastrophic false loop here; the staged pipeline must reject it.

A positive control re-runs the same construction with the far end a rigid
COPY of the start (descriptors and arrangement both preserved): detection
and verification then fire, proving the negative case is rejected by
geometry, not by the detector never producing candidates.
"""

import jax.numpy as jnp
import numpy as np

from orb_slam_fusion_tpu import cameras, lie
from orb_slam_fusion_tpu.engine import SlamConfig
from orb_slam_fusion_tpu.engine.loop_closing import LoopCloser
from orb_slam_fusion_tpu.frontend.extractor import OrbParams
from orb_slam_fusion_tpu.map import map_state as ms

from test_loop_closing_e2e import FakeTracker

CAM = (400.0, 400.0, 376.0, 240.0)
N_FEAT = 256


def _build_aliased_corridor(aliased_rigid: bool, K=20, n_region=1500,
                            seed=0):
    """K keyframes advancing down a corridor of three point regions:
    head region A (KFs 0-7), filler C (KFs 8-11), far region B (KFs 12+).
    B's descriptors are byte-for-byte A's; its geometry is either a rigid
    +z copy of A (aliased_rigid=True — a genuine-looking revisit) or an
    independent scramble (False — pure perceptual aliasing)."""
    rng = np.random.RandomState(seed)

    def region(z0, z1, with_desc=None):
        pts = np.stack([
            rng.uniform(-5, 5, n_region),
            rng.uniform(-2.5, 2.5, n_region),
            rng.uniform(z0, z1, n_region),
        ], axis=1).astype(np.float32)
        if with_desc is None:
            desc = rng.randint(0, 2 ** 32, size=(n_region, 8),
                               dtype=np.uint64).astype(np.uint32)
        else:
            desc = with_desc
        return pts, desc

    A_pts, A_desc = region(4.0, 16.0)
    C_pts, C_desc = region(20.0, 32.0)
    if aliased_rigid:
        B_pts = A_pts + np.array([0.0, 0.0, 36.0], np.float32)
    else:
        # same descriptor multiset, unrelated arrangement
        B_pts, _ = region(40.0, 52.0)
    B_desc = A_desc

    world = np.concatenate([A_pts, C_pts, B_pts], axis=0)
    desc = np.concatenate([A_desc, C_desc, B_desc], axis=0)
    n_world = len(world)

    cfg = SlamConfig(cam_params=CAM, image_size=(480, 752),
                     orb=OrbParams(n_features=N_FEAT),
                     max_keyframes=K + 4, max_map_points=16384)
    m = ms.make_empty_map(K + 4, 16384, N_FEAT)
    cam = jnp.asarray(CAM)
    sal = np.random.RandomState(99).rand(n_world)

    poses = []
    for k in range(K):
        pose_k = lie.SE3(jnp.eye(3),
                         jnp.asarray([0.0, 0.0, -1.8 * k], jnp.float32))
        poses.append(pose_k)
        pc = np.asarray(lie.se3_apply(pose_k, jnp.asarray(world)))
        uv = np.asarray(cameras.pinhole_project(cam, jnp.asarray(pc)))
        vis = (pc[:, 2] > 0.5) & (pc[:, 2] < 16) \
            & (uv[:, 0] >= 8) & (uv[:, 0] < 744) \
            & (uv[:, 1] >= 8) & (uv[:, 1] < 472)
        idx = np.nonzero(vis)[0]
        idx = idx[np.argsort(-sal[idx])][:N_FEAT]
        n = len(idx)
        assert n > 80, f"KF {k} sees only {n} points"

        f_uv = np.zeros((N_FEAT, 2), np.float32)
        f_desc = np.zeros((N_FEAT, 8), np.uint32)
        f_val = np.zeros(N_FEAT, bool)
        f_uv[:n] = uv[idx]
        f_desc[:n] = desc[idx]
        f_val[:n] = True
        pos_new = np.zeros((N_FEAT, 3), np.float32)
        pos_new[:n] = world[idx]
        normals = np.zeros((N_FEAT, 3), np.float32)
        normals[:, 2] = -1.0
        m, mp_ids = ms.add_map_points(
            m, jnp.asarray(pos_new), jnp.asarray(f_desc),
            jnp.asarray(normals), jnp.int32(k), jnp.int32(k),
            jnp.asarray(f_val))
        m, _ = ms.add_keyframe(
            m, pose_k, float(k), jnp.asarray(f_uv), jnp.asarray(f_desc),
            jnp.zeros(N_FEAT, jnp.int32), jnp.asarray(f_val), mp_ids)
    return m, poses, cfg


def _drive(m, cfg, K):
    tracker = FakeTracker(m, CAM, K - 1)
    closer = LoopCloser(cfg, cfg.max_keyframes, vocab_words=2048)
    candidates_seen = 0
    # keyframes enter the database INCREMENTALLY, like production — a
    # pre-populated database would let a keyframe "detect" its own future
    # neighbours, which can never happen in a live session
    for k in range(K):
        closer.add_keyframe(k, m.kf_desc[k], m.kf_feat_valid[k])
        if k < K - 8:
            continue
        tracker.last_kf_id = k
        tracker.cur_pose = lie.SE3(tracker.map.kf_pose.R[k],
                                   tracker.map.kf_pose.t[k])
        closer.try_close(tracker)
        candidates_seen += len(closer._cons_groups)
    closer.gba_drain(tracker)
    return tracker, closer, candidates_seen


def test_perceptual_alias_rejected():
    """Scrambled-geometry alias: BoW fires candidates, geometry kills them
    — no loop is closed and the map is untouched."""
    K = 20
    m, poses, cfg = _build_aliased_corridor(aliased_rigid=False, K=K)
    pre_t = np.asarray(m.kf_pose.t[:K]).copy()
    tracker, closer, cands = _drive(m, cfg, K)
    assert cands > 0, (
        "detector never produced aliased candidates — the stress case "
        "is not exercising verification")
    assert closer.num_closed == 0, "closed a geometrically false loop"
    np.testing.assert_array_equal(np.asarray(tracker.map.kf_pose.t[:K]),
                                  pre_t)


def test_rigid_alias_closes():
    """Positive control: identical descriptors AND arrangement (a true
    revisit as far as any sensor can tell) passes the same staged
    verification — proving the rejection above is geometric."""
    K = 20
    m, poses, cfg = _build_aliased_corridor(aliased_rigid=True, K=K)
    tracker, closer, _ = _drive(m, cfg, K)
    assert closer.num_closed >= 1, "genuine-alias control did not close"
