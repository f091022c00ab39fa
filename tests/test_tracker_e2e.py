"""End-to-end monocular SLAM on a synthetic sequence.

The round-1 'minimum end-to-end slice' milestone (SURVEY.md §7.5):
initialization + motion-model tracking + pose LM + KF insertion +
triangulation + local BA, evaluated by scale-aligned ATE against the exact
synthetic ground truth.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_fusion_tpu import sim
from orb_slam_fusion_tpu.engine import MonoTracker, SlamConfig, TrackState
from orb_slam_fusion_tpu.frontend.extractor import OrbParams
from orb_slam_fusion_tpu.io import ate_rmse

CFG = SlamConfig(
    cam_params=(400.0, 400.0, 376.0, 240.0),
    image_size=(480, 752),
    orb=OrbParams(n_features=512),
    max_keyframes=64,
    max_map_points=4096,
    ba_window=6,
)


@pytest.fixture(scope="module")
def run_sequence():
    world = sim.make_corridor_world(n_frames=80, n_points=4000, seed=3)
    tracker = MonoTracker(CFG)
    cam = jnp.asarray(CFG.cam_params)
    states = []
    for k in range(80):
        feats = sim.render_frame(
            world, k, cam, CFG.image_size, CFG.orb.n_features,
            pixel_noise=0.3, desc_bit_flips=3, dropout=0.08, seed=11)
        rec = tracker.process_features(feats, float(world.timestamps[k]))
        states.append(rec.state)
    return world, tracker, states


def test_initializes_and_tracks(run_sequence):
    world, tracker, states = run_sequence
    assert tracker.state == TrackState.OK, states[-5:]
    ok_frames = sum(1 for s in states if s in ("ok", "init-done"))
    assert ok_frames > 60, f"only {ok_frames} tracked: {states}"


def test_map_grows(run_sequence):
    world, tracker, states = run_sequence
    assert int(tracker.map.n_kf) >= 5
    assert int(tracker.map.n_mp) >= 300


def test_ate_small(run_sequence):
    world, tracker, states = run_sequence
    traj = tracker.trajectory_tum()
    est = traj[:, 1:4]
    gt = sim.gt_positions(world)
    # only compare frames after successful init
    start = next(i for i, s in enumerate(states) if s == "init-done")
    rmse = ate_rmse(est[start:], gt[start:len(est)], with_scale=True)
    # trajectory spans ~15 m; observed ~2-3 mm with 0.3 px noise
    assert rmse < 0.03, f"ATE RMSE {rmse:.3f} m"


def test_reference_kf_fallback_recovers_fast_motion():
    """TrackReferenceKeyFrame fallback (reference tracking.cc:2043): when a
    motion jump blows past the projection windows, the descriptor-only match
    against the reference keyframe recovers the pose instead of LOST."""
    import jax.numpy as jnp

    from orb_slam_fusion_tpu import sim
    from orb_slam_fusion_tpu.engine import MonoTracker, SlamConfig
    from orb_slam_fusion_tpu.engine.tracker import TrackState
    from orb_slam_fusion_tpu.frontend.extractor import OrbParams

    cfg = SlamConfig(cam_params=(400.0, 400.0, 376.0, 240.0),
                     image_size=(480, 752), orb=OrbParams(n_features=512),
                     max_keyframes=64, max_map_points=6144, ba_window=6,
                     loop_closing=False)
    # few frames -> large per-frame motion; identity velocity at cold start
    world = sim.make_corridor_world(n_frames=16, n_points=6000, seed=13)
    tracker = MonoTracker(cfg)
    cam = jnp.asarray(cfg.cam_params)
    states = []
    for k in range(16):
        feats = sim.render_frame(world, k, cam, cfg.image_size, 512,
                                 seed=23, pixel_noise=0.3, desc_bit_flips=3,
                                 dropout=0.08)
        states.append(tracker.process_features(
            feats, float(world.timestamps[k])).state)
    # without the fallback this sequence loses tracking right after init
    ok = sum(1 for s in states if s in ("ok", "init-done"))
    assert tracker.state == TrackState.OK, states
    assert ok >= 8, states
