"""Background (chunked) local BA — round-1 verdict item #2.

The keyframe-rate bundle adjustment runs as device chunks spread over the
following tracked frames (reference: the LocalMapping thread's BA overlaps
tracking and is aborted by mbAbortBA, localmapping.cc:106-146,226). These
tests drive the host protocol through the real tracker: the solve is in
flight after keyframe frames, adoption happens within a few frames, exports
drain, and accuracy matches the synchronous path."""

import jax.numpy as jnp
import numpy as np

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


def _run(cfg, n=70):
    world = sim.make_corridor_world(n_frames=n, n_points=4000, seed=3)
    tracker = MonoTracker(cfg)
    cam = jnp.asarray(cfg.cam_params)
    states, in_flight = [], []
    for k in range(n):
        feats = sim.render_frame(
            world, k, cam, cfg.image_size, cfg.orb.n_features,
            pixel_noise=0.3, desc_bit_flips=3, dropout=0.08, seed=11)
        rec = tracker.process_features(feats, float(world.timestamps[k]))
        states.append(rec.state)
        # keep the object itself (not id(): ids are reused after GC)
        in_flight.append(tracker._pending_lba)
    return world, tracker, states, in_flight


def test_background_lba_runs_and_matches_sync():
    world, tracker, states, in_flight = _run(CFG)
    assert tracker.state == TrackState.OK
    # the solve really was in flight at the end of some frames...
    assert any(in_flight), "background LBA never started"
    # ...and no SINGLE solve outlives its keyframe by much: the robust
    # phase runs synchronously at the insert and the polish spreads over
    # the following frames (5 iters/chunk over 10 polish iterations).
    # Back-to-back keyframes legitimately chain separate solves, so the
    # bound is per solve object, not per any-solve-in-flight streak.
    run = best = 0
    prev = None
    for obj in in_flight:
        run = run + 1 if (obj is not None and obj is prev) else \
            (1 if obj is not None else 0)
        best = max(best, run)
        prev = obj
    assert best <= 5, f"one LBA solve stayed in flight {best} frames"

    # exports drain the pending solve and the accuracy matches the
    # synchronous configuration
    traj = tracker.trajectory_tum()
    assert tracker._pending_lba is None
    gt = sim.gt_positions(world)
    start = next(i for i, s in enumerate(states) if s == "init-done")
    est = traj[:, 1:4]
    rmse = ate_rmse(est[start:], gt[start:len(est)], with_scale=True)
    assert rmse < 0.03, f"background-LBA ATE {rmse:.3f} m"


def test_sync_mode_unaffected():
    world, tracker, states, in_flight = _run(
        CFG._replace(background_lba=False), n=40)
    assert not any(in_flight)
    assert tracker.state == TrackState.OK
