"""MapPoint scale machinery: PredictScale + octave gates + dolly-in e2e.

Reference: mappoint.h:134-148 (min/max scale-invariance distances,
PredictScale) and the octave gate of every projection search
(orb_matcher.cc:42+). Round-1 verdict item #7: the gate was effectively off
(octave_window=16); these tests pin the gate ON and verify tracking holds
through a strong scale-change trajectory.
"""

import jax.numpy as jnp
import numpy as np

from orb_slam_fusion_tpu import sim
from orb_slam_fusion_tpu.engine import MonoTracker, SlamConfig, TrackState
from orb_slam_fusion_tpu.frontend.extractor import OrbParams
from orb_slam_fusion_tpu.io import ate_rmse
from orb_slam_fusion_tpu.map import map_state as ms


def test_predict_scale_roundtrip():
    """A point created at distance d on octave o predicts octave o at d."""
    d = jnp.asarray([1.0, 2.5, 7.0, 20.0], jnp.float32)
    octave = jnp.asarray([0, 2, 4, 7], jnp.int32)
    mn, mx = ms.scale_invariance_band(d, octave, num_levels=8)
    # ceil() semantics: a hair beyond the creation distance lands exactly on
    # the creation octave (at d the ratio is exactly 1.2^o, a ceil boundary)
    pred = ms.predict_scale(d * 1.001, mx, num_levels=8)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(octave))
    # halving the distance raises the predicted level by ~log1.2(2) = 3.8
    pred_close = ms.predict_scale(d * 1.001 / 2.0, mx, num_levels=8)
    diff = np.asarray(pred_close) - np.asarray(octave)
    assert np.all((diff == 4) | (np.asarray(pred_close) == 7)), diff


def test_band_bounds():
    mn, mx = ms.scale_invariance_band(
        jnp.float32(10.0), jnp.int32(0), num_levels=8)
    assert abs(float(mx) - 10.0) < 1e-5
    assert abs(float(mn) - 10.0 / 1.2 ** 7) < 1e-4


def test_sim_renders_multiscale():
    """The octave-aware sim must produce real octave spread, and the octave
    must climb as the camera approaches (dolly-in)."""
    world = sim.make_corridor_world(n_frames=90, n_points=3000, seed=5,
                                    motion="straight")
    cam = jnp.asarray([400.0, 400.0, 376.0, 240.0])
    f0 = sim.render_frame(world, 0, cam, (480, 752), 512, seed=1)
    f_late = sim.render_frame(world, 85, cam, (480, 752), 512, seed=1)
    oct0 = np.asarray(f0.octave)[np.asarray(f0.valid)]
    octl = np.asarray(f_late.octave)[np.asarray(f_late.valid)]
    assert len(np.unique(oct0)) >= 3, np.unique(oct0)
    # the camera has advanced 15+ m toward the structure: mean octave rises
    assert octl.mean() > oct0.mean() + 0.5, (oct0.mean(), octl.mean())


def test_dolly_in_tracks_through_scale_change():
    """Straight dolly toward the scene: distances to tracked points shrink
    by several octaves; with PredictScale + the octave window the tracker
    must keep matching (the scale gates re-center the search each frame)."""
    cfg = SlamConfig(
        cam_params=(400.0, 400.0, 376.0, 240.0),
        image_size=(480, 752),
        orb=OrbParams(n_features=512),
        max_keyframes=64,
        max_map_points=4096,
        ba_window=6,
        loop_closing=False,
    )
    n_frames = 90
    world = sim.make_corridor_world(n_frames=n_frames, n_points=4000,
                                    seed=5, motion="straight")
    tracker = MonoTracker(cfg)
    cam = jnp.asarray(cfg.cam_params)
    states = []
    for k in range(n_frames):
        feats = sim.render_frame(
            world, k, cam, cfg.image_size, cfg.orb.n_features,
            pixel_noise=0.3, desc_bit_flips=3, dropout=0.08, seed=11)
        rec = tracker.process_features(feats, float(world.timestamps[k]))
        states.append(rec.state)

    assert tracker.state == TrackState.OK, states[-5:]
    ok_frames = sum(1 for s in states if s in ("ok", "init-done"))
    assert ok_frames > 70, f"only {ok_frames} tracked: {states}"
    # scale bands were actually set (not the unbounded default)
    mmax = np.asarray(tracker.map.mp_max_dist)
    mvalid = np.asarray(tracker.map.mp_valid)
    assert np.all(mmax[mvalid] < 1e8), "scale bands never set"

    traj = tracker.trajectory_tum()
    gt = sim.gt_positions(world)
    start = next(i for i, s in enumerate(states) if s == "init-done")
    rmse = ate_rmse(traj[start:, 1:4], gt[start:len(traj)], with_scale=True)
    assert rmse < 0.06, f"ATE RMSE {rmse:.3f} m"
