"""End-to-end stereo SLAM on a synthetic sequence (metric scale check)."""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_fusion_tpu import sim
from orb_slam_fusion_tpu.engine import SlamConfig, TrackState
from orb_slam_fusion_tpu.engine.stereo_tracker import StereoTracker
from orb_slam_fusion_tpu.frontend.extractor import OrbParams
from orb_slam_fusion_tpu.io import ate_rmse

BASELINE = 0.11  # EuRoC-like stereo baseline (m)

CFG = SlamConfig(
    cam_params=(400.0, 400.0, 376.0, 240.0),
    image_size=(480, 752),
    orb=OrbParams(n_features=512),
    max_keyframes=64,
    max_map_points=6144,
    ba_window=6,
    loop_closing=False,
)

N_FRAMES = 70


@pytest.fixture(scope="module")
def run_stereo():
    world = sim.make_corridor_world(n_frames=N_FRAMES, n_points=5000, seed=7)
    tracker = StereoTracker(CFG, baseline=BASELINE)
    cam = jnp.asarray(CFG.cam_params)
    states = []
    for k in range(N_FRAMES):
        fL, fR = sim.render_stereo_frame(
            world, k, cam, CFG.image_size, CFG.orb.n_features, BASELINE,
            seed=31, pixel_noise=0.3, desc_bit_flips=3, dropout=0.08)
        rec = tracker.process_stereo_features(
            fL, fR, float(world.timestamps[k]))
        states.append(rec.state)
    return world, tracker, states


def test_tracks(run_stereo):
    world, tracker, states = run_stereo
    assert states[0] == "init-done", states[:3]
    ok = sum(1 for s in states if s in ("ok", "init-done"))
    assert ok > N_FRAMES * 0.9, states


def test_metric_ate(run_stereo):
    world, tracker, states = run_stereo
    traj = tracker.trajectory_tum()
    gt = sim.gt_positions(world)
    # stereo is metric from frame 0: NO scale alignment
    rmse = ate_rmse(traj[:, 1:4], gt[: len(traj)], with_scale=False)
    assert rmse < 0.08, f"metric ATE {rmse:.3f} m"
    # and the recovered scale should be ~1
    s_rmse = ate_rmse(traj[:, 1:4], gt[: len(traj)], with_scale=True)
    assert rmse < 2.5 * max(s_rmse, 0.01)
