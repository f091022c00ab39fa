"""End-to-end stereo-inertial SLAM — the reference's headline config
(tests/slam_euroc_si.cc path) on synthetic data."""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_fusion_tpu import lie, sim
from orb_slam_fusion_tpu.engine import SlamConfig
from orb_slam_fusion_tpu.engine.vio_tracker import StereoVioTracker
from orb_slam_fusion_tpu.frontend.extractor import OrbParams
from orb_slam_fusion_tpu.imu.preintegration import make_calib
from orb_slam_fusion_tpu.io import ate_rmse

BASELINE = 0.11
CFG = SlamConfig(
    cam_params=(400.0, 400.0, 376.0, 240.0),
    image_size=(480, 752),
    orb=OrbParams(n_features=512),
    max_keyframes=96,
    max_map_points=8192,
    ba_window=6,
    loop_closing=False,
)
N_FRAMES = 80


@pytest.fixture(scope="module")
def run_stereo_vio():
    seq = sim.make_vio_sequence(n_frames=N_FRAMES, seed=4,
                                gyro_noise=1.7e-4, acc_noise=2e-3,
                                gyro_bias=0.002, acc_bias=0.02)
    tracker = StereoVioTracker(CFG, BASELINE, make_calib())
    cam = jnp.asarray(CFG.cam_params)
    states = []
    for k in range(N_FRAMES):
        pose_l = lie.SE3(seq.world.poses.R[k], seq.world.poses.t[k])
        pose_r = lie.SE3(pose_l.R,
                         pose_l.t + jnp.array([-BASELINE, 0.0, 0.0]))
        fL = sim.render_frame(seq.world, k, cam, CFG.image_size,
                              CFG.orb.n_features, seed=51)
        fR = sim.render_frame(seq.world, k, cam, CFG.image_size,
                              CFG.orb.n_features, seed=52,
                              pose_override=pose_r)
        if k == 0:
            acc = np.zeros((0, 3), np.float32)
            gyro = np.zeros((0, 3), np.float32)
            t = np.zeros(0)
        else:
            acc, gyro, t = seq.frame_imu[k - 1]
        rec = tracker.process_stereo_imu(
            fL, fR, float(seq.world.timestamps[k]), acc, gyro, t)
        states.append(rec.state)
    return seq, tracker, states


def test_tracks_and_inits(run_stereo_vio):
    seq, tracker, states = run_stereo_vio
    assert states[0] == "init-done", states[:3]
    ok = sum(1 for s in states if s in ("ok", "init-done"))
    assert ok > N_FRAMES * 0.9, states
    assert tracker.imu_initialized


def test_metric_ate(run_stereo_vio):
    seq, tracker, states = run_stereo_vio
    traj = tracker.trajectory_tum()
    gt = sim.gt_positions(seq.world)
    rmse = ate_rmse(traj[:, 1:4], gt[: len(traj)], with_scale=False)
    assert rmse < 0.1, f"metric ATE {rmse:.3f} m"
