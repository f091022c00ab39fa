"""End-to-end monocular-inertial SLAM on a synthetic sequence.

The reference's headline config class (stereo-inertial EuRoC,
tests/slam_euroc_si.cc) exercised here as mono-inertial on exact synthetic
data: visual bootstrap -> IMU initialization (gravity/scale/bias) -> metric
visual-inertial tracking. The decisive check is metric scale: after IMU
init, ATE is evaluated WITHOUT scale alignment.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_fusion_tpu import sim
from orb_slam_fusion_tpu.engine import SlamConfig, TrackState
from orb_slam_fusion_tpu.engine.vio_tracker import VioTracker
from orb_slam_fusion_tpu.frontend.extractor import OrbParams
from orb_slam_fusion_tpu.imu.preintegration import make_calib
from orb_slam_fusion_tpu.io import ate_rmse

CFG = SlamConfig(
    cam_params=(400.0, 400.0, 376.0, 240.0),
    image_size=(480, 752),
    orb=OrbParams(n_features=512),
    max_keyframes=96,
    max_map_points=6144,
    ba_window=6,
    loop_closing=False,
)

# 8 s of trajectory: long enough for the staged re-initialization (VIBA1 at
# t>5 s, reference localmapping.cc:148-199) to fire — the multi-scale sim
# leaves ~5% visual scale drift that only the full inertial re-solve removes
N_FRAMES = 160


@pytest.fixture(scope="module")
def run_vio():
    seq = sim.make_vio_sequence(n_frames=N_FRAMES, seed=2,
                                gyro_noise=1.7e-4, acc_noise=2e-3,
                                gyro_bias=0.002, acc_bias=0.02)
    calib = make_calib()
    tracker = VioTracker(CFG, calib)
    cam = jnp.asarray(CFG.cam_params)
    states = []
    for k in range(N_FRAMES):
        feats = sim.render_frame(
            seq.world, k, cam, CFG.image_size, CFG.orb.n_features,
            pixel_noise=0.3, desc_bit_flips=3, dropout=0.08, seed=21)
        if k == 0:
            rec = tracker.process_frame_imu(
                feats, float(seq.world.timestamps[k]),
                np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32),
                np.zeros(0))
        else:
            acc, gyro, t = seq.frame_imu[k - 1]
            rec = tracker.process_frame_imu(
                feats, float(seq.world.timestamps[k]), acc, gyro, t)
        states.append(rec.state)
    return seq, tracker, states


def test_tracks_and_initializes_imu(run_vio):
    seq, tracker, states = run_vio
    ok = sum(1 for s in states if s in ("ok", "init-done"))
    assert ok > N_FRAMES * 0.8, states
    assert tracker.imu_initialized, "IMU never initialized"


def test_metric_scale(run_vio):
    seq, tracker, states = run_vio
    traj = tracker.trajectory_tum()
    gt = sim.gt_positions(seq.world)
    # after IMU init the estimate is metric: compare WITHOUT scale alignment
    # over the post-init segment
    n_init_kf = tracker.init_min_kfs
    start = int(N_FRAMES * 0.5)
    est = traj[start:, 1:4]
    g = gt[start:len(traj)]
    rmse_noscale = ate_rmse(est, g, with_scale=False)
    rmse_scale = ate_rmse(est, g, with_scale=True)
    # metric scale recovered: scale-free ATE close to scale-aligned ATE
    assert rmse_noscale < 0.15, f"metric ATE {rmse_noscale:.3f}"
    assert rmse_noscale < 3.0 * max(rmse_scale, 0.01)
