"""Staged IMU initialization: init -> VIBA1 (t>5 s) -> VIBA2 (t>15 s).

Reference: LocalMapping::InitializeIMU re-runs at t>5 s and t>15 s
(localmapping.cc:148-199) with the stored preintegrations re-linearized at
the moved bias (Preintegrated::Reintegrate, imu_types.cc:180-239). Round-1
verdict item #4: the build initialized ONCE and never re-linearized.

The sequence runs ~18 s with noisy, biased IMU; the checks are that the
stages actually fire and that the bias estimate converges toward the true
bias by the end.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_fusion_tpu import sim
from orb_slam_fusion_tpu.engine import SlamConfig
from orb_slam_fusion_tpu.engine.vio_tracker import VioTracker
from orb_slam_fusion_tpu.frontend.extractor import OrbParams
from orb_slam_fusion_tpu.imu.preintegration import make_calib
from orb_slam_fusion_tpu.io import ate_rmse

CFG = SlamConfig(
    cam_params=(400.0, 400.0, 376.0, 240.0),
    image_size=(480, 752),
    orb=OrbParams(n_features=512),
    max_keyframes=128,
    max_map_points=6144,
    ba_window=6,
    loop_closing=False,
)

N_FRAMES = 180
FPS = 10.0  # 18 s of trajectory -> crosses both the 5 s and 15 s stages


@pytest.fixture(scope="module")
def run_staged():
    seq = sim.make_vio_sequence(n_frames=N_FRAMES, fps=FPS, seed=4,
                                gyro_noise=1.7e-4, acc_noise=2e-3,
                                gyro_bias=0.005, acc_bias=0.04)
    calib = make_calib()
    tracker = VioTracker(CFG, calib)
    cam = jnp.asarray(CFG.cam_params)
    states, stages = [], []
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
        stages.append(tracker._imu_stage)
    return seq, tracker, states, stages


def test_stages_fire(run_staged):
    seq, tracker, states, stages = run_staged
    ok = sum(1 for s in states if s in ("ok", "init-done"))
    assert ok > N_FRAMES * 0.8, states
    assert tracker.imu_initialized
    assert max(stages) >= 3, f"VIBA2 never fired (max stage {max(stages)})"
    # stages fire in order with real time between them
    t1 = stages.index(1)
    t2 = stages.index(2)
    t3 = stages.index(3)
    assert t1 < t2 < t3


def test_bias_converges_in_stages(run_staged):
    seq, tracker, states, stages = run_staged
    bg_true = np.asarray(seq.gyro_bias_true)
    bg_est = np.asarray(tracker.bias.gyro)
    err = np.linalg.norm(bg_est - bg_true)
    assert err < 0.5 * max(np.linalg.norm(bg_true), 1e-6) or err < 2e-3, (
        bg_est, bg_true)
    # preintegrations were re-linearized at the moved bias: the stored
    # linearization points are no longer all-zero
    bias0 = [p.bias0 for p in tracker.kf_pre if p is not None]
    assert any(float(jnp.linalg.norm(b.gyro)) > 1e-5 for b in bias0), (
        "kf_pre never re-linearized (Reintegrate missing)")


def test_metric_ate_after_stages(run_staged):
    seq, tracker, states, stages = run_staged
    traj = tracker.trajectory_tum()
    gt = sim.gt_positions(seq.world)
    start = int(N_FRAMES * 0.5)
    est = traj[start:, 1:4]
    rmse = ate_rmse(est, gt[start:len(traj)], with_scale=False)
    assert rmse < 0.2, f"metric ATE {rmse:.3f} m"
