"""Stereo-inertial atlas merge: loss -> new map -> revisit -> inertial weld.

Reference: LoopClosing::MergeLocal2 + MergeInertialBA
(loopclosing.cc:1651-1941, optimizer.cc:3859). Round-1 verdict item #5 and
weak #5: the merge remapped the trajectory but NOT the inertial side tables
(kf_vel/kf_bias/kf_pre/kf_time), so a post-merge windowed VI-BA read wrong
rows. This test drives a stereo-inertial session through a blackout-induced
map split and a revisit-induced merge and checks the inertial chain stays
consistent and metric.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_fusion_tpu import lie, sim
from orb_slam_fusion_tpu.engine import SlamConfig
from orb_slam_fusion_tpu.engine.vio_tracker import StereoVioTracker
from orb_slam_fusion_tpu.frontend.extractor import Features, OrbParams
from orb_slam_fusion_tpu.imu.preintegration import make_calib
from orb_slam_fusion_tpu.io import ate_rmse

CFG = SlamConfig(
    cam_params=(400.0, 400.0, 376.0, 240.0),
    image_size=(480, 752),
    orb=OrbParams(n_features=512),
    max_keyframes=160,
    max_map_points=12288,
    ba_window=6,
    loop_closing=True,
)
N_FRAMES = 140
FPS = 20.0
BLACKOUT = range(58, 68)
BASELINE = 0.11


def _empty_features(n):
    return Features(
        uv=jnp.zeros((n, 2)), response=jnp.zeros(n),
        octave=jnp.zeros(n, jnp.int32), angle=jnp.zeros(n),
        desc=jnp.zeros((n, 8), jnp.uint32), valid=jnp.zeros(n, bool))


def _circle_gt(T, fps):
    ts = np.arange(T) / fps
    ang = 2 * np.pi * np.arange(T) / T
    pos = np.stack([3 * np.sin(ang), np.zeros(T), 3 * (1 - np.cos(ang))],
                   axis=1)
    quats = []
    for a in ang:
        R_wc = np.asarray(lie.so3_exp(
            jnp.asarray([0.0, np.pi / 2 - a, 0.0], jnp.float32)))
        quats.append(np.asarray(lie.quat_from_mat(jnp.asarray(R_wc))))
    return pos, np.stack(quats), ts


@pytest.fixture(scope="module")
def run_inertial_atlas():
    pos, quats, ts = _circle_gt(N_FRAMES, FPS)
    seq = sim.vio_from_gt_trajectory(
        pos, quats, ts, n_points=6000, seed=5,
        gyro_noise=1.7e-4, acc_noise=2e-3, gyro_bias=0.002, acc_bias=0.02)
    calib = make_calib()
    tracker = StereoVioTracker(CFG, BASELINE, calib)
    tracker.reloc_grace_frames = 4
    cam = jnp.asarray(CFG.cam_params)
    states, n_arch = [], []
    for k in range(N_FRAMES):
        if k in BLACKOUT:
            fL = _empty_features(CFG.orb.n_features)
            fR = _empty_features(CFG.orb.n_features)
        else:
            fL, fR = sim.render_stereo_frame(
                seq.world, k, cam, CFG.image_size, CFG.orb.n_features,
                BASELINE, seed=13, pixel_noise=0.4, desc_bit_flips=4,
                dropout=0.1)
        if k == 0:
            acc = np.zeros((0, 3), np.float32)
            gyro = np.zeros((0, 3), np.float32)
            t = np.zeros(0)
        else:
            acc, gyro, t = seq.frame_imu[k - 1]
        rec = tracker.process_stereo_imu(
            fL, fR, float(seq.world.timestamps[k]), acc, gyro, t)
        states.append(rec.state)
        n_arch.append(len(tracker.atlas))
    return seq, tracker, states, n_arch


def test_inertial_map_archived_and_merged(run_inertial_atlas):
    seq, tracker, states, n_arch = run_inertial_atlas
    assert max(n_arch) >= 1, "map was never archived after the blackout"
    assert n_arch[-1] == 0, (
        f"atlas still holds {n_arch[-1]} maps — inertial merge never fired; "
        f"states tail: {states[-10:]}")
    assert int(tracker.map.n_kf) > 30


def test_inertial_tables_consistent_after_merge(run_inertial_atlas):
    """The regression under test: inertial host tables must cover every
    keyframe row of the merged map (round-1 latent bug)."""
    seq, tracker, states, n_arch = run_inertial_atlas
    n_kf = int(tracker.map.n_kf)
    assert len(tracker.kf_vel) == n_kf
    assert len(tracker.kf_bias) == n_kf
    assert len(tracker.kf_pre) == n_kf
    assert len(tracker.kf_time) == n_kf
    assert len(tracker.kf_raw) == n_kf
    # keyframe times must be strictly increasing across the weld seam
    kft = np.asarray(tracker.kf_time)
    assert np.all(np.diff(kft) > 0), "kf_time disordered after merge"
    assert tracker.imu_initialized


def test_metric_after_merge(run_inertial_atlas):
    seq, tracker, states, n_arch = run_inertial_atlas
    ok = sum(1 for s in states if s in ("ok", "init-done"))
    assert ok > N_FRAMES * 0.75, f"only {ok} tracked"
    traj = tracker.trajectory_tum()
    gt = sim.gt_positions(seq.world)
    # compare the post-merge tail (fully inside the welded map), metric
    start = int(N_FRAMES * 0.75)
    est = traj[start:, 1:4]
    rmse = ate_rmse(est, gt[start:len(traj)], with_scale=False)
    assert rmse < 0.25, f"metric ATE after merge {rmse:.3f} m"
