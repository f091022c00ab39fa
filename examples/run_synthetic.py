"""Run the full SLAM pipeline on synthetic sequences and report ATE.

Usage:
    python examples/run_synthetic.py [mono|stereo|vio|all] [--frames N]

This is the library's demo driver and the verify-skill entry: it exercises
initialization, tracking, mapping, (for vio) IMU initialization, and prints
a summary line per mode.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax  # noqa: E402

if os.environ.get("OSF_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from orb_slam_fusion_tpu import sim  # noqa: E402
from orb_slam_fusion_tpu.engine import MonoTracker, SlamConfig  # noqa: E402
from orb_slam_fusion_tpu.engine.stereo_tracker import StereoTracker  # noqa: E402
from orb_slam_fusion_tpu.engine.vio_tracker import VioTracker  # noqa: E402
from orb_slam_fusion_tpu.frontend.extractor import OrbParams  # noqa: E402
from orb_slam_fusion_tpu.imu.preintegration import make_calib  # noqa: E402
from orb_slam_fusion_tpu.io import ate_rmse, save_tum  # noqa: E402


def _cfg(n_frames):
    return SlamConfig(
        cam_params=(400.0, 400.0, 376.0, 240.0),
        image_size=(480, 752),
        orb=OrbParams(n_features=512),
        max_keyframes=max(64, n_frames),
        max_map_points=8192,
        ba_window=6,
        loop_closing=False,
    )


def run_mono(n_frames):
    cfg = _cfg(n_frames)
    world = sim.make_corridor_world(n_frames=n_frames, n_points=5000, seed=3)
    tr = MonoTracker(cfg)
    cam = jnp.asarray(cfg.cam_params)
    t0 = time.time()
    states = []
    for k in range(n_frames):
        feats = sim.render_frame(world, k, cam, cfg.image_size,
                                 cfg.orb.n_features, seed=11)
        states.append(tr.process_features(feats,
                                          float(world.timestamps[k])).state)
    wall = time.time() - t0
    traj = tr.trajectory_tum()
    gt = sim.gt_positions(world)
    start = states.index("init-done") if "init-done" in states else 0
    ate = ate_rmse(traj[start:, 1:4], gt[start:len(traj)], with_scale=True)
    ok = sum(1 for s in states if s in ("ok", "init-done"))
    print(f"mono  : tracked {ok}/{n_frames}, ATE(scale-aligned) "
          f"{ate*100:.2f} cm, {n_frames/wall:.1f} fps host-loop")
    save_tum("/tmp/osf_mono_traj.txt", traj)
    return ate


def run_stereo(n_frames):
    cfg = _cfg(n_frames)
    world = sim.make_corridor_world(n_frames=n_frames, n_points=5000, seed=7)
    tr = StereoTracker(cfg, baseline=0.11)
    cam = jnp.asarray(cfg.cam_params)
    t0 = time.time()
    states = []
    for k in range(n_frames):
        fL, fR = sim.render_stereo_frame(world, k, cam, cfg.image_size,
                                         cfg.orb.n_features, 0.11, seed=31)
        states.append(tr.process_stereo_features(
            fL, fR, float(world.timestamps[k])).state)
    wall = time.time() - t0
    traj = tr.trajectory_tum()
    gt = sim.gt_positions(world)
    ate = ate_rmse(traj[:, 1:4], gt[:len(traj)], with_scale=False)
    ok = sum(1 for s in states if s in ("ok", "init-done"))
    print(f"stereo: tracked {ok}/{n_frames}, metric ATE {ate*100:.2f} cm, "
          f"{n_frames/wall:.1f} fps host-loop")
    return ate


def run_vio(n_frames):
    cfg = _cfg(n_frames)
    seq = sim.make_vio_sequence(n_frames=n_frames, seed=2,
                                gyro_noise=1.7e-4, acc_noise=2e-3,
                                gyro_bias=0.002, acc_bias=0.02)
    tr = VioTracker(cfg, make_calib())
    cam = jnp.asarray(cfg.cam_params)
    t0 = time.time()
    states = []
    for k in range(n_frames):
        feats = sim.render_frame(seq.world, k, cam, cfg.image_size,
                                 cfg.orb.n_features, seed=21)
        if k == 0:
            rec = tr.process_frame_imu(
                feats, float(seq.world.timestamps[k]),
                np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32),
                np.zeros(0))
        else:
            acc, gyro, t = seq.frame_imu[k - 1]
            rec = tr.process_frame_imu(feats, float(seq.world.timestamps[k]),
                                       acc, gyro, t)
        states.append(rec.state)
    wall = time.time() - t0
    traj = tr.trajectory_tum()
    gt = sim.gt_positions(seq.world)
    half = n_frames // 2
    ate = ate_rmse(traj[half:, 1:4], gt[half:len(traj)], with_scale=False)
    ok = sum(1 for s in states if s in ("ok", "init-done"))
    print(f"vio   : tracked {ok}/{n_frames}, imu_init={tr.imu_initialized}, "
          f"metric ATE(2nd half) {ate*100:.2f} cm, "
          f"{n_frames/wall:.1f} fps host-loop")
    return ate


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", nargs="?", default="all",
                    choices=["mono", "stereo", "vio", "all"])
    ap.add_argument("--frames", type=int, default=80)
    args = ap.parse_args()
    if args.mode in ("mono", "all"):
        run_mono(args.frames)
    if args.mode in ("stereo", "all"):
        run_stereo(args.frames)
    if args.mode in ("vio", "all"):
        run_vio(args.frames)
