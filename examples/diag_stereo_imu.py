"""Diagnostic driver for the camera-rate stereo-inertial path.

Runs the same protocol as run_euroc_synthetic.py --mode stereo-imu but logs
per-frame tracking state, per-frame position error vs GT (resolved at the
end), keyframe/IMU-stage transitions, and loss clusters with context — the
observability needed to fix the camera-rate failure (VERDICT round-2 #1).

Usage: python examples/diag_stereo_imu.py MH01 --frames 500
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
from orb_slam_fusion_tpu.engine import SlamConfig  # noqa: E402
from orb_slam_fusion_tpu.engine.vio_tracker import StereoVioTracker  # noqa: E402
from orb_slam_fusion_tpu.frontend.extractor import OrbParams  # noqa: E402
from orb_slam_fusion_tpu.imu.preintegration import make_calib  # noqa: E402
from orb_slam_fusion_tpu.io import ate_rmse  # noqa: E402

from run_euroc_synthetic import density_points, load_euroc_gt  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("seq", nargs="?", default="MH01")
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--loop", action="store_true", default=True)
    ap.add_argument("--no-loop", dest="loop", action="store_false")
    args = ap.parse_args()

    positions, t, quats = load_euroc_gt(args.seq, stride=1,
                                        max_frames=10 ** 9, with_quats=True)
    moved = np.linalg.norm(positions - positions[0], axis=1) > 0.5
    first = int(np.argmax(moved)) if moved.any() else 0
    positions = positions[first:first + args.frames]
    quats = quats[first:first + args.frames]
    t = t[first:first + args.frames]
    vio = sim.vio_from_gt_trajectory(positions, quats, t,
                                     n_points=density_points(positions),
                                     seed=1, gyro_noise=1.7e-4,
                                     acc_noise=2e-3, gyro_bias=0.002,
                                     acc_bias=0.02)
    world = vio.world
    baseline = 0.11
    cfg = SlamConfig(
        cam_params=(400.0, 400.0, 376.0, 240.0),
        image_size=(480, 752),
        orb=OrbParams(n_features=640),
        max_keyframes=256,
        max_map_points=16384,
        ba_window=6,
        loop_closing=args.loop,
    )
    tracker = StereoVioTracker(cfg, baseline, make_calib())
    cam = jnp.asarray(cfg.cam_params)
    gt = sim.gt_positions(world)
    t0 = time.time()
    states = []
    events = []
    prev_stage = 0
    prev_nkf = 0
    for k in range(len(t)):
        fL, fR = sim.render_stereo_frame(
            world, k, cam, cfg.image_size, cfg.orb.n_features, baseline,
            seed=17, pixel_noise=0.4, desc_bit_flips=4, dropout=0.1)
        if k == 0:
            acc = np.zeros((0, 3), np.float32)
            gyro = np.zeros((0, 3), np.float32)
            tm = np.zeros(0)
        else:
            acc, gyro, tm = vio.frame_imu[k - 1]
        rec = tracker.process_stereo_imu(
            fL, fR, float(world.timestamps[k]), acc, gyro, tm)
        states.append(rec.state)
        # instantaneous position error (current pose vs GT, same frame)
        Twc_t = np.asarray(jnp.einsum(
            "ji,j->i", tracker.cur_pose.R, -tracker.cur_pose.t))
        err = float(np.linalg.norm(Twc_t - gt[k]))
        stage_now = getattr(tracker, "_imu_stage", 0)
        nkf = int(tracker.map.n_kf)
        if rec.state not in ("ok", "init-done") or err > 0.25:
            events.append((k, rec.state, rec.tracked, err, nkf, stage_now))
        if stage_now != prev_stage:
            print(f"[{k:4d}] IMU stage {prev_stage}->{stage_now} "
                  f"err={err:.3f} kf={nkf}")
            prev_stage = stage_now
        if k % 100 == 0:
            print(f"[{k:4d}] state={rec.state} tracked={rec.tracked} "
                  f"err={err:.3f} kf={nkf} stage={stage_now} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        prev_nkf = nkf

    wall = time.time() - t0
    traj = tracker.trajectory_tum()
    try:
        start = states.index("init-done")
    except ValueError:
        print("never initialized")
        return
    ate = ate_rmse(traj[start:, 1:4], gt[start:len(traj)], with_scale=False)
    ok = sum(1 for s in states if s in ("ok", "init-done"))
    print(f"\n{args.seq}: tracked {ok}/{len(t)}, metric ATE {ate*100:.2f} cm"
          f", {len(t)/wall:.2f} fps, kf={int(tracker.map.n_kf)}")
    print(f"\n{len(events)} anomalous frames (state != ok or err > 25 cm):")
    for k, s, tr, err, nkf, st in events[:80]:
        print(f"  [{k:4d}] {s:12s} tracked={tr:3d} err={err:7.3f} "
              f"kf={nkf} stage={st}")
    if len(events) > 80:
        print(f"  ... and {len(events)-80} more")
    if tracker.loop_closer is not None:
        print("loop stats:", tracker.loop_closer.stats)


if __name__ == "__main__":
    main()
