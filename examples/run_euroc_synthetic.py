"""EuRoC-trajectory-driven synthetic evaluation.

EuRoC imagery is unavailable in this environment, so this driver takes the
REAL EuRoC ground-truth trajectories shipped with the reference
(evaluation/Ground_truth/EuRoC_left_cam/*_GT.txt), builds a synthetic world
along each trajectory (sim.world_from_trajectory), runs the full SLAM
pipeline on the rendered observations, and reports ATE RMSE with the
reference's evaluation protocol (Horn alignment, io.evaluation) — the
closest executable analogue of the reference's EuRoC benchmark suite.

Usage:
    python examples/run_euroc_synthetic.py [MH01 ...] [--frames N]
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
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from orb_slam_fusion_tpu import sim  # noqa: E402
from orb_slam_fusion_tpu.engine import MonoTracker, SlamConfig  # noqa: E402
from orb_slam_fusion_tpu.frontend.extractor import OrbParams  # noqa: E402
from orb_slam_fusion_tpu.io import ate_rmse  # noqa: E402

GT_DIR = "/root/reference/evaluation/Ground_truth/EuRoC_left_cam"


def density_points(positions, margin=3.0, per_m3=6.0,
                   lo_cap=8000, hi_cap=60000):
    """World-point budget for a trajectory's bounding volume.

    The synthetic world fills the trajectory's bounding box; a FIXED point
    count makes scene density (and therefore per-frame feature count) a
    function of how much of the sequence is run — full-length MH01 at
    8,000 points is ~1.7 pts/m^3, which starves every frustum to <100
    visible points and loses tracking where real imagery would supply
    hundreds of corners. Budget by volume instead so the per-frame feature
    supply matches the short-sequence protocol at any length."""
    span = positions.max(0) - positions.min(0) + 2 * margin
    vol = float(span[0] * span[1] * span[2])
    return int(np.clip(per_m3 * vol, lo_cap, hi_cap))


def load_euroc_gt(seq: str, stride: int = 10, max_frames: int = 200,
                  with_quats: bool = False):
    """GT file -> (positions (T,3), timestamps (T,)[, quats (T,4) wxyz]).
    The shipped left-cam GT is ~20 Hz; stride subsamples further."""
    path = os.path.join(GT_DIR, f"{seq}_GT.txt")
    rows = np.loadtxt(path, delimiter=",", comments="#")
    rows = rows[::stride][:max_frames]
    t = rows[:, 0] * 1e-9
    if with_quats:
        return rows[:, 1:4], t - t[0], rows[:, 4:8]
    return rows[:, 1:4], t - t[0]


def run_sequence_stereo_imu(seq: str, n_frames: int) -> float:
    """Stereo-inertial evaluation along the real GT trajectory — the
    reference's headline configuration (tests/slam_euroc_si.cc). IMU is
    synthesized integrator-consistently from the GT poses
    (sim.vio_from_gt_trajectory); metric ATE (NO scale alignment)."""
    from orb_slam_fusion_tpu.engine.vio_tracker import StereoVioTracker
    from orb_slam_fusion_tpu.imu.preintegration import make_calib

    # shipped GT is ~20 Hz: stride=1 keeps camera rate
    positions, t, quats = load_euroc_gt(seq, stride=1, max_frames=10 ** 9,
                                        with_quats=True)
    # skip the stationary prelude (EuRoC MAVs sit on the ground first):
    # start once the platform has moved 0.5 m from its initial pose
    moved = np.linalg.norm(positions - positions[0], axis=1) > 0.5
    first = int(np.argmax(moved)) if moved.any() else 0
    positions = positions[first:first + n_frames]
    quats = quats[first:first + n_frames]
    t = t[first:first + n_frames]
    # honest protocol: noisy, biased IMU (round-1 EVAL used noise-free
    # integrator-consistent IMU, which overstated fidelity)
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
        # fixed initial capacities: full-length sequences exercise the
        # compaction + doubling-growth machinery instead of pre-sizing
        max_keyframes=256,
        max_map_points=16384,
        ba_window=6,
        # loop closing ON: it also provides relocalization and atlas
        # re-merge, so a tracking loss recovers instead of fragmenting the
        # run (round-2 verdict #1; reference: reloc + MergeLocal always
        # active, tracking.cc:2869, loopclosing.cc:1651)
        loop_closing=True,
    )
    tracker = StereoVioTracker(cfg, baseline, make_calib())
    if os.environ.get("OSF_NO_LOOP_CORRECT") == "1" and tracker.loop_closer:
        # A/B instrument: detection/verification run, corrections don't
        # (quantifies whether closures repair or inject error)
        tracker.loop_closer.consistency_th = 10 ** 9
    cam = jnp.asarray(cfg.cam_params)
    t0 = time.time()
    states = []
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
        states.append(tracker.process_stereo_imu(
            fL, fR, float(world.timestamps[k]), acc, gyro, tm).state)
        if k > 0 and states[-1] != states[-2]:
            print(f"  [{seq} {k}] state {states[-2]} -> {states[-1]} "
                  f"kf={int(tracker.map.n_kf)}/{tracker.map.max_kf} "
                  f"archived={len(tracker.atlas)}", flush=True)
        if k > 0 and k % 500 == 0:
            print(f"  [{seq} {k}/{len(t)}] {k/(time.time()-t0):.1f} fps "
                  f"kf={int(tracker.map.n_kf)}", flush=True)
    wall = time.time() - t0
    traj = tracker.trajectory_tum()
    gt = sim.gt_positions(world)
    try:
        start = states.index("init-done")
    except ValueError:
        print(f"{seq}: never initialized")
        return float("nan")
    ate = ate_rmse(traj[start:, 1:4], gt[start:len(traj)], with_scale=False)
    ok = sum(1 for s in states if s in ("ok", "init-done"))
    span = np.linalg.norm(positions.max(0) - positions.min(0))
    lc = tracker.loop_closer
    print(f"{seq} [stereo-imu]: tracked {ok}/{len(t)}, metric ATE "
          f"{ate*100:.2f} cm over {span:.1f} m span, "
          f"{len(t)/wall:.1f} fps host-loop, kf={int(tracker.map.n_kf)} "
          f"imu_init={getattr(tracker, 'imu_initialized', False)} "
          f"loops={lc.num_closed if lc else 0} "
          f"archived={len(tracker.atlas)}", flush=True)
    if lc is not None:
        print(f"  loop gates: {lc.stats}", flush=True)
    return {"seq": seq, "mode": "stereo-imu", "frames": len(t),
            "tracked": ok, "ate_m": float(ate), "span_m": float(span),
            "kf": int(tracker.map.n_kf),
            "loops": lc.num_closed if lc else 0,
            "archived_maps": len(tracker.atlas),
            "loop_gates": dict(lc.stats) if lc else {}}


def run_sequence(seq: str, n_frames: int, stride: int = 10) -> float:
    positions, t, quats = load_euroc_gt(seq, stride=stride,
                                        max_frames=n_frames,
                                        with_quats=True)
    # REAL recorded orientations: the invented velocity-following heading
    # can spin at its rate clamp for seconds (a sim artifact no real MAV
    # sequence exhibits), dominating the eval difficulty
    world = sim.world_from_trajectory(positions,
                                      n_points=density_points(positions),
                                      seed=1, timestamps=t,
                                      quats_wxyz=quats)
    cfg = SlamConfig(
        cam_params=(400.0, 400.0, 376.0, 240.0),
        image_size=(480, 752),
        orb=OrbParams(n_features=640),
        max_keyframes=256,
        max_map_points=16384,
        ba_window=int(os.environ.get("OSF_BA_WINDOW", "12")),
        loop_closing=True,
    )
    tracker = MonoTracker(cfg)
    cam = jnp.asarray(cfg.cam_params)
    t0 = time.time()
    states = []
    for k in range(len(t)):
        feats = sim.render_frame(world, k, cam, cfg.image_size,
                                 cfg.orb.n_features, seed=17,
                                 pixel_noise=0.4, desc_bit_flips=4,
                                 dropout=0.1)
        states.append(tracker.process_features(feats, float(t[k])).state)
        if k > 0 and states[-1] != states[-2]:
            print(f"  [{seq} {k}] state {states[-2]} -> {states[-1]} "
                  f"kf={int(tracker.map.n_kf)}/{tracker.map.max_kf} "
                  f"archived={len(tracker.atlas)}", flush=True)
        if k > 0 and k % 500 == 0:
            print(f"  [{seq} {k}/{len(t)}] {k/(time.time()-t0):.1f} fps "
                  f"kf={int(tracker.map.n_kf)}", flush=True)
    wall = time.time() - t0
    traj = tracker.trajectory_tum()
    gt = sim.gt_positions(world)
    try:
        start = states.index("init-done")
    except ValueError:
        print(f"{seq}: never initialized")
        return float("nan")
    ate = ate_rmse(traj[start:, 1:4], gt[start:len(traj)], with_scale=True)
    if os.environ.get("OSF_DUMP_TRAJ"):
        np.savez(os.environ["OSF_DUMP_TRAJ"], traj=traj, gt=gt,
                 states=np.asarray(states), start=start)
    ok = sum(1 for s in states if s in ("ok", "init-done"))
    span = np.linalg.norm(positions.max(0) - positions.min(0))
    lc = tracker.loop_closer
    print(f"{seq}: tracked {ok}/{len(t)}, ATE {ate*100:.2f} cm over "
          f"{span:.1f} m span, {len(t)/wall:.1f} fps host-loop, "
          f"kf={int(tracker.map.n_kf)} "
          f"loops={lc.num_closed if lc else 0}", flush=True)
    if lc is not None:
        print(f"  loop gates: {lc.stats}", flush=True)
    return {"seq": seq, "mode": "mono", "frames": len(t), "tracked": ok,
            "ate_m": float(ate), "span_m": float(span),
            "kf": int(tracker.map.n_kf),
            "loops": lc.num_closed if lc else 0,
            "loop_gates": dict(lc.stats) if lc else {}}


def run_sequence_image(seq: str, n_frames: int, stride: int = 10) -> dict:
    """Pixels-in evaluation: rendered IMAGES through the real ORB
    front-end (extract_features) into the tracker — the reference's
    actual input modality (tracking.cc:948-1092). Uses a half-resolution
    camera to keep CPU extraction tractable; on TPU the full-res pipeline
    is the bench path."""
    positions, t, quats = load_euroc_gt(seq, stride=stride,
                                        max_frames=n_frames,
                                        with_quats=True)
    world = sim.world_from_trajectory(positions,
                                      n_points=density_points(positions),
                                      seed=1, timestamps=t,
                                      quats_wxyz=quats)
    h, w = 240, 376
    cam = (200.0, 200.0, 188.0, 120.0)
    cfg = SlamConfig(
        cam_params=cam, image_size=(h, w),
        orb=OrbParams(n_features=512),
        max_keyframes=256, max_map_points=16384, ba_window=6,
        loop_closing=False,
    )
    tracker = MonoTracker(cfg)
    t0 = time.time()
    states = []
    for k in range(len(t)):
        img = sim.render_image(world, k, jnp.asarray(cam, jnp.float32),
                               (h, w))
        states.append(tracker.process_image(
            jnp.asarray(img), float(t[k])).state)
        if k > 0 and k % 100 == 0:
            print(f"  [{seq} {k}/{len(t)}] {k/(time.time()-t0):.1f} fps",
                  flush=True)
    wall = time.time() - t0
    traj = tracker.trajectory_tum()
    gt = sim.gt_positions(world)
    try:
        start = states.index("init-done")
    except ValueError:
        print(f"{seq} [image]: never initialized")
        return {"seq": seq, "mode": "image", "frames": len(t),
                "tracked": 0, "ate_m": float("nan")}
    ate = ate_rmse(traj[start:, 1:4], gt[start:len(traj)], with_scale=True)
    ok = sum(1 for s in states if s in ("ok", "init-done"))
    span = np.linalg.norm(positions.max(0) - positions.min(0))
    print(f"{seq} [image]: tracked {ok}/{len(t)}, ATE {ate*100:.2f} cm "
          f"over {span:.1f} m span, {len(t)/wall:.1f} fps host-loop, "
          f"kf={int(tracker.map.n_kf)}", flush=True)
    return {"seq": seq, "mode": "image", "frames": len(t), "tracked": ok,
            "ate_m": float(ate), "span_m": float(span),
            "kf": int(tracker.map.n_kf)}


if __name__ == "__main__":
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("sequences", nargs="*",
                    default=["MH01"],
                    help="e.g. MH01 MH02 V101 V201")
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--stride", type=int, default=10,
                    help="GT subsampling for mono mode (GT is ~20 Hz; "
                         "stride=1 keeps camera rate for full-length runs)")
    ap.add_argument("--mode", choices=["mono", "stereo-imu", "image"],
                    default="mono")
    ap.add_argument("--out", default="",
                    help="append one JSON line per sequence to this file")
    args = ap.parse_args()
    for s in args.sequences:
        if args.mode == "stereo-imu":
            r = run_sequence_stereo_imu(s, args.frames)
        elif args.mode == "image":
            r = run_sequence_image(s, args.frames, stride=args.stride)
        else:
            r = run_sequence(s, args.frames, stride=args.stride)
        if args.out and isinstance(r, dict):
            r["stride"] = 1 if args.mode == "stereo-imu" else args.stride
            with open(args.out, "a") as f:
                f.write(json.dumps(r) + "\n")
