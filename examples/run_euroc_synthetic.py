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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from orb_slam_fusion_tpu import sim  # noqa: E402
from orb_slam_fusion_tpu.engine import MonoTracker, SlamConfig  # noqa: E402
from orb_slam_fusion_tpu.frontend.extractor import OrbParams  # noqa: E402
from orb_slam_fusion_tpu.io import ate_rmse  # noqa: E402

GT_DIR = "/root/reference/evaluation/Ground_truth/EuRoC_left_cam"


def load_euroc_gt(seq: str, stride: int = 10, max_frames: int = 200):
    """GT file -> (positions (T,3), timestamps (T,)). stride=10 downsamples
    the 200 Hz ground truth to 20 Hz frame rate."""
    path = os.path.join(GT_DIR, f"{seq}_GT.txt")
    rows = np.loadtxt(path, delimiter=",", comments="#")
    rows = rows[::stride][:max_frames]
    t = rows[:, 0] * 1e-9
    return rows[:, 1:4], t - t[0]


def run_sequence(seq: str, n_frames: int) -> float:
    positions, t = load_euroc_gt(seq, max_frames=n_frames)
    world = sim.world_from_trajectory(positions, n_points=8000, seed=1,
                                     timestamps=t)
    cfg = SlamConfig(
        cam_params=(400.0, 400.0, 376.0, 240.0),
        image_size=(480, 752),
        orb=OrbParams(n_features=640),
        max_keyframes=max(96, len(t)),
        max_map_points=16384,
        ba_window=6,
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
    wall = time.time() - t0
    traj = tracker.trajectory_tum()
    gt = sim.gt_positions(world)
    try:
        start = states.index("init-done")
    except ValueError:
        print(f"{seq}: never initialized")
        return float("nan")
    ate = ate_rmse(traj[start:, 1:4], gt[start:len(traj)], with_scale=True)
    ok = sum(1 for s in states if s in ("ok", "init-done"))
    span = np.linalg.norm(positions.max(0) - positions.min(0))
    print(f"{seq}: tracked {ok}/{len(t)}, ATE {ate*100:.2f} cm over "
          f"{span:.1f} m span, {len(t)/wall:.1f} fps host-loop, "
          f"kf={int(tracker.map.n_kf)} "
          f"loops={tracker.loop_closer.num_closed if tracker.loop_closer else 0}")
    return ate


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("sequences", nargs="*",
                    default=["MH01"],
                    help="e.g. MH01 MH02 V101 V201")
    ap.add_argument("--frames", type=int, default=150)
    args = ap.parse_args()
    for s in args.sequences:
        run_sequence(s, args.frames)
