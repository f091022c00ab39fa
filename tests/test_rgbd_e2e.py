"""End-to-end RGB-D SLAM on a synthetic sequence."""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_fusion_tpu import cameras, lie, sim
from orb_slam_fusion_tpu.engine import SlamConfig
from orb_slam_fusion_tpu.engine.stereo_tracker import RgbdTracker
from orb_slam_fusion_tpu.frontend.extractor import OrbParams
from orb_slam_fusion_tpu.io import ate_rmse

CFG = SlamConfig(
    cam_params=(400.0, 400.0, 376.0, 240.0),
    image_size=(480, 752),
    orb=OrbParams(n_features=512),
    max_keyframes=64,
    max_map_points=6144,
    ba_window=6,
    loop_closing=False,
)
N_FRAMES = 60


def _depth_for_features(world, frame, feats):
    """Exact per-feature depth from the matching world points.

    The sim renders features from known world points; recover depth by
    projecting the GT pose (depth sensor with mild noise added)."""
    pose = lie.SE3(world.poses.R[frame], world.poses.t[frame])
    # nearest world point per feature via reprojection match is overkill:
    # re-render depth by unprojecting with true depth of closest point is
    # complex — instead cast rays and use the rendered points' depth: the
    # features' uv correspond to specific world points with noise, so just
    # use the depth of the point that generated them via a fresh render.
    return None


@pytest.fixture(scope="module")
def run_rgbd():
    world = sim.make_corridor_world(n_frames=N_FRAMES, n_points=5000, seed=9)
    tracker = RgbdTracker(CFG, baseline=0.08)  # virtual baseline for bf
    cam = jnp.asarray(CFG.cam_params)
    states = []
    rng = np.random.RandomState(5)
    for k in range(N_FRAMES):
        feats = sim.render_frame(
            world, k, cam, CFG.image_size, CFG.orb.n_features,
            seed=41, pixel_noise=0.3, desc_bit_flips=3, dropout=0.08)
        # synthetic depth: unproject the observed uv at the TRUE depth of
        # the nearest scene structure — approximate by ray-casting against
        # all world points and taking the depth of the closest projection
        pose = lie.SE3(world.poses.R[k], world.poses.t[k])
        pc = np.asarray(lie.se3_apply(pose, jnp.asarray(world.points)))
        uvw = np.asarray(cameras.pinhole_project(cam, jnp.asarray(pc)))
        fuv = np.asarray(feats.uv)
        d2 = ((fuv[:, None, :] - uvw[None, :, :]) ** 2).sum(-1)
        d2[:, pc[:, 2] < 0.1] = 1e12
        nearest = d2.argmin(axis=1)
        depth = pc[nearest, 2] * (1.0 + rng.randn(len(nearest)) * 0.005)
        depth = np.where(d2[np.arange(len(nearest)), nearest] < 9.0,
                         depth, -1.0)
        rec = tracker.process_rgbd_features(
            feats, jnp.asarray(depth, jnp.float32),
            float(world.timestamps[k]))
        states.append(rec.state)
    return world, tracker, states


def test_tracks(run_rgbd):
    world, tracker, states = run_rgbd
    assert states[0] == "init-done"
    ok = sum(1 for s in states if s in ("ok", "init-done"))
    assert ok > N_FRAMES * 0.9, states


def test_metric_ate(run_rgbd):
    world, tracker, states = run_rgbd
    traj = tracker.trajectory_tum()
    gt = sim.gt_positions(world)
    rmse = ate_rmse(traj[:, 1:4], gt[: len(traj)], with_scale=False)
    assert rmse < 0.1, f"metric ATE {rmse:.3f} m"
