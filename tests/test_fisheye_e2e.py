"""End-to-end monocular SLAM with the Kannala-Brandt8 fisheye model.

Validates that the whole pipeline (unprojection-based init, projection
matching, BA Jacobians) is camera-model agnostic — the reference's
KannalaBrandt8 path (TUM-VI style configs).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_fusion_tpu import cameras, sim
from orb_slam_fusion_tpu.engine import MonoTracker, SlamConfig
from orb_slam_fusion_tpu.frontend.extractor import OrbParams
from orb_slam_fusion_tpu.io import ate_rmse

KB8 = (190.97847, 190.9733, 254.93170, 256.89742,
       0.0034823894, 0.00077133023, -0.0000034, 0.00000069)

CFG = SlamConfig(
    cam_model=cameras.KANNALA_BRANDT8,
    cam_params=KB8,
    image_size=(512, 512),
    orb=OrbParams(n_features=512),
    max_keyframes=64,
    max_map_points=6144,
    ba_window=6,
    loop_closing=False,
)
N_FRAMES = 60


def test_fisheye_mono_tracks():
    world = sim.make_corridor_world(n_frames=N_FRAMES, n_points=6000, seed=8)
    tracker = MonoTracker(CFG)
    cam = jnp.asarray(CFG.cam_params)
    states = []
    for k in range(N_FRAMES):
        feats = sim.render_frame(
            world, k, cam, CFG.image_size, CFG.orb.n_features,
            pixel_noise=0.3, desc_bit_flips=3, dropout=0.08, seed=61,
            cam_model=cameras.KANNALA_BRANDT8)
        rec = tracker.process_features(feats, float(world.timestamps[k]))
        states.append(rec.state)
    ok = sum(1 for s in states if s in ("ok", "init-done"))
    assert ok > N_FRAMES * 0.8, states
    traj = tracker.trajectory_tum()
    gt = sim.gt_positions(world)
    start = states.index("init-done")
    rmse = ate_rmse(traj[start:, 1:4], gt[start:len(traj)], with_scale=True)
    assert rmse < 0.05, f"fisheye ATE {rmse:.3f} m"
