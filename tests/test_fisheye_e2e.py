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


class TestFisheyeStereo:
    """Non-rectified KB8 stereo (reference stereo-fisheye path,
    frame.cc:1134+ / KannalaBrandt8::TriangulateMatches)."""

    T_C1_C2 = np.block([
        [np.eye(3), np.array([[0.101], [0.002], [0.001]])],
        [np.zeros((1, 3)), np.ones((1, 1))]])  # TUM-VI-like ~10 cm baseline

    def test_match_depth_exact(self):
        """Exact geometry: projected points into both KB8 cameras with
        shared descriptors -> triangulated depth matches ground truth."""
        from orb_slam_fusion_tpu.frontend.extractor import Features
        from orb_slam_fusion_tpu.frontend.stereo import fisheye_stereo_match

        rng = np.random.RandomState(3)
        N = 128
        cam = jnp.asarray(KB8)
        pts = rng.uniform(-1.5, 1.5, (N, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(1.0, 8.0, N)
        T12 = np.asarray(self.T_C1_C2)
        T21 = np.linalg.inv(T12)
        pts_r = pts @ T21[:3, :3].T + T21[:3, 3]

        uvL = cameras.project(cameras.KANNALA_BRANDT8, cam, jnp.asarray(pts))
        uvR = cameras.project(cameras.KANNALA_BRANDT8, cam,
                              jnp.asarray(pts_r.astype(np.float32)))
        desc = jnp.asarray(
            rng.randint(0, 2 ** 32, (N, 8), dtype=np.uint64)
            .astype(np.uint32))
        perm = rng.permutation(N)
        mk = lambda uv, d: Features(
            uv=uv, response=jnp.ones(N), octave=jnp.zeros(N, jnp.int32),
            angle=jnp.zeros(N), desc=d, valid=jnp.ones(N, bool))
        fL = mk(uvL, desc)
        fR = mk(uvR[perm], desc[perm])  # shuffled right features

        depth, ok = fisheye_stereo_match(
            fL, fR, cam, cam, jnp.asarray(T21[:3, :3], jnp.float32),
            jnp.asarray(T21[:3, 3], jnp.float32))
        ok = np.asarray(ok)
        assert ok.sum() > N * 0.9
        err = np.abs(np.asarray(depth)[ok] - pts[ok, 2]) / pts[ok, 2]
        assert np.median(err) < 0.01, np.median(err)

    def test_tracks_metric(self):
        """Full fisheye-stereo session on a synthetic corridor: tracks and
        recovers metric scale (no scale alignment in the ATE)."""
        from orb_slam_fusion_tpu.engine.stereo_tracker import (
            FisheyeStereoTracker)
        from orb_slam_fusion_tpu.io import ate_rmse

        n_frames = 50
        world = sim.make_corridor_world(n_frames=n_frames, n_points=6000,
                                        seed=11)
        tracker = FisheyeStereoTracker(CFG, KB8, self.T_C1_C2)
        states = []
        for k in range(n_frames):
            fL, fR = sim.render_fisheye_stereo_frame(
                world, k, KB8, KB8, CFG.image_size, CFG.orb.n_features,
                self.T_C1_C2, seed=17, pixel_noise=0.3, desc_bit_flips=3,
                dropout=0.08)
            rec = tracker.process_stereo_features(
                fL, fR, float(world.timestamps[k]))
            states.append(rec.state)
        assert states[0] == "init-done", states[:3]
        ok = sum(1 for s in states if s in ("ok", "init-done"))
        assert ok > n_frames * 0.9, states
        traj = tracker.trajectory_tum()
        gt = sim.gt_positions(world)
        rmse = ate_rmse(traj[:, 1:4], gt[: len(traj)], with_scale=False)
        assert rmse < 0.12, f"metric ATE {rmse:.3f} m"
