"""Multi-map atlas: loss -> new map -> revisit -> cross-map merge."""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_fusion_tpu import sim
from orb_slam_fusion_tpu.engine import MonoTracker, SlamConfig
from orb_slam_fusion_tpu.frontend.extractor import Features, OrbParams
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
BLACKOUT = range(58, 68)


def _empty_features(n):
    return Features(
        uv=jnp.zeros((n, 2)), response=jnp.zeros(n),
        octave=jnp.zeros(n, jnp.int32), angle=jnp.zeros(n),
        desc=jnp.zeros((n, 8), jnp.uint32), valid=jnp.zeros(n, bool))


@pytest.fixture(scope="module")
def run_atlas():
    world = sim.make_corridor_world(n_frames=N_FRAMES, n_points=6000,
                                    seed=5, motion="circle")
    tracker = MonoTracker(CFG)
    tracker.reloc_grace_frames = 4  # force a fresh map quickly
    cam = jnp.asarray(CFG.cam_params)
    states = []
    merges = []
    for k in range(N_FRAMES):
        if k in BLACKOUT:
            feats = _empty_features(CFG.orb.n_features)
        else:
            feats = sim.render_frame(
                world, k, cam, CFG.image_size, CFG.orb.n_features,
                pixel_noise=0.4, desc_bit_flips=4, dropout=0.1, seed=13)
        rec = tracker.process_features(feats, float(world.timestamps[k]))
        states.append(rec.state)
        merges.append(len(tracker.atlas))
    return world, tracker, states, merges


def test_map_archived_on_loss(run_atlas):
    world, tracker, states, merges = run_atlas
    assert max(merges) >= 1, "map was never archived after the blackout"


def test_merge_happened(run_atlas):
    world, tracker, states, merges = run_atlas
    # after revisiting the start, the archived map should be consumed again
    assert merges[-1] == 0, (
        f"atlas still holds {merges[-1]} archived maps — merge never fired; "
        f"states tail: {states[-10:]}")
    # merged map spans both sessions
    assert int(tracker.map.n_kf) > 30
