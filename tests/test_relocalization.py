"""Relocalization stress test (reference Tracking::Relocalization,
tracking.cc:2869-3023 with MLPnPsolver).

Round-2 failure mode: the PnP accepted spuriously consistent poses, and a
reloc that immediately failed to track refreshed the LOST grace window,
pinning the session in a lost->reloc->lost cycle so the map never reset.
Round 3 adds (a) covariance-weighted PnP, (b) the reference's guided
SearchByProjection retry with an inlier quorum before acceptance, and
(c) grace-window preservation across failed reloc cycles. These tests
measure the success rate over repeated blackouts and the recovery path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam_fusion_tpu import sim
from orb_slam_fusion_tpu.engine import MonoTracker, SlamConfig
from orb_slam_fusion_tpu.engine.tracker import TrackState
from orb_slam_fusion_tpu.frontend.extractor import Features, OrbParams

CFG = SlamConfig(
    cam_params=(400.0, 400.0, 376.0, 240.0),
    image_size=(480, 752),
    orb=OrbParams(n_features=512),
    max_keyframes=160,
    max_map_points=12288,
    ba_window=6,
    loop_closing=True,      # reloc needs the BoW database
)
N_FRAMES = 120
BLACKOUTS = [range(40, 44), range(70, 74), range(95, 99)]


def _empty(n):
    return Features(
        uv=jnp.zeros((n, 2)), response=jnp.zeros(n),
        octave=jnp.zeros(n, jnp.int32), angle=jnp.zeros(n),
        desc=jnp.zeros((n, 8), jnp.uint32), valid=jnp.zeros(n, bool))


def test_reloc_recovers_after_blackouts():
    """Three short blackouts along an arc; each one must recover by
    RELOCALIZATION into the same map (no reset: keyframe count keeps
    growing, atlas stays empty)."""
    world = sim.make_corridor_world(n_frames=N_FRAMES, n_points=4000,
                                    seed=7, motion="arc")
    tracker = MonoTracker(CFG)
    cam = jnp.asarray(CFG.cam_params)
    recovered = 0
    blackout_frames = set()
    for b in BLACKOUTS:
        blackout_frames |= set(b)
    in_blackout = False
    for k in range(N_FRAMES):
        if k in blackout_frames:
            feats = _empty(CFG.orb.n_features)
            in_blackout = True
        else:
            feats = sim.render_frame(world, k, cam, CFG.image_size,
                                     CFG.orb.n_features, seed=17,
                                     pixel_noise=0.4, desc_bit_flips=4,
                                     dropout=0.1)
        rec = tracker.process_features(feats, float(world.timestamps[k]))
        if in_blackout and k not in blackout_frames and rec.state == "ok":
            recovered += 1
            in_blackout = False
    assert recovered == len(BLACKOUTS), (
        f"only {recovered}/{len(BLACKOUTS)} blackouts recovered by reloc")
    assert len(tracker.atlas) == 0, "recovery went through a map reset"
    assert int(tracker.map.n_kf) > 20


def test_reloc_rejects_unseen_place():
    """Drive into a blackout, then feed frames from a DIFFERENT unmapped
    world: the relocalizer must refuse (reloc-fail), and the grace window
    must expire into a reset instead of looping on a spurious accept."""
    world = sim.make_corridor_world(n_frames=60, n_points=4000,
                                    seed=7, motion="arc")
    other = sim.make_corridor_world(n_frames=60, n_points=4000,
                                    seed=1234, motion="arc")
    tracker = MonoTracker(CFG)
    tracker.reloc_grace_frames = 6
    cam = jnp.asarray(CFG.cam_params)
    for k in range(40):
        feats = sim.render_frame(world, k, cam, CFG.image_size,
                                 CFG.orb.n_features, seed=17,
                                 pixel_noise=0.4, desc_bit_flips=4,
                                 dropout=0.1)
        tracker.process_features(feats, float(world.timestamps[k]))
    assert tracker.state == TrackState.OK
    states = []
    for k in range(40, 60):
        feats = sim.render_frame(other, k - 40, cam, CFG.image_size,
                                 CFG.orb.n_features, seed=23,
                                 pixel_noise=0.4, desc_bit_flips=4,
                                 dropout=0.1)
        states.append(tracker.process_features(
            feats, float(world.timestamps[k])).state)
    # no spurious relocalization into the old map: every pre-reset frame is
    # lost/reloc-fail, then the session resets and re-initializes
    assert "ok" not in states[:6], states
    assert len(tracker.atlas) == 1 or "init-done" in states or \
        "init-ref" in states, f"never reset: {states}"
