"""Engine configuration.

Typed, explicit analogue of the reference's YAML `Settings` class
(src/config/settings.cc) — camera, extractor, and policy knobs in one
hashable NamedTuple so it can be a jit static argument.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

from .. import cameras
from ..frontend.extractor import OrbParams


class SlamConfig(NamedTuple):
    # camera
    cam_model: str = cameras.PINHOLE
    cam_params: Tuple[float, ...] = (458.654, 457.296, 367.215, 248.375)
    # radial-tangential (k1,k2,p1,p2) for unrectified pinhole inputs; empty
    # or all-zero -> no undistortion (KB8 models distortion in cam_params)
    distortion: Tuple[float, ...] = ()
    image_size: Tuple[int, int] = (480, 752)      # (H, W)
    fps: float = 20.0

    # features
    orb: OrbParams = OrbParams(n_features=1024)

    # capacities (static shapes)
    max_keyframes: int = 256
    max_map_points: int = 8192

    # tracking policy (reference: tracking.cc NeedNewKeyFrame / matchers)
    match_radius_coarse: float = 15.0   # frame-to-frame projection search
    match_radius_fine: float = 9.0      # local-map refinement search
    min_track_matches: int = 20         # below this -> tracking lost
    kf_tracked_ratio: float = 0.9       # insert KF when tracked/ref < ratio
                                        # (reference uses 0.9 for monocular)
    kf_max_interval: int = 10           # frames between keyframes (upper)
    kf_min_interval: int = 1

    # far-point threshold in metres; 0 = unlimited (reference
    # System.thFarPoints, system.cc:217: discard points further than this
    # in projection search and triangulation)
    th_far_points: float = 0.0

    # mapping policy
    ba_window: int = 8                  # local BA keyframe window (optimized)
    ba_fixed_ring: int = 4              # additional older KFs included as
                                        # fixed anchors (reference: fixed
                                        # 1-ring in LocalBundleAdjustment)
    ba_iters_first: int = 5
    ba_iters_second: int = 10
    min_parallax_deg: float = 1.0       # new-point triangulation gate
    culling_found_ratio: float = 0.25   # reference MapPointCulling threshold
    tri_covisible: int = 3              # extra best-covisible triangulation
                                        # neighbours besides the 3-KF
                                        # temporal chain (reference: 10-30
                                        # covisible, localmapping.cc:317).
                                        # The covisible pairs carry the
                                        # long baselines that slow forward
                                        # motion never gives the temporal
                                        # chain — without them full-length
                                        # EuRoC starves (parallax gate
                                        # rejects ~all chain pairs) and
                                        # tracking dies within ~300 frames.
                                        # mapping.py gates these pairs by
                                        # the octave-scaled 3.84/5.991
                                        # sigma2 thresholds (reference
                                        # orb_matcher.cc:817,
                                        # localmapping.cc:400)

    # initialization
    init_min_matches: int = 80
    init_min_inliers: int = 50

    # loop closing
    loop_closing: bool = True
    vocab_words: int = 4096
    vocab_path: str = ""   # optional DBoW2 tree vocabulary file (.txt/.bin);
    # empty -> seeded flat LSH codebook of vocab_words words
    # verification thresholds (reference loopclosing.cc:303-813):
    # candidates must recur over >=N consecutive keyframes, then pass a
    # Sim3-guided projection count and a post-refinement recount. The match
    # counts are the reference's values at its ~1000-feature budget and are
    # scaled by n_features/1000 (clipped to [0.3, 1]) at runtime.
    loop_consistency_th: int = 3
    loop_proj_matches: int = 50
    loop_proj_matches_ref: int = 80

    # background (chunked) execution: spread keyframe-rate local BA and
    # loop-closure global BA over the following tracked frames as device
    # chunks instead of paying them inline on the keyframe frame
    # (reference: LocalMapping/GBA threads overlapped with tracking)
    background_lba: bool = True
    background_gba: bool = True

    # distributed execution (SURVEY §2.3 north star): 0 = single-device;
    # N > 0 routes per-frame tracking through the map-sharded mesh program
    # (parallel/dist_track.py), and local BA + loop-closure GBA through the
    # landmark-sharded distributed Schur reduction (parallel/dist_ba.py)
    # over a min(N, available-devices)-device jax.sharding.Mesh
    mesh_devices: int = 0
