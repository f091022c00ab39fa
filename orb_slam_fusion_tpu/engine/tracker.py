"""Monocular tracking + local mapping pipeline.

The end-to-end slice of the reference's Tracking (src/tracking.cc) and
LocalMapping (src/localmapping.cc) threads, restructured host-orchestrated /
device-computed:

host (this file, Python)            device (jitted, static shapes)
----------------------------------  -------------------------------------
state machine: INIT -> OK -> LOST    ORB extraction (frontend.extractor)
keyframe decision                    two-view RANSAC init (two_view)
map write sequencing                 projection search (frontend.matcher)
                                     pose LM (solver.pose_opt)
                                     triangulation (cameras)
                                     local BA (solver.ba)

Per-frame flow mirrors Tracking::Track (tracking.cc:1262): predict with the
constant-velocity motion model (tracking.cc:2163 TrackWithMotionModel),
project map points into the predicted view, match by projection, optimize
the pose, decide keyframe insertion (tracking.cc:2350 NeedNewKeyFrame); on
insertion, triangulate new points against the previous keyframe
(localmapping.cc:312 CreateNewMapPoints) and run windowed local BA
(optimizer.cc:1053 LocalBundleAdjustment).
"""

from __future__ import annotations

import enum
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import cameras, lie, two_view
from ..frontend import extractor, matcher
from ..map import map_state as ms
from ..solver import ba, pose_opt
from ..utils import masked_set
from ..utils.timing import STAGES, stage
from .config import SlamConfig


class TrackState(enum.Enum):
    NO_IMAGES = 0
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


# ---------------------------------------------------------------------------
# jitted helpers
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cam_model", "img_h", "img_w"))
def _project_map_points(mp_pos, mp_valid, pose: lie.SE3, cam_params,
                        cam_model: str, img_h: int, img_w: int):
    """Project all map points into a camera; visibility mask includes
    positive depth and image bounds (reference Frame::isInFrustum)."""
    pc = lie.se3_apply(pose, mp_pos)
    uv = cameras.project(cam_model, cam_params, pc)
    vis = (mp_valid & (pc[..., 2] > 0.05)
           & (uv[..., 0] >= 0) & (uv[..., 0] < img_w)
           & (uv[..., 1] >= 0) & (uv[..., 1] < img_h))
    return uv, vis, pc[..., 2]


@functools.partial(jax.jit, static_argnames=("cam_model",))
def _rays_from_uv(uv, cam_params, cam_model: str):
    return cameras.unproject(cam_model, cam_params, uv)


@functools.partial(jax.jit, static_argnames=("cam_model", "min_parallax_cos"))
def _triangulate_candidates(
    pose_a: lie.SE3, pose_b: lie.SE3, rays_a, rays_b, pair_valid,
    cam_params, cam_model: str, min_parallax_cos: float = 0.9998,
):
    """Triangulate feature pairs between two keyframes (world coords).

    Reference: LocalMapping::CreateNewMapPoints checks (localmapping.cc:
    parallax, positive depth, reprojection). Returns (points_w (N,3),
    good (N,)).
    """
    # relative pose: b <- a
    T_ba = lie.se3_compose(pose_b, lie.se3_inverse(pose_a))
    X_a = cameras.triangulate(rays_a, rays_b, T_ba.R, T_ba.t)
    X_b = lie.se3_apply(T_ba, X_a)
    z_a, z_b = X_a[..., 2], X_b[..., 2]

    # parallax between viewing rays (in frame a)
    C_b_in_a = lie.se3_apply(lie.se3_inverse(T_ba),
                             jnp.zeros_like(X_a))  # camera b center
    v1 = X_a
    v2 = X_a - C_b_in_a
    cosp = jnp.sum(v1 * v2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1), 1e-12)

    e_a = jnp.sum((X_a[..., :2] / jnp.maximum(z_a[..., None], 1e-9)
                   - rays_a[..., :2]) ** 2, axis=-1)
    e_b = jnp.sum((X_b[..., :2] / jnp.maximum(z_b[..., None], 1e-9)
                   - rays_b[..., :2]) ** 2, axis=-1)
    th = (2.0 / 460.0) ** 2
    good = (pair_valid & (z_a > 0.05) & (z_b > 0.05)
            & (cosp < min_parallax_cos) & (e_a < th) & (e_b < th))
    # to world: X_w = T_aw^-1 X_a
    X_w = lie.se3_apply(lie.se3_inverse(pose_a), X_a)
    return X_w, good


class FrameRecord(NamedTuple):
    timestamp: float
    pose: lie.SE3          # Tcw
    tracked: int
    state: str


class MonoTracker:
    """Host-side monocular SLAM session (single map, no loop closing yet)."""

    def __init__(self, config: SlamConfig = SlamConfig()):
        self.cfg = config
        self.cam_params = jnp.asarray(config.cam_params, jnp.float32)
        self.map = ms.make_empty_map(
            config.max_keyframes, config.max_map_points,
            config.orb.n_features)
        self.state = TrackState.NO_IMAGES
        self.cur_pose = lie.se3_identity()
        self.velocity = lie.se3_identity()
        self.last_pose: Optional[lie.SE3] = None
        self.ref_feats: Optional[extractor.Features] = None  # init reference
        self.ref_timestamp = 0.0
        self.last_kf_id = -1
        self.last_kf_tracked = 0
        self.frames_since_kf = 0
        self.frame_id = 0
        self.trajectory: list[FrameRecord] = []
        # feature->map-point association for the current frame
        self._cur_obs = None
        self.loop_closer = None
        if config.loop_closing:
            from .loop_closing import LoopCloser
            self.loop_closer = LoopCloser(
                config, config.max_keyframes, config.vocab_words)
        self.lost_since = -10 ** 9
        self.reloc_grace_frames = 40  # ~2 s at 20 fps (reference
        # time_recently_lost = 5 s, tracking.h:309 — shortened because the
        # fresh-map fallback is cheap here)
        # multi-map atlas (reference: Atlas + MergeLocal)
        from ..map.atlas import Atlas
        self.atlas = Atlas()
        self.enable_atlas = config.loop_closing  # needs the BoW database
        self._merge_cooldown = 0

    def reset_map(self):
        """Archive the current map into the atlas and start a fresh one
        (reference: Tracking::CreateMapInAtlas, tracking.cc:1988)."""
        cfg = self.cfg
        if (self.enable_atlas and self.loop_closer is not None
                and int(self.map.n_kf) >= 5):
            self.atlas.archive(self.map, self.loop_closer.db.bow,
                               self.loop_closer.db.present)
        self.map = ms.make_empty_map(
            cfg.max_keyframes, cfg.max_map_points, cfg.orb.n_features)
        self.state = TrackState.NOT_INITIALIZED
        self.ref_feats = None
        self.velocity = lie.se3_identity()
        self.last_kf_id = -1
        self.last_kf_tracked = 0
        self.frames_since_kf = 0
        if self.loop_closer is not None:
            from .loop_closing import LoopCloser
            self.loop_closer = LoopCloser(
                cfg, cfg.max_keyframes, cfg.vocab_words)

    # -- public API --------------------------------------------------------

    def process_image(self, img: jnp.ndarray, timestamp: float) -> FrameRecord:
        with stage("orb_extract"):
            feats = extractor.extract_features(img, self.cfg.orb)
        return self.process_features(feats, timestamp)

    def process_features(self, feats: extractor.Features,
                         timestamp: float) -> FrameRecord:
        """Main per-frame entry (reference: Tracking::Track)."""
        if self.state in (TrackState.NO_IMAGES, TrackState.NOT_INITIALIZED):
            with stage("initialize"):
                rec = self._try_initialize(feats, timestamp)
        elif self.state == TrackState.OK:
            with stage("track_frame"):
                rec = self._track_frame(feats, timestamp)
        else:  # LOST: relocalize against the existing map for a grace
            # window (reference RECENTLY_LOST, tracking.cc:1403-1448), then
            # give up and start a fresh map (stand-in for CreateMapInAtlas,
            # tracking.cc:1988, until the multi-map atlas lands)
            if (self.frame_id - self.lost_since <= self.reloc_grace_frames
                    and self._try_relocalize(feats)):
                rec = self._track_frame(feats, timestamp)
            elif self.frame_id - self.lost_since <= self.reloc_grace_frames:
                rec = FrameRecord(timestamp, self.cur_pose, 0, "reloc-fail")
            else:
                self.reset_map()
                rec = self._try_initialize(feats, timestamp)
        self.frame_id += 1
        self.trajectory.append(rec)
        return rec

    # -- initialization ----------------------------------------------------

    def _try_initialize(self, feats, timestamp) -> FrameRecord:
        cfg = self.cfg
        if self.ref_feats is None:
            self.ref_feats = feats
            self.ref_timestamp = timestamp
            self.state = TrackState.NOT_INITIALIZED
            return FrameRecord(timestamp, self.cur_pose, 0, "init-ref")

        idx, ok = matcher.match_mutual(
            self.ref_feats.desc, self.ref_feats.valid,
            feats.desc, feats.valid, max_dist=matcher.TH_LOW)
        n_matches = int(jnp.sum(ok))
        if n_matches < cfg.init_min_matches:
            # stale reference? replace (reference resets after 1s of misses)
            self.ref_feats = feats
            self.ref_timestamp = timestamp
            return FrameRecord(timestamp, self.cur_pose, n_matches,
                               "init-no-match")

        rays_ref = _rays_from_uv(self.ref_feats.uv, self.cam_params,
                                 cfg.cam_model)
        rays_cur = _rays_from_uv(feats.uv, self.cam_params, cfg.cam_model)
        idx_c = jnp.clip(idx, 0, feats.uv.shape[0] - 1)
        res = two_view.two_view_init(
            rays_ref, rays_cur[idx_c], ok,
            jax.random.PRNGKey(self.frame_id),
            min_inliers=cfg.init_min_inliers)
        if not bool(res.ok):
            return FrameRecord(timestamp, self.cur_pose, n_matches,
                               "init-fail")

        self._create_initial_map(feats, timestamp, idx, res)
        self.state = TrackState.OK
        return FrameRecord(timestamp, self.cur_pose,
                           int(res.n_inliers), "init-done")

    def _create_initial_map(self, feats, timestamp, idx, res):
        """Build the two-keyframe map (reference:
        Tracking::CreateInitialMapMonocular, tracking.cc:1822)."""
        cfg = self.cfg
        inl = np.asarray(res.inliers)
        X1 = np.asarray(res.points1)           # frame-ref coords
        # median-depth gauge normalization (tracking.cc: invMedianDepth)
        med = float(np.median(X1[inl, 2])) if inl.any() else 1.0
        X1 = X1 / med
        t21 = np.asarray(res.t21) / med

        pose0 = lie.se3_identity()             # world = ref camera
        pose1 = lie.SE3(jnp.asarray(res.R21), jnp.asarray(t21))

        n_feat = cfg.orb.n_features
        # map points from inlier matches; world frame = ref frame
        pos = jnp.asarray(X1)
        valid_new = jnp.asarray(inl)
        normals = -pos / jnp.maximum(
            jnp.linalg.norm(pos, axis=-1, keepdims=True), 1e-9)
        self.map, mp_ids = ms.add_map_points(
            self.map, pos, self.ref_feats.desc, normals,
            jnp.int32(0), jnp.int32(0), valid_new)

        # keyframe 0: feature f of ref observes mp_ids[f]
        obs0 = mp_ids
        self.map, kf0 = ms.add_keyframe(
            self.map, pose0, self.ref_timestamp, self.ref_feats.uv,
            self.ref_feats.desc, self.ref_feats.octave,
            self.ref_feats.valid, obs0)

        # keyframe 1: feature idx[f] observes mp_ids[f]
        obs1 = jnp.full((n_feat,), -1, jnp.int32)
        obs1 = masked_set(obs1, jnp.clip(idx, 0, n_feat - 1), mp_ids,
                          (mp_ids >= 0) & (idx >= 0))
        self.map, kf1 = ms.add_keyframe(
            self.map, pose1, timestamp, feats.uv, feats.desc,
            feats.octave, feats.valid, obs1)

        self.cur_pose = pose1
        self.last_pose = pose0
        # The ref->current gap may span many frames; per-frame motion is
        # unknown yet, so start from a zero-velocity model (the first
        # tracked frame falls back to the widened search if needed).
        self.velocity = lie.se3_identity()
        self.last_kf_id = int(kf1)
        self.last_kf_tracked = int(jnp.sum(mp_ids >= 0))
        self.frames_since_kf = 0
        self._cur_obs = obs1
        # polish with a small BA over the two views
        self._local_ba()

    # -- tracking ----------------------------------------------------------

    def _track_frame(self, feats, timestamp) -> FrameRecord:
        cfg = self.cfg
        h, w = cfg.image_size
        pred_pose = lie.se3_compose(self.velocity, self.cur_pose)

        uv_pred, vis, depth = _project_map_points(
            self.map.mp_pos, self.map.mp_valid, pred_pose, self.cam_params,
            cfg.cam_model, h, w)
        midx, mok = matcher.search_by_projection(
            uv_pred, self.map.mp_desc, vis,
            jnp.zeros(self.map.max_mp, jnp.int32),
            feats.uv, feats.desc, feats.valid, feats.octave,
            radius=cfg.match_radius_coarse,
            max_dist=matcher.TH_HIGH, octave_window=16)

        n_matches = int(jnp.sum(mok))
        if n_matches < cfg.min_track_matches:
            # widen search once (reference doubles the window on failure)
            midx, mok = matcher.search_by_projection(
                uv_pred, self.map.mp_desc, vis,
                jnp.zeros(self.map.max_mp, jnp.int32),
                feats.uv, feats.desc, feats.valid, feats.octave,
                radius=2.0 * cfg.match_radius_coarse,
                max_dist=matcher.TH_HIGH, octave_window=16)
            n_matches = int(jnp.sum(mok))
        if n_matches < cfg.min_track_matches:
            self.state = TrackState.LOST
            self.lost_since = self.frame_id
            self.ref_feats = None
            return FrameRecord(timestamp, pred_pose, n_matches, "lost")

        # stage 1: pose optimization on coarse matches
        midx_c = jnp.clip(midx, 0, feats.uv.shape[0] - 1)
        obs_uv = feats.uv[midx_c]
        inv_s2_oct = extractor.inv_scale_sigma2(cfg.orb)
        inv_s2 = inv_s2_oct[
            jnp.clip(feats.octave[midx_c], 0, cfg.orb.num_levels - 1)]
        opt_pose, inlier, n_in = pose_opt.pose_optimization(
            pred_pose, self.map.mp_pos, obs_uv, inv_s2, mok,
            self.cam_params, cam_model=cfg.cam_model)

        # stage 2 (reference TrackLocalMap, tracking.cc:2255): re-project the
        # map at the optimized pose, re-match with the fine radius, re-optimize.
        uv_pred2, vis2, _ = _project_map_points(
            self.map.mp_pos, self.map.mp_valid, opt_pose, self.cam_params,
            cfg.cam_model, h, w)
        midx, mok = matcher.search_by_projection(
            uv_pred2, self.map.mp_desc, vis2,
            jnp.zeros(self.map.max_mp, jnp.int32),
            feats.uv, feats.desc, feats.valid, feats.octave,
            radius=cfg.match_radius_fine,
            max_dist=matcher.TH_HIGH, octave_window=16)
        midx_c = jnp.clip(midx, 0, feats.uv.shape[0] - 1)
        obs_uv = feats.uv[midx_c]
        inv_s2 = inv_s2_oct[
            jnp.clip(feats.octave[midx_c], 0, cfg.orb.num_levels - 1)]
        # CRITICAL: the final optimization restarts from the PREVIOUS frame's
        # optimized pose, not the velocity prediction. The prediction's only
        # job is centering the match windows. In fp32 the LM minimum has a
        # small start-dependent plateau along weakly-constrained directions
        # (forward/scale in corridors); feeding the predicted pose into the
        # optimizer start closes the loop e_{k+1} ~ kappa*(2e_k - e_{k-1}),
        # which diverges exponentially — observed as runaway monocular scale
        # drift. Anchoring the start at cur_pose keeps the loop gain at
        # kappa*e_k (stable), with the fixed correspondences providing the
        # full basin.
        opt_pose, inlier, n_in = pose_opt.pose_optimization(
            self.cur_pose, self.map.mp_pos, obs_uv, inv_s2, mok,
            self.cam_params, cam_model=cfg.cam_model)
        vis = vis2
        n_inliers = int(n_in)
        if n_inliers < cfg.min_track_matches // 2:
            self.state = TrackState.LOST
            self.lost_since = self.frame_id
            self.ref_feats = None
            return FrameRecord(timestamp, pred_pose, n_inliers, "lost")

        # bookkeeping: feature->mp association for this frame
        obs = jnp.full((cfg.orb.n_features,), -1, jnp.int32)
        mp_rows = jnp.arange(self.map.max_mp, dtype=jnp.int32)
        obs = masked_set(obs, midx_c, mp_rows, inlier & (midx >= 0))
        self._cur_obs = obs

        # found/visible statistics (reference mnFound/mnVisible)
        self.map = self.map._replace(
            mp_visible=self.map.mp_visible + vis.astype(jnp.int32),
            mp_found=self.map.mp_found + inlier.astype(jnp.int32),
        )

        self.last_pose = self.cur_pose
        self.cur_pose = opt_pose
        self.velocity = lie.se3_compose(
            self.cur_pose, lie.se3_inverse(self.last_pose))
        self.frames_since_kf += 1

        if self._need_new_keyframe(n_inliers):
            with stage("keyframe_insert"):
                self._insert_keyframe(feats, timestamp, obs)

        return FrameRecord(timestamp, self.cur_pose, n_inliers, "ok")

    def _need_new_keyframe(self, n_inliers: int) -> bool:
        """Reference: Tracking::NeedNewKeyFrame (tracking.cc:2350),
        simplified to the visual-only conditions."""
        cfg = self.cfg
        if int(self.map.n_kf) >= cfg.max_keyframes:
            return False
        if self.frames_since_kf < cfg.kf_min_interval:
            return False
        if self.frames_since_kf >= cfg.kf_max_interval:
            return True
        return n_inliers < cfg.kf_tracked_ratio * max(self.last_kf_tracked, 1)

    def _try_relocalize(self, feats) -> bool:
        """PnP relocalization against the existing map (reference:
        Tracking::Relocalization, tracking.cc:2869 — BoW candidates +
        MLPnP RANSAC; here BoW candidates + batched DLT-PnP RANSAC)."""
        if self.loop_closer is None or int(self.map.n_kf) < 2:
            return False
        from ..solver.pnp import pnp_ransac
        db = self.loop_closer.db
        q = db.compute_bow(feats.desc, feats.valid)
        ids, _ = db.query(q, jnp.zeros(self.map.max_kf, bool), top_k=3)
        for cand in np.asarray(ids):
            if cand < 0:
                continue
            cand = int(cand)
            m = self.map
            cand_has = m.kf_feat_valid[cand] & (m.kf_obs_mp[cand] >= 0)
            idx, ok = matcher.match_mutual(
                feats.desc, feats.valid, m.kf_desc[cand], cand_has,
                max_dist=matcher.TH_LOW)
            if int(jnp.sum(ok)) < 15:
                continue
            idx_c = jnp.clip(idx, 0, m.n_feat - 1)
            mp_rows = jnp.clip(m.kf_obs_mp[cand][idx_c], 0, m.max_mp - 1)
            X = m.mp_pos[mp_rows]
            res = pnp_ransac(
                X, feats.uv, ok & m.mp_valid[mp_rows], self.cam_params,
                jax.random.PRNGKey(self.frame_id * 131 + cand),
                cam_model=self.cfg.cam_model)
            if bool(res.ok):
                self.cur_pose = res.pose
                self.velocity = lie.se3_identity()
                self.state = TrackState.OK
                return True
        return False

    # -- mapping -----------------------------------------------------------

    def _insert_keyframe(self, feats, timestamp, obs):
        """KF insert + new-point triangulation + local BA
        (reference: LocalMapping::ProcessNewKeyFrame/CreateNewMapPoints)."""
        cfg = self.cfg
        prev_kf = self.last_kf_id
        self.map, kf_id = ms.add_keyframe(
            self.map, self.cur_pose, timestamp, feats.uv, feats.desc,
            feats.octave, feats.valid, obs)
        kf_id = int(kf_id)
        if kf_id < 0:
            return

        # ---- new map points: triangulate unmatched features against the
        # most recent keyframes (reference CreateNewMapPoints searches 10-30
        # covisible KFs; recency is the covisibility proxy pre-loop-closing).
        cur_obs = obs
        n_kf_now = int(self.map.n_kf)
        prev_list = [p for p in range(n_kf_now - 2, max(-1, n_kf_now - 5), -1)
                     if 0 <= p != kf_id]
        rays_cur = _rays_from_uv(feats.uv, self.cam_params, cfg.cam_model)
        for prev in prev_list:
            prev_uv = self.map.kf_uv[prev]
            prev_desc = self.map.kf_desc[prev]
            prev_un = (self.map.kf_feat_valid[prev]
                       & (self.map.kf_obs_mp[prev] < 0))
            cur_un = feats.valid & (cur_obs < 0)

            pidx, pok = matcher.match_mutual(
                prev_desc, prev_un, feats.desc, cur_un,
                max_dist=matcher.TH_LOW)
            pidx_c = jnp.clip(pidx, 0, cfg.orb.n_features - 1)

            rays_prev = _rays_from_uv(prev_uv, self.cam_params, cfg.cam_model)
            prev_pose = lie.SE3(self.map.kf_pose.R[prev],
                                self.map.kf_pose.t[prev])
            X_w, good = _triangulate_candidates(
                prev_pose, self.cur_pose, rays_prev, rays_cur[pidx_c],
                pok, self.cam_params, cfg.cam_model)

            cam_center = lie.se3_apply(lie.se3_inverse(self.cur_pose),
                                       jnp.zeros(3))
            normals = X_w - cam_center
            normals = normals / jnp.maximum(
                jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-9)
            self.map, new_ids = ms.add_map_points(
                self.map, X_w, feats.desc[pidx_c], normals,
                jnp.int32(kf_id), jnp.int32(kf_id), good)

            # register observations in both keyframes
            kfo = self.map.kf_obs_mp
            write = new_ids >= 0
            prev_rows = jnp.arange(cfg.orb.n_features)
            kfo = kfo.at[prev].set(
                masked_set(kfo[prev], prev_rows, new_ids, write))
            kfo = kfo.at[kf_id].set(
                masked_set(kfo[kf_id], pidx_c, new_ids, write & (pidx >= 0)))
            self.map = self.map._replace(kf_obs_mp=kfo)
            cur_obs = self.map.kf_obs_mp[kf_id]

        # ---- fuse duplicate points with the previous keyframe -----------
        # (reference: LocalMapping::SearchInNeighbors two-pass Fuse,
        # localmapping.cc:619 — merge points that project onto features
        # already bound to another point)
        if prev_kf >= 0:
            self._fuse_into_keyframe(kf_id)

        # ---- map point culling (reference MapPointCulling) --------------
        ratio = self.map.mp_found / jnp.maximum(self.map.mp_visible, 1)
        seen_enough = self.map.mp_visible >= 8
        bad = seen_enough & (ratio < cfg.culling_found_ratio)
        self.map = self.map._replace(mp_valid=self.map.mp_valid & ~bad)

        # ---- keyframe culling (reference KeyFrameCulling) ---------------
        self._cull_keyframes()

        self.last_kf_id = kf_id
        self.last_kf_tracked = int(jnp.sum(self.map.kf_obs_mp[kf_id] >= 0))
        self.frames_since_kf = 0

        self._local_ba()

        if self.loop_closer is not None:
            self.loop_closer.add_keyframe(kf_id, feats.desc, feats.valid)
            with stage("loop_closing"):
                self.loop_closer.try_close(self)
            if self.enable_atlas and len(self.atlas) > 0:
                self._try_merge_maps(feats)

    def _try_merge_maps(self, feats) -> bool:
        """Cross-map place recognition + merge (reference: LoopClosing::
        NewDetectCommonRegions across atlas maps -> MergeLocal,
        loopclosing.cc:1116). The newest keyframe is queried against every
        archived map's BoW matrix; a Sim3-verified hit welds the ACTIVE map
        into the archived one and continues tracking there."""
        from ..place.database import _query
        from ..solver.sim3 import optimize_sim3, sim3_ransac
        from ..map.atlas import merge_maps

        if self._merge_cooldown > 0:
            self._merge_cooldown -= 1
            return False
        if int(self.map.n_kf) < 5:
            return False
        cur = self.last_kf_id
        m = self.map
        q = self.loop_closer.db.compute_bow(m.kf_desc[cur],
                                            m.kf_feat_valid[cur])
        for ai, arch in enumerate(self.atlas.archived):
            ids, scores = _query(arch.bow, arch.present, q,
                                 jnp.zeros(arch.present.shape[0], bool), 2)
            for cand in np.asarray(ids):
                if cand < 0:
                    continue
                if self._verify_and_merge(feats, int(cand), ai):
                    return True
        self._merge_cooldown = 5
        return False

    def _verify_and_merge(self, feats, cand: int, archive_idx: int) -> bool:
        from ..solver.sim3 import optimize_sim3, sim3_ransac
        from ..map.atlas import merge_maps
        cur = self.last_kf_id
        m_new = self.map
        m_old = self.atlas.archived[archive_idx].map
        F = m_new.n_feat

        cand_has = m_old.kf_feat_valid[cand] & (m_old.kf_obs_mp[cand] >= 0)
        cur_has = m_new.kf_feat_valid[cur] & (m_new.kf_obs_mp[cur] >= 0)
        idx, ok = matcher.match_mutual(
            m_old.kf_desc[cand], cand_has, m_new.kf_desc[cur], cur_has,
            max_dist=matcher.TH_LOW)
        if int(jnp.sum(ok)) < 20:
            return False
        idx_c = jnp.clip(idx, 0, F - 1)
        mp_old = jnp.clip(m_old.kf_obs_mp[cand], 0, m_old.max_mp - 1)
        mp_new_row = m_new.kf_obs_mp[cur][idx_c]
        mp_new = jnp.clip(mp_new_row, 0, m_new.max_mp - 1)
        pair_ok = ok & (mp_new_row >= 0)

        pose_old = lie.SE3(m_old.kf_pose.R[cand], m_old.kf_pose.t[cand])
        pose_new = lie.SE3(m_new.kf_pose.R[cur], m_new.kf_pose.t[cur])
        x1 = lie.se3_apply(pose_old, m_old.mp_pos[mp_old])  # archived cam
        x2 = lie.se3_apply(pose_new, m_new.mp_pos[mp_new])  # current cam
        uv1 = m_old.kf_uv[cand]
        uv2 = m_new.kf_uv[cur][idx_c]
        res = sim3_ransac(
            x1, x2, pair_ok, uv1, uv2, self.cam_params,
            jax.random.PRNGKey(cur * 31 + cand),
            min_inliers=15, cam_model=self.cfg.cam_model)
        if not bool(res.ok):
            return False
        S_c, inlier, n_in = optimize_sim3(
            res.sim, x1, x2, pair_ok, uv1, uv2,
            jnp.ones(F), jnp.ones(F), self.cam_params,
            cam_model=self.cfg.cam_model)
        if int(n_in) < 20:
            return False

        # world-level transform: x_newcam = S_c(x_oldcam);
        # S_{old_w -> new_w} = pose_new^-1 o S_c o pose_old
        S_old_to_new = lie.sim3_compose(
            lie.sim3_from_se3(lie.se3_inverse(pose_new)),
            lie.sim3_compose(S_c, lie.sim3_from_se3(pose_old)))
        S_new_to_old = lie.sim3_inverse(S_old_to_new)

        merged, kf_off, mp_off = merge_maps(m_old, m_new, S_new_to_old)
        if merged is None:
            return False

        # adopt the merged map
        arch = self.atlas.archived.pop(archive_idx)
        self.map = merged
        self.last_kf_id = cur + kf_off
        # transform tracker pose into the old world
        C = -jnp.einsum("ji,j->i", pose_new.R, pose_new.t)
        C2 = lie.sim3_apply(S_new_to_old, C)
        R2 = pose_new.R @ S_new_to_old.R.T
        self.cur_pose = lie.SE3(R2, -R2 @ C2)
        self.velocity = lie.se3_identity()
        # rebuild the BoW database: archived rows + current rows shifted
        db = self.loop_closer.db
        n_new = int(m_new.n_kf)
        new_bow = arch.bow.at[kf_off: kf_off + n_new].set(db.bow[:n_new])
        new_present = arch.present.at[kf_off: kf_off + n_new].set(
            db.present[:n_new])
        db.bow = new_bow
        db.present = new_present
        self._merge_cooldown = 20
        return True

    def _fuse_into_keyframe(self, kf_id: int):
        """Merge map-point duplicates visible in keyframe `kf_id`.

        Projects all valid map points into the keyframe; where a projected
        point matches a feature already bound to a DIFFERENT point, the two
        are duplicates — the older point absorbs the newer one everywhere
        (reference MapPoint::Replace keeps the more-observed one;
        lower row id == older == more established here).
        """
        cfg = self.cfg
        m = self.map
        h, w = cfg.image_size
        pose = lie.SE3(m.kf_pose.R[kf_id], m.kf_pose.t[kf_id])
        uv_pred, vis, _ = _project_map_points(
            m.mp_pos, m.mp_valid, pose, self.cam_params, cfg.cam_model, h, w)
        midx, mok = matcher.search_by_projection(
            uv_pred, m.mp_desc, vis, jnp.zeros(m.max_mp, jnp.int32),
            m.kf_uv[kf_id], m.kf_desc[kf_id], m.kf_feat_valid[kf_id],
            m.kf_octave[kf_id], radius=4.0,
            max_dist=matcher.TH_LOW, octave_window=16)
        midx_c = jnp.clip(midx, 0, m.n_feat - 1)
        bound = m.kf_obs_mp[kf_id][midx_c]          # (M,) current binding
        mp_rows = jnp.arange(m.max_mp, dtype=jnp.int32)
        dup = mok & (bound >= 0) & (bound != mp_rows)
        # keep the older id: absorb the larger row into the smaller
        keep = jnp.where(bound < mp_rows, bound, mp_rows)
        kill = jnp.where(bound < mp_rows, mp_rows, bound)
        # build a replacement lookup: replace[kill] = keep
        replace = jnp.arange(m.max_mp, dtype=jnp.int32)
        replace = masked_set(replace, kill, keep, dup)
        # apply to all observation tables (one gather) and drop the killed
        obs = m.kf_obs_mp
        obs_new = jnp.where(obs >= 0, replace[jnp.clip(obs, 0, None)], obs)
        killed_mask = masked_set(jnp.zeros(m.max_mp, bool), kill,
                                 jnp.ones(m.max_mp, bool), dup)
        self.map = m._replace(
            kf_obs_mp=obs_new,
            mp_valid=m.mp_valid & ~killed_mask,
        )

    def _cull_keyframes(self):
        """Drop redundant keyframes (reference KeyFrameCulling,
        localmapping.cc:791): a keyframe whose tracked points are >=90%%
        covered by >=3 other keyframes is removed. Checked over the recent
        window, sparing the newest two and the first."""
        m = self.map
        n_kf = int(m.n_kf)
        if n_kf < 6:
            return
        memb = ms.observation_mask(m)               # (K, M)
        obs_count = jnp.sum(memb, axis=0)           # (M,)
        # fraction of each KF's points seen by >= 4 KFs (self + 3 others)
        pts = memb & (obs_count[None, :] >= 4)
        n_pts = jnp.maximum(jnp.sum(memb, axis=1), 1)
        redundant = jnp.sum(pts, axis=1) / n_pts
        redundant = np.asarray(redundant)
        for k in range(max(1, n_kf - 10), n_kf - 2):
            if bool(m.kf_valid[k]) and redundant[k] > 0.9:
                self.map = self.map._replace(
                    kf_valid=self.map.kf_valid.at[k].set(False),
                    kf_obs_mp=self.map.kf_obs_mp.at[k].set(-1),
                )
                if self.loop_closer is not None:
                    self.loop_closer.db.remove(k)
                m = self.map

    def _local_ba(self):
        """Windowed local BA: newest `ba_window` keyframes optimized, plus
        `ba_fixed_ring` older keyframes held fixed WITH their factors
        included — without those anchor factors, shared landmarks drift away
        from the out-of-window keyframes and the monocular scale diverges
        (reference: the lFixedCameras set in
        Optimizer::LocalBundleAdjustment, optimizer.cc:1096)."""
        cfg = self.cfg
        n_kf = int(self.map.n_kf)
        W = cfg.ba_window + cfg.ba_fixed_ring
        start = max(0, n_kf - W)
        window = np.full(W, -1, np.int32)
        ids = np.arange(start, n_kf, dtype=np.int32)
        window[: len(ids)] = ids
        window_j = jnp.asarray(window)

        kf_idx, mp_idx, uv, octv, valid = ms.observation_triples(
            self.map, window_j)
        inv_s2 = extractor.inv_scale_sigma2(cfg.orb)[
            jnp.clip(octv, 0, cfg.orb.num_levels - 1)]

        poses = lie.SE3(
            self.map.kf_pose.R[np.clip(window, 0, None)],
            self.map.kf_pose.t[np.clip(window, 0, None)])
        n_in_window = len(ids)
        # fix everything except the newest ba_window KFs; always keep at
        # least the oldest (two, when available) fixed for the gauge
        n_fixed = max(n_in_window - cfg.ba_window, min(2, n_in_window - 1))
        fixed = np.zeros(W, bool)
        fixed[:n_fixed] = True
        fixed |= (window < 0)

        prob = ba.make_problem(
            poses, self.map.mp_pos, kf_idx, mp_idx, uv, inv_s2, valid,
            jnp.asarray(fixed), self.cam_params,
            fixed_point=~self.map.mp_valid, max_obs=W)
        STAGES.bump("num_OptKF_BA", max(0, n_in_window - 2))
        STAGES.bump("num_edges_BA", int(np.asarray(valid).sum()))
        with stage("local_ba"):
            new_poses, new_points, inlier, _ = ba.bundle_adjustment(
                prob, cam_model=cfg.cam_model,
                iters_first=cfg.ba_iters_first,
                iters_second=cfg.ba_iters_second)

        # write back window poses (host-known distinct indices — no
        # duplicate-scatter hazards) + all points
        ids_j = jnp.asarray(ids)
        self.map = self.map._replace(
            kf_pose=lie.SE3(
                self.map.kf_pose.R.at[ids_j].set(new_poses.R[:n_in_window]),
                self.map.kf_pose.t.at[ids_j].set(new_poses.t[:n_in_window]),
            ),
            mp_pos=jnp.where(self.map.mp_valid[:, None], new_points,
                             self.map.mp_pos),
        )
        # drop observations judged outliers by BA: factor layout is (W, F)
        # row-major, so reshape the verdicts into per-window-slot rows.
        F = self.map.n_feat
        drop = (valid & ~inlier).reshape(W, F)[:n_in_window]
        kfo = self.map.kf_obs_mp
        kfo = kfo.at[ids_j].set(jnp.where(drop, -1, kfo[ids_j]))
        self.map = self.map._replace(kf_obs_mp=kfo)

        # keep current pose consistent with the newest KF estimate
        if self.last_kf_id >= 0 and n_in_window > 0:
            self.cur_pose = lie.SE3(self.map.kf_pose.R[self.last_kf_id],
                                    self.map.kf_pose.t[self.last_kf_id])

    # -- output ------------------------------------------------------------

    def trajectory_tum(self) -> np.ndarray:
        """(N, 8) array: timestamp, tx ty tz, qx qy qz qw (Twc convention,
        reference System::SaveTrajectoryTUM, system.cc:558)."""
        rows = []
        for rec in self.trajectory:
            Twc = lie.se3_inverse(rec.pose)
            q = np.asarray(lie.quat_from_mat(Twc.R))  # (w,x,y,z)
            t = np.asarray(Twc.t)
            rows.append([rec.timestamp, t[0], t[1], t[2],
                         q[1], q[2], q[3], q[0]])
        return np.asarray(rows)
