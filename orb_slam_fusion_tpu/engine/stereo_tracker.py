"""Stereo tracking pipeline.

Reference paths covered: Tracking::StereoInitialization (tracking.cc:1681 —
instant map bootstrap from disparity depth), stereo new-point creation at
keyframes (tracking.cc:2550 CreateNewKeyFrame close-point insertion +
localmapping stereo triangulation), and stereo residuals in local BA
(EdgeStereoSE3ProjectXYZ). Scale is metric from the first frame — no
two-view RANSAC, no scale gauge.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import cameras, lie
from ..frontend import extractor, matcher
from ..frontend.stereo import (depth_from_disparity, fisheye_stereo_match,
                               stereo_match, subpixel_refine)
from ..map import map_state as ms
from ..utils import masked_set
from .config import SlamConfig
from .tracker import FrameRecord, MonoTracker, TrackState, _rays_from_uv


class StereoTracker(MonoTracker):
    # metric scale from the stereo baseline: temporal local-BA window
    # (see MonoTracker.ba_covisible_window)
    ba_covisible_window = False
    """Stereo SLAM session (rectified pair, shared intrinsics)."""

    def __init__(self, config: SlamConfig, baseline: float):
        super().__init__(config)
        self.baseline = float(baseline)
        self.bf = float(baseline) * float(config.cam_params[0])
        # per-keyframe right-image u per feature (-1 = mono observation)
        self.kf_uright = jnp.full(
            (config.max_keyframes, config.orb.n_features), -1.0, jnp.float32)
        self._cur_uright = None
        self._cur_has_stereo = None
        self.min_stereo_points = 50

    # -- public API --------------------------------------------------------

    def process_stereo_features(self, featsL: extractor.Features,
                                featsR: extractor.Features,
                                timestamp: float,
                                images=None) -> FrameRecord:
        u_right, has_stereo = stereo_match(featsL, featsR)
        if images is not None:
            # subpixel SAD disparity refinement on the rectified pair
            # (reference Frame::ComputeStereoMatches, frame.cc:940+)
            u_right, has_stereo = subpixel_refine(
                images[0], images[1], featsL.uv, u_right, has_stereo)
        self._cur_uright = u_right
        self._cur_has_stereo = has_stereo
        if self.state in (TrackState.NO_IMAGES, TrackState.NOT_INITIALIZED):
            rec = self._stereo_initialize(featsL, timestamp)
            self.frame_id += 1
            self._append_record(rec)
            return rec
        return self.process_features(featsL, timestamp)

    def process_stereo_images(self, imgL, imgR, timestamp: float
                              ) -> FrameRecord:
        fL = extractor.extract_features(imgL, self.cfg.orb)
        fR = extractor.extract_features(imgR, self.cfg.orb)
        return self.process_stereo_features(fL, fR, timestamp,
                                            images=(imgL, imgR))


    # -- initialization ----------------------------------------------------

    def _bootstrap(self, feats, timestamp) -> FrameRecord:
        """Post-reset re-initialization: stereo bootstraps instantly from
        the current frame's disparity (the right-image association was
        already computed for this frame by process_stereo_*)."""
        if self._cur_uright is None:
            return super()._bootstrap(feats, timestamp)
        return self._stereo_initialize(feats, timestamp)

    def _stereo_initialize(self, feats, timestamp) -> FrameRecord:
        """Instant bootstrap: every stereo feature becomes a map point."""
        cfg = self.cfg
        z = depth_from_disparity(feats.uv[:, 0], self._cur_uright,
                                 self.bf, self._cur_has_stereo)
        good = self._cur_has_stereo & feats.valid & (z > 0.1) \
            & (z < 40.0 * self.baseline * 100)
        if int(jnp.sum(good)) < self.min_stereo_points:
            return FrameRecord(timestamp, self.cur_pose, 0, "init-fail")

        rays = _rays_from_uv(feats.uv, self.cam_params, cfg.cam_model)
        X_c = rays * z[:, None]
        pose0 = lie.se3_identity()
        X_w = X_c  # world = first camera

        dist = jnp.linalg.norm(X_w, axis=-1)
        # camera->point direction (camera at the origin in the bootstrap)
        normals = X_w / jnp.maximum(dist[:, None], 1e-9)
        min_d, max_d = ms.scale_invariance_band(
            dist, feats.octave, cfg.orb.num_levels)
        self.map, mp_ids = ms.add_map_points(
            self.map, X_w, feats.desc, normals,
            jnp.int32(0), jnp.int32(0), good,
            min_dist=min_d, max_dist=max_d)
        self.map, kf0 = ms.add_keyframe(
            self.map, pose0, timestamp, feats.uv, feats.desc,
            feats.octave, feats.valid, mp_ids)
        self.kf_uright = self.kf_uright.at[0].set(
            jnp.where(self._cur_has_stereo, self._cur_uright, -1.0))

        self.cur_pose = pose0
        self.last_pose = pose0
        self.velocity = lie.se3_identity()
        self.last_kf_id = int(kf0)
        self.last_kf_tracked = int(jnp.sum(mp_ids >= 0))
        self._last_kf_tracked_dev = None
        self.frames_since_kf = 0
        self.state = TrackState.OK
        if self.loop_closer is not None:
            self.loop_closer.add_keyframe(0, feats.desc, feats.valid)
        return FrameRecord(timestamp, pose0, self.last_kf_tracked,
                           "init-done")

    def reset_map(self):
        """Archive + restart (see MonoTracker.reset_map). The stereo right-u
        table must be cleared with the map: keyframe rows are written only
        AFTER the insert-time local BA runs (u_right joins the residuals
        from the next window solve), so a stale row from the pre-reset map
        would feed garbage stereo residuals into the new map's first
        keyframe solves — measured to fling the bootstrap geometry by
        meters and collapse tracking within two frames of a re-bootstrap."""
        super().reset_map()
        self.kf_uright = jnp.full_like(self.kf_uright, -1.0)

    # -- capacity hooks ------------------------------------------------------

    def _on_kf_remap(self, old_to_new, order):
        super()._on_kf_remap(old_to_new, order)
        self.kf_uright = self.kf_uright[jnp.asarray(order)]

    def _on_kf_grow(self, new_max_kf: int):
        super()._on_kf_grow(new_max_kf)
        K, F = self.kf_uright.shape
        if new_max_kf > K:
            self.kf_uright = jnp.concatenate(
                [self.kf_uright,
                 jnp.full((new_max_kf - K, F), -1.0, jnp.float32)], axis=0)

    def _on_maps_merged(self, arch, kf_off: int, S_new_to_old):
        """Shift the stereo right-u rows to the welded index space; the
        archived map's rows fall back to mono observations (-1) — the
        archive does not keep u_right, and the stereo residual mask degrades
        gracefully to mono reprojection for those keyframes."""
        super()._on_maps_merged(arch, kf_off, S_new_to_old)
        K = self.map.max_kf
        F = self.kf_uright.shape[1]
        n_new = int(self.map.n_kf) - kf_off
        merged = jnp.full((K, F), -1.0, jnp.float32)
        merged = merged.at[kf_off:kf_off + n_new].set(
            self.kf_uright[:n_new])
        self.kf_uright = merged

    # -- keyframe insertion ------------------------------------------------

    def _insert_keyframe(self, feats, timestamp, obs):
        """Stereo KF insert: unmatched stereo features become points
        immediately (reference: CreateNewKeyFrame close-point creation),
        then the usual multi-view triangulation tops up far/mono points."""
        cfg = self.cfg
        kf_id_expected = int(self.map.n_kf)
        u_right = self._cur_uright
        has_stereo = self._cur_has_stereo

        if u_right is not None:
            z = depth_from_disparity(feats.uv[:, 0], u_right, self.bf,
                                     has_stereo)
            new_mask = (has_stereo & feats.valid & (obs < 0)
                        & (z > 0.1) & (z < 30.0))
            rays = _rays_from_uv(feats.uv, self.cam_params, cfg.cam_model)
            X_c = rays * z[:, None]
            Twc = lie.se3_inverse(self.cur_pose)
            X_w = lie.se3_apply(Twc, X_c)
            dist = jnp.linalg.norm(X_c, axis=-1)
            normals = X_w - Twc.t
            normals = normals / jnp.maximum(
                jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-9)
            min_d, max_d = ms.scale_invariance_band(
                dist, feats.octave, cfg.orb.num_levels)
            self.map, new_ids = ms.add_map_points(
                self.map, X_w, feats.desc, normals,
                jnp.int32(kf_id_expected), jnp.int32(kf_id_expected),
                new_mask, min_dist=min_d, max_dist=max_d)
            obs = jnp.where(new_ids >= 0, new_ids, obs)

        super()._insert_keyframe(feats, timestamp, obs)
        kf_id = self.last_kf_id
        if kf_id == kf_id_expected and u_right is not None:
            self.kf_uright = self.kf_uright.at[kf_id].set(
                jnp.where(has_stereo, u_right, -1.0))

    # -- local BA with stereo residuals -----------------------------------

    def _local_ba(self):
        """Stereo local BA: one device dispatch with 3-dim stereo residuals
        (reference EdgeStereoSE3ProjectXYZ); metric scale means a single
        fixed anchor keyframe suffices for the gauge."""
        from ..solver.local_ba import local_ba_step

        cfg = self.cfg
        window, fixed, n_in, _ = self._ba_window_arrays(min_fixed=1)
        if self._start_background_lba(window, fixed, n_in):
            return
        self.map, costs, n_edges = local_ba_step(
            self.map, jnp.asarray(window), jnp.asarray(fixed),
            extractor.inv_scale_sigma2(cfg.orb), self.cam_params,
            kf_uright=self.kf_uright, bf=self.bf,
            cam_model=cfg.cam_model,
            iters_first=cfg.ba_iters_first,
            iters_second=cfg.ba_iters_second)
        if self.last_kf_id >= 0 and n_in > 0:
            self.cur_pose = lie.SE3(self.map.kf_pose.R[self.last_kf_id],
                                    self.map.kf_pose.t[self.last_kf_id])


class RgbdTracker(StereoTracker):
    """RGB-D SLAM session.

    Reference: Tracking::GrabImageRGBD + Frame::ComputeStereoFromRGBD
    (src/map/frame.cc): per-feature depth is converted into a virtual
    right-image coordinate u_R = u_L - bf/z, after which the entire stereo
    machinery (instant bootstrap, stereo residuals, depth-seeded points)
    applies unchanged.
    """

    def process_rgbd_features(self, feats: extractor.Features,
                              depth: jnp.ndarray, timestamp: float
                              ) -> FrameRecord:
        """depth: (N,) metric depth per feature (<=0 = no depth)."""
        has = feats.valid & (depth > 0.05)
        u_right = jnp.where(has, feats.uv[:, 0] - self.bf /
                            jnp.maximum(depth, 1e-6), -1.0)
        self._cur_uright = u_right
        self._cur_has_stereo = has
        if self.state in (TrackState.NO_IMAGES, TrackState.NOT_INITIALIZED):
            rec = self._stereo_initialize(feats, timestamp)
            self.frame_id += 1
            self._append_record(rec)
            return rec
        return self.process_features(feats, timestamp)

    def process_rgbd_images(self, img, depth_img, timestamp: float
                            ) -> FrameRecord:
        feats = extractor.extract_features(img, self.cfg.orb)
        # sample the depth image at keypoint locations (nearest neighbor)
        h, w = depth_img.shape
        xi = jnp.clip(jnp.round(feats.uv[:, 0]).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(jnp.round(feats.uv[:, 1]).astype(jnp.int32), 0, h - 1)
        depth = depth_img[yi, xi]
        # depth is sampled at raw pixel positions; geometry then uses
        # undistorted coordinates (reference Frame RGB-D ctor ordering)
        return self.process_rgbd_features(self._undistort(feats), depth,
                                          timestamp)


class FisheyeStereoTracker(RgbdTracker):
    """Stereo-fisheye SLAM session (two Kannala-Brandt8 cameras, TUM-VI
    style rig).

    Reference: Frame's stereo-fisheye constructor + ComputeStereoFishEyeMatches
    (src/map/frame.cc:1134+) and KannalaBrandt8::TriangulateMatches
    (src/cam/camera_models/kannalabrandt8_model.cc). TPU redesign: left-right
    association is one dense masked Hamming match restricted to the lapping
    areas; matched rays are midpoint-triangulated through the rig extrinsics
    (frontend/stereo.py::fisheye_stereo_match), and the resulting metric depth
    drives the same machinery as RGB-D: a virtual right-u coordinate
    u_R = u_L - bf/z carries the scale information into the stereo residuals
    (the reference instead keeps the right observations as separate
    body-frame reprojection factors — the virtual-disparity form keeps the
    per-frame program identical across stereo modes at equal scale
    observability).
    """

    def __init__(self, config: SlamConfig, cam2_params, T_c1_c2,
                 lapping1=None, lapping2=None):
        T12 = np.asarray(T_c1_c2, np.float64)
        baseline = float(np.linalg.norm(T12[:3, 3]))
        super().__init__(config, baseline)
        self.cam2_params = jnp.asarray(cam2_params, jnp.float32)
        T21 = np.linalg.inv(T12)
        self.R21 = jnp.asarray(T21[:3, :3], jnp.float32)
        self.t21 = jnp.asarray(T21[:3, 3], jnp.float32)
        w = config.image_size[1]
        self.lap1 = tuple(lapping1) if lapping1 else (0.0, float(w))
        self.lap2 = tuple(lapping2) if lapping2 else (0.0, float(w))

    def process_stereo_features(self, featsL: extractor.Features,
                                featsR: extractor.Features,
                                timestamp: float) -> FrameRecord:
        depth, _ = fisheye_stereo_match(
            featsL, featsR, self.cam_params, self.cam2_params,
            self.R21, self.t21, self.lap1, self.lap2)
        return self.process_rgbd_features(featsL, depth, timestamp)
