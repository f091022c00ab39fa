"""Visual-inertial (monocular + IMU) tracking pipeline.

Extends the monocular tracker with the reference's inertial machinery
(tracking.cc + localmapping.cc IMU paths):

* per-frame IMU queueing + preintegration from the last frame and from the
  last keyframe (Tracking::PreintegrateIMU, tracking.cc:1099 — here the
  float64 host integrator);
* IMU state prediction for matching (Tracking::PredictStateIMU,
  tracking.cc:1201);
* the staged IMU initialization (LocalMapping::InitializeIMU,
  localmapping.cc:1035): once enough keyframes/time accumulated, estimate
  gravity direction, scale, bias and velocities with `inertial_init`, then
  apply the scaled-rotation gauge transform to the whole map
  (Map::ApplyScaledRotation, map.cc:230) so gravity is -z and scale is
  metric;
* after initialization, local mapping switches to visual-inertial BA
  (`visual_inertial_ba` = LocalInertialBA).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import lie
from ..imu.factors import information_from_cov
from ..imu.preintegration import (GRAVITY, ImuBias, ImuCalib, Preintegrated,
                                  preintegrate_host, zero_bias)
from ..map import map_state as ms
from ..solver import ba
from ..solver.vi_ba import (InertialFactorBatch, VIState, body_state,
                            inertial_init, visual_inertial_ba)
from ..frontend import extractor
from .config import SlamConfig
from .tracker import FrameRecord, MonoTracker, TrackState
from .stereo_tracker import FisheyeStereoTracker, StereoTracker


def _concat_raw(a: Optional[tuple], b: Optional[tuple]) -> Optional[tuple]:
    """Concatenate two raw (acc, gyro, dt) measurement windows."""
    if a is None:
        return b
    if b is None:
        return a
    return tuple(np.concatenate([x, y]) for x, y in zip(a, b))


class InertialMixin:
    """IMU machinery shared by the mono- and stereo-inertial trackers.

    Mix into a visual tracker class (MonoTracker / StereoTracker); the
    visual base provides tracking/mapping, this mixin adds preintegration,
    IMU prediction, staged initialization and visual-inertial local BA.
    `_imu_optimize_scale` controls whether the init estimates a scale
    (monocular) or trusts the visual metric scale (stereo/RGB-D).
    """

    _imu_optimize_scale = True

    def _tri_covisible(self) -> int:
        """Inertial sessions triangulate against the temporal chain only:
        long-baseline covisible pairs measurably destabilize the staged
        visual-inertial initialization (0.006 -> 0.23 m ATE on the
        staged-init sim), and the IMU bridges the low-parallax stretches
        that make them load-bearing for pure vision."""
        return 0

    def _init_inertial(self, calib: ImuCalib):
        self.calib = calib
        self.imu_initialized = False
        self.gravity_w = jnp.array([0.0, 0.0, -GRAVITY], jnp.float32)
        self.bias = zero_bias()
        self.cur_vel = jnp.zeros(3, jnp.float32)
        # per-keyframe inertial records (host lists, indexed by kf row)
        self.kf_vel: List[np.ndarray] = []
        self.kf_bias: List[ImuBias] = []
        self.kf_pre: List[Optional[Preintegrated]] = []  # pre from prev KF
        self.kf_time: List[float] = []
        # raw measurement windows (acc, gyro, dt) per keyframe — kept so
        # preintegrations can be RE-integrated at a moved bias estimate
        # (reference Preintegrated::Reintegrate, imu_types.cc:180) and
        # merged when the previous keyframe is culled (MergePrevious,
        # imu_types.cc:222)
        self.kf_raw: List[Optional[tuple]] = []
        # measurement buffers since last frame / last keyframe
        self._buf_kf = ([], [], [])   # acc, gyro, dt since last KF
        self._last_frame_time: Optional[float] = None
        self._pre_frame: Optional[Preintegrated] = None
        self._prev_pose_imu = self.cur_pose
        self._prev_vel_imu = self.cur_vel
        # marginalized 15-dim prior carried frame to frame (reference
        # ConstraintPoseImu; rebuilt at keyframes where the windowed VI-BA
        # re-anchors the state)
        self._prior = None
        # staged initialization (reference localmapping.cc:148-199):
        # stage 1 = first init, 2 = VIBA1 (t>5 s), 3 = VIBA2 (t>15 s)
        self._imu_stage = 0
        self._imu_init_time = 0.0
        self.init_min_time = 2.0      # seconds of KFs before IMU init
        self.init_min_kfs = 8

    # -- public API --------------------------------------------------------

    def process_frame_imu(self, feats, timestamp: float,
                          acc: np.ndarray, gyro: np.ndarray,
                          meas_t: np.ndarray) -> FrameRecord:
        """feats + IMU measurements in (last_frame_time, timestamp]."""
        pre_frame = None
        if self._last_frame_time is not None and len(meas_t) > 0:
            dts = np.diff(np.concatenate(
                [[self._last_frame_time], np.asarray(meas_t)]))
            dts = np.maximum(dts, 0.0)
            # tail to the frame timestamp
            tail = max(0.0, timestamp - float(meas_t[-1]))
            acc_w = np.concatenate([acc, acc[-1:]])
            gyro_w = np.concatenate([gyro, gyro[-1:]])
            dts_w = np.concatenate([dts, [tail]])
            pre_frame = preintegrate_host(
                acc_w, gyro_w, dts_w, self.bias, self.calib)
            a, g, d = self._buf_kf
            a.extend(acc_w.tolist())
            g.extend(gyro_w.tolist())
            d.extend(dts_w.tolist())

        # previous frame's OPTIMIZED state: the fixed side of the per-frame
        # pose-inertial factor (reference PoseInertialOptimizationLastFrame)
        self._pre_frame = pre_frame
        self._prev_pose_imu = self.cur_pose
        self._prev_vel_imu = self.cur_vel

        # IMU pose prediction replaces the constant-velocity model
        if self.imu_initialized and pre_frame is not None \
                and self.state == TrackState.OK:
            self._predict_with_imu(pre_frame)

        rec = self._process_visual(feats, timestamp)
        self._last_frame_time = timestamp
        return rec

    def _process_visual(self, feats, timestamp) -> FrameRecord:
        """Visual routing hook — stereo subclasses bootstrap differently."""
        return self.process_features(feats, timestamp)

    def _post_track_refine(self, feats, upd) -> None:
        """Per-frame pose-inertial re-solve with the marginalized prior
        (reference: Optimizer::PoseInertialOptimizationLastFrame,
        optimizer.cc:4762 + Marginalize, optimizer.cc:2904): the previous
        frame rides along under its 15-dim prior, an EdgeInertial + bias
        random-walk edges connect it to the current frame, reprojection
        factors constrain the current pose; afterwards the previous state
        is Schur-marginalized into the prior carried to the next frame.
        One extra device dispatch, no host sync."""
        if not self.imu_initialized or self._pre_frame is None:
            return
        from ..frontend import extractor as _ext
        from ..imu.factors import information_from_cov
        from ..solver.pose_inertial_prior import (
            make_initial_prior, pose_inertial_marginalized)

        if self._prior is None:
            self._prior = make_initial_prior(
                self._prev_pose_imu, self._prev_vel_imu, self.bias)

        m = self.map
        obs = upd.obs
        mp = jnp.clip(obs, 0, m.max_mp - 1)
        valid = (obs >= 0) & feats.valid
        cfg = self.cfg
        inv_s2 = _ext.inv_scale_sigma2(cfg.orb)[
            jnp.clip(feats.octave, 0, cfg.orb.num_levels - 1)]
        info = information_from_cov(self._pre_frame)
        pose, vel, bias, prior, inlier, n_in = pose_inertial_marginalized(
            self._prior, self.cur_pose, jnp.asarray(self.cur_vel),
            self._pre_frame, info, self.calib,
            m.mp_pos[mp], feats.uv, inv_s2, valid, self.cam_params,
            cam_model=cfg.cam_model)
        self.cur_pose = pose
        self.cur_vel = vel
        self.bias = ImuBias(bias.gyro, bias.acc)
        self._prior = prior
        self.velocity = lie.se3_compose(pose,
                                        lie.se3_inverse(self.last_pose))

    def _reset_prior(self) -> None:
        """Restart the marginalization chain from the current (keyframe-
        refreshed or map-corrected) state — called after VI-BA, gauge
        transforms, loop corrections and merges, where the map absorbed
        the accumulated information (reference: the prior is rebuilt from
        the keyframe-anchored solve, optimizer.cc:4394)."""
        if not self.imu_initialized:
            self._prior = None
            return
        from ..solver.pose_inertial_prior import make_initial_prior
        self._prior = make_initial_prior(
            self.cur_pose, jnp.asarray(self.cur_vel), self.bias)

    # -- prediction --------------------------------------------------------

    def _predict_with_imu(self, pre: Preintegrated):
        """Propagate (pose, vel) with the preintegrated frame delta and
        stash the result where the tracker's motion model reads it."""
        R_wb, p_wb = body_state(self.cur_pose, self.calib)
        dt = float(pre.dT)
        g = self.gravity_w
        R_wb2 = R_wb @ pre.dR
        v2 = self.cur_vel + g * dt + R_wb @ pre.dV
        p2 = p_wb + self.cur_vel * dt + 0.5 * g * dt * dt + R_wb @ pre.dP
        # back to camera pose: T_cw = T_cb o T_bw
        R_bw = R_wb2.T
        t_bw = -R_bw @ p2
        Tcb_R = self.calib.Tbc_R.T
        Tcb_t = -Tcb_R @ self.calib.Tbc_t
        R_cw = Tcb_R @ R_bw
        t_cw = Tcb_R @ t_bw + Tcb_t
        pred = lie.SE3(jnp.asarray(R_cw), jnp.asarray(t_cw))
        # the tracker predicts with velocity o cur_pose; encode the IMU
        # prediction as that composition
        self.velocity = lie.se3_compose(pred, lie.se3_inverse(self.cur_pose))
        self.cur_vel = v2

    # -- keyframe hooks ----------------------------------------------------

    def _create_initial_map(self, feats, timestamp, idx, res):
        super()._create_initial_map(feats, timestamp, idx, res)
        # the two bootstrap keyframes predate any usable preintegration
        # window (the buffer spans from before the reference frame), so
        # they carry no inertial factor
        n_kf = int(self.map.n_kf)
        while len(self.kf_pre) < n_kf:
            self.kf_pre.append(None)
            self.kf_raw.append(None)
            self.kf_vel.append(np.zeros(3, np.float32))
            self.kf_bias.append(self.bias)
            self.kf_time.append(timestamp)
        self._buf_kf = ([], [], [])

    def _stereo_initialize(self, feats, timestamp):
        rec = super()._stereo_initialize(feats, timestamp)
        n_kf = int(self.map.n_kf)
        while len(self.kf_pre) < n_kf:
            self.kf_pre.append(None)
            self.kf_raw.append(None)
            self.kf_vel.append(np.zeros(3, np.float32))
            self.kf_bias.append(self.bias)
            self.kf_time.append(timestamp)
        self._buf_kf = ([], [], [])
        return rec

    def _insert_keyframe(self, feats, timestamp, obs):
        prev_n = int(self.map.n_kf)
        # record the inertial state BEFORE the base insert — the base class
        # runs local BA during insertion, which (post IMU init) reads these
        # tables for the new keyframe row
        a, g, d = self._buf_kf
        pre, raw = None, None
        if len(d) > 0 and prev_n > 0:
            raw = (np.asarray(a, np.float64), np.asarray(g, np.float64),
                   np.asarray(d, np.float64))
            pre = preintegrate_host(*raw, self.bias, self.calib)
        self._buf_kf = ([], [], [])
        self.kf_pre.append(pre)
        self.kf_raw.append(raw)
        self.kf_vel.append(np.asarray(self.cur_vel))
        self.kf_bias.append(self.bias)
        self.kf_time.append(timestamp)

        super()._insert_keyframe(feats, timestamp, obs)
        if int(self.map.n_kf) == prev_n:   # insert failed/full — roll back
            self.kf_pre.pop()
            self.kf_raw.pop()
            self.kf_vel.pop()
            self.kf_bias.pop()
            self.kf_time.pop()
            return

        if not self.imu_initialized:
            self._maybe_initialize_imu()
        else:
            self._staged_inertial_refine()
        # the windowed VI-BA / IMU init just re-anchored the state: restart
        # the frame-to-frame marginalization chain from it
        self._reset_prior()

    def reset_map(self):
        super().reset_map()
        self.imu_initialized = False
        self.bias = zero_bias()
        self.cur_vel = jnp.zeros(3, jnp.float32)
        self.kf_vel, self.kf_bias, self.kf_pre, self.kf_time = [], [], [], []
        self.kf_raw = []
        self._buf_kf = ([], [], [])
        self._pre_frame = None
        self._prior = None
        self._imu_stage = 0
        self._imu_init_time = 0.0

    def _inertial_archive_snapshot(self):
        return {"kf_vel": list(self.kf_vel), "kf_bias": list(self.kf_bias),
                "kf_pre": list(self.kf_pre), "kf_time": list(self.kf_time),
                "kf_raw": list(self.kf_raw)}

    def _on_maps_merged(self, arch, kf_off: int, S_new_to_old):
        """Inertial-correct merge (reference MergeLocal2 + MergeInertialBA,
        loopclosing.cc:1651-1941, optimizer.cc:3859): re-home the per-KF
        inertial tables into the merged index space, transform the active
        map's velocities by the weld Sim3 (v' = s R v; biases and body-frame
        preintegrations are invariant), then re-align gravity and re-solve
        the full inertial history over the merged map."""
        super()._on_maps_merged(arch, kf_off, S_new_to_old)
        s = float(np.asarray(S_new_to_old.s))
        R = np.asarray(S_new_to_old.R)
        new_vel = [s * (R @ np.asarray(v)) for v in self.kf_vel]
        ai = arch.inertial
        if ai is None:
            old_ts = np.asarray(arch.map.kf_timestamp[:kf_off])
            old = {"kf_vel": [np.zeros(3, np.float32)] * kf_off,
                   "kf_bias": [zero_bias()] * kf_off,
                   "kf_pre": [None] * kf_off,
                   "kf_time": [float(t) for t in old_ts],
                   "kf_raw": [None] * kf_off}
        else:
            old = ai
        self.kf_vel = list(old["kf_vel"]) + new_vel
        self.kf_bias = list(old["kf_bias"]) + list(self.kf_bias)
        self.kf_pre = list(old["kf_pre"]) + list(self.kf_pre)
        self.kf_time = list(old["kf_time"]) + list(self.kf_time)
        self.kf_raw = list(old["kf_raw"]) + list(self.kf_raw)
        self.cur_vel = jnp.asarray(self.kf_vel[-1])
        # the merged world is the ARCHIVED map's frame — gravity alignment
        # must be re-established over the joint history (reference:
        # InertialOptimization + ApplyScaledRotation in MergeLocal2)
        if self.imu_initialized:
            if self._inertial_estimate_apply(refine=False):
                self._full_vi_ba()
            self._reset_prior()

    def _can_cull(self, k: int) -> bool:
        """Inertial culling gate: the merged preintegration window after the
        cull (previous kept KF -> next KF) must stay under 3 s (reference
        localmapping.cc:885-921)."""
        if k <= 0 or k + 1 >= len(self.kf_time):
            return False
        return (self.kf_time[k + 1] - self.kf_time[k - 1]) < 3.0

    def _on_kf_remap(self, old_to_new, order):
        """Keyframe compaction: permute the inertial side tables, merging
        the preintegration windows of dropped keyframes into the next kept
        keyframe (reference: Preintegrated::MergePrevious on KeyFrameCulling
        of inertial maps, imu_types.cc:222, localmapping.cc:905)."""
        super()._on_kf_remap(old_to_new, order)
        n_old = len(self.kf_vel)
        vel, bias, pre, time_, raw_l = [], [], [], [], []
        pending = None   # concatenated raw windows of dropped keyframes
        for k in range(n_old):
            if old_to_new[k] >= 0:
                raw = self.kf_raw[k]
                p = self.kf_pre[k]
                if pending is not None:
                    raw = _concat_raw(pending, raw)
                    p = (preintegrate_host(
                        *raw, p.bias0 if p is not None else self.bias,
                        self.calib) if raw is not None else p)
                    pending = None
                vel.append(self.kf_vel[k])
                bias.append(self.kf_bias[k])
                pre.append(p)
                raw_l.append(raw)
                time_.append(self.kf_time[k])
            else:
                pending = _concat_raw(pending, self.kf_raw[k])
        self.kf_vel, self.kf_bias, self.kf_pre = vel, bias, pre
        self.kf_raw, self.kf_time = raw_l, time_

    # -- IMU initialization ------------------------------------------------

    def _inertial_factor_batch(self, lo: int, hi: int,
                               pad_to: Optional[int] = None
                               ) -> Optional[InertialFactorBatch]:
        """Batch the stored per-KF preintegrations for KF rows [lo, hi).

        `pad_to` pads the batch to a FIXED length with invalid duplicates of
        the first factor — keeping the array shapes static across keyframes
        so the jitted visual-inertial BA compiles exactly once instead of
        once per distinct window occupancy.
        """
        pres, iis, jjs = [], [], []
        for k in range(max(lo + 1, 1), hi):
            if self.kf_pre[k] is not None:
                pres.append(self.kf_pre[k])
                iis.append(k - 1 - lo)
                jjs.append(k - lo)
        if not pres:
            return None
        n_real = len(pres)
        if pad_to is not None:
            if n_real > pad_to:
                pres, iis, jjs = (pres[-pad_to:], iis[-pad_to:],
                                  jjs[-pad_to:])
                n_real = pad_to
            while len(pres) < pad_to:
                pres.append(pres[0])
                iis.append(iis[0])
                jjs.append(jjs[0])
        pre_b = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *pres)
        info = jax.vmap(information_from_cov)(pre_b)
        valid = jnp.arange(len(pres)) < n_real
        return InertialFactorBatch(
            i=jnp.asarray(iis, jnp.int32), j=jnp.asarray(jjs, jnp.int32),
            pre=pre_b, info=info, valid=valid)

    def _maybe_initialize_imu(self):
        n_kf = int(self.map.n_kf)
        if n_kf < self.init_min_kfs:
            return
        if self.kf_time[-1] - self.kf_time[0] < self.init_min_time:
            return
        if self._inertial_estimate_apply(refine=False):
            self.imu_initialized = True
            self._imu_stage = 1
            self._imu_init_time = self.kf_time[-1]
            # reference InitializeIMU ends with FullInertialBA
            # (localmapping.cc:1154-1161): pull the whole pre-init
            # trajectory + structure consistent with the IMU, absorbing the
            # scale drift a single global gauge factor cannot
            self._full_vi_ba()

    def _inertial_estimate_apply(self, refine: bool,
                                 prior_g: float = 1e2,
                                 prior_a: Optional[float] = None) -> bool:
        """Estimate (scale,) gravity, biases, velocities over ALL keyframes
        and apply them to the map (reference InertialOptimization +
        ApplyScaledRotation + Reintegrate, localmapping.cc:1035-1272).

        `refine` guards the re-runs (VIBA1/VIBA2/scale refinement): the map
        is already gravity-aligned and ~metric, so the correction must be
        near identity — a degenerate solve is rejected instead of applied.
        prior_g/prior_a: zero-mean bias prior weights (reference
        InitializeIMU priorG/priorA staging, localmapping.cc:151-182).
        prior_a=None defaults to the first-init values: 1e10 when scale is
        optimized (monocular) / 1e5 when it is visual-metric (stereo).
        """
        if prior_a is None:
            prior_a = 1e10 if self._imu_optimize_scale else 1e5
        # the solve reads ALL keyframe poses and then gauge-transforms the
        # whole map: a background local BA in flight would both feed it
        # un-refined geometry and later scatter pre-transform poses back
        self._lba_drain()
        # ...and an in-flight background GBA snapshot holds PRE-transform
        # geometry that its adoption would scatter over the rotated map —
        # the relative-correction propagation of _adopt_gba cannot
        # represent a global gauge change (reference: mbStopGBA is raised
        # before any whole-map rewrite). Measured failure: loop-closure
        # GBA pending across IMU init destroyed the map outright.
        if self.loop_closer is not None:
            self.loop_closer.pending_gba = None
        n_kf = int(self.map.n_kf)
        ifac = self._inertial_factor_batch(0, n_kf)
        if ifac is None or ifac.i.shape[0] < self.init_min_kfs - 2:
            return False

        poses = lie.SE3(self.map.kf_pose.R[:n_kf], self.map.kf_pose.t[:n_kf])
        s, R_wg, bias, vel, costs = inertial_init(
            poses, ifac, self.calib,
            optimize_scale=self._imu_optimize_scale,
            prior_g=prior_g, prior_a=prior_a)
        s_f = float(s) if self._imu_optimize_scale else 1.0
        if not np.isfinite(s_f):
            return False
        if refine:
            # reference ScaleRefinement sanity: the refinement must be a
            # small correction (localmapping.cc:1274-1341)
            ang = float(jnp.linalg.norm(lie.so3_log(jnp.asarray(R_wg))))
            if not (0.5 < s_f < 2.0) or ang > 0.35:
                return False
        elif s_f < 1e-3 or s_f > 1e3:
            return False

        self._apply_scaled_rotation(s_f, R_wg)
        self.bias = ImuBias(bias.gyro, bias.acc)
        # velocities from the init are ALREADY metric (they pair with the
        # scaled positions s*p in the residual) but expressed in the old
        # world orientation — rotate only, do not rescale
        R_gw = jnp.asarray(np.asarray(R_wg).T)
        vel_new = jnp.einsum("ij,kj->ki", R_gw, vel)
        self.kf_vel = [np.asarray(v) for v in vel_new]
        self.kf_bias = [self.bias] * n_kf
        self.cur_vel = jnp.asarray(self.kf_vel[-1])
        # re-integrate the stored windows at the estimated bias (reference:
        # Preintegrated::Reintegrate after InitializeIMU, imu_types.cc:180 —
        # exact, from the raw buffers, not the first-order correction)
        self._reintegrate_all(self.bias)
        return True

    def _staged_inertial_refine(self):
        """Staged re-initialization (reference localmapping.cc:148-199):
        VIBA1 at t>5 s and VIBA2 at t>15 s after IMU init re-estimate
        gravity/bias(/scale for mono) over the full keyframe history,
        re-linearize the stored preintegrations at the moved bias, and run
        a full visual-inertial BA — the estimates sharpen in stages as the
        trajectory excites more directions."""
        if not self.imu_initialized:
            return
        # elapsed since the map's first keyframe (reference mFirstTs,
        # localmapping.cc:157/173: "t - mFirstTs")
        elapsed = self.kf_time[-1] - self.kf_time[0]
        if self._imu_stage == 1 and elapsed > 5.0:
            next_stage = 2
            prior_g, prior_a = 1.0, 1e5      # VIBA1 (localmapping.cc:169)
        elif self._imu_stage == 2 and elapsed > 15.0:
            next_stage = 3
            prior_g, prior_a = 1e-3, 1e-3    # VIBA2 (localmapping.cc:180:
            # 0,0 — kept epsilon-regularized for the fp32 normal equations)
        else:
            return
        if self._inertial_estimate_apply(refine=True, prior_g=prior_g,
                                         prior_a=prior_a):
            self._full_vi_ba()
        # advance even on a rejected refine — the windowed VI-BA keeps
        # improving the estimates; re-trying every keyframe would pay the
        # full-history solve repeatedly for nothing
        self._imu_stage = next_stage
        self._reset_prior()

    def _full_vi_ba(self):
        """Full-history visual-inertial BA (reference FullInertialBA,
        optimizer.cc:364) — the VIBA1/VIBA2 polish passes."""
        n_kf = int(self.map.n_kf)
        if n_kf < 3:
            return
        # pad the window to a multiple of 16 so repeated stages reuse
        # compiled shapes
        W = -(-n_kf // 16) * 16
        ids = np.arange(n_kf, dtype=np.int32)
        self._vi_ba_over(ids, W, n_fixed=1, iters=12)

    def _reintegrate_all(self, bias: ImuBias) -> None:
        for k in range(len(self.kf_pre)):
            if self.kf_raw[k] is not None:
                self.kf_pre[k] = preintegrate_host(
                    *self.kf_raw[k], bias, self.calib)

    def _apply_scaled_rotation(self, s: float, R_wg) -> None:
        """Gauge transform of the whole map: x' = s * R_gw * x.

        Reference: Map::ApplyScaledRotation (map.cc:230). Poses transform as
        R_cw' = R_cw R_wg, t_cw' = s t_cw; velocities v' = s R_gw v.
        """
        m = self.map
        R_wg = jnp.asarray(np.asarray(R_wg), jnp.float32)
        R_gw = R_wg.T
        kf_R = jnp.einsum("kij,jl->kil", m.kf_pose.R, R_wg)
        kf_t = s * m.kf_pose.t
        mp = s * jnp.einsum("ij,kj->ki", R_gw, m.mp_pos)
        # normals are WORLD vectors: they must follow the gauge rotation or
        # the view-angle gate (cos > 0.5, Frame::isInFrustum) rejects every
        # point after a large R_wg and tracking dies with 0 matches at IMU
        # init (reference: ApplyScaledRotation is followed by
        # UpdateNormalAndDepth recomputing them, map.cc:230+)
        nrm = jnp.einsum("ij,kj->ki", R_gw, m.mp_normal)
        self.map = m._replace(
            kf_pose=lie.SE3(kf_R, kf_t),
            mp_pos=jnp.where(m.mp_valid[:, None], mp, m.mp_pos),
            mp_normal=jnp.where(m.mp_valid[:, None], nrm, m.mp_normal),
            mp_min_dist=m.mp_min_dist * s,
            mp_max_dist=jnp.where(m.mp_max_dist < 1e8,
                                  m.mp_max_dist * s, m.mp_max_dist),
        )
        self.cur_pose = lie.SE3(self.map.kf_pose.R[self.last_kf_id],
                                self.map.kf_pose.t[self.last_kf_id])
        self.velocity = lie.se3_identity()
        self._reset_prior()

    # -- local mapping -----------------------------------------------------

    def _local_ba(self):
        if not self.imu_initialized:
            super()._local_ba()
            return
        cfg = self.cfg
        n_kf = int(self.map.n_kf)
        W = cfg.ba_window + cfg.ba_fixed_ring
        start = max(0, n_kf - W)
        ids = np.arange(start, n_kf, dtype=np.int32)
        n_fixed = max(len(ids) - cfg.ba_window, min(2, len(ids) - 1))
        self._vi_ba_over(ids, W, n_fixed=n_fixed,
                         iters=cfg.ba_iters_first + cfg.ba_iters_second)

    def _vi_ba_over(self, ids: np.ndarray, Wpad: int, n_fixed: int,
                    iters: int):
        """Windowed/full visual-inertial BA over keyframe rows `ids`
        (reference LocalInertialBA / FullInertialBA, optimizer.cc:2329/364),
        padded to `Wpad` rows so repeated calls reuse compiled programs."""
        # a background visual LBA in flight solved the same window rows:
        # adopt it first so its later write-back can't clobber this solve
        self._lba_drain()
        # a pending GBA snapshot would likewise scatter pre-VI-BA values
        # over rows this solve is about to refine — drop it (rare, cheap)
        if self.loop_closer is not None:
            self.loop_closer.pending_gba = None
        cfg = self.cfg
        n_kf = int(self.map.n_kf)
        start = int(ids[0])
        n_in = len(ids)
        window = np.full(Wpad, -1, np.int32)
        window[:n_in] = ids
        window_j = jnp.asarray(window)

        kf_idx, mp_idx, uv, octv, valid = ms.observation_triples(
            self.map, window_j)
        inv_s2 = extractor.inv_scale_sigma2(cfg.orb)[
            jnp.clip(octv, 0, cfg.orb.num_levels - 1)]
        poses = lie.SE3(self.map.kf_pose.R[np.clip(window, 0, None)],
                        self.map.kf_pose.t[np.clip(window, 0, None)])

        fixed_pose = np.zeros(Wpad, bool)
        fixed_pose[:n_fixed] = True
        fixed_pose |= (window < 0)
        fixed_in = fixed_pose.copy()

        stereo_kwargs = {}
        if hasattr(self, "kf_uright"):
            ur = self.kf_uright[np.clip(window, 0, None)].reshape(-1)
            stereo_kwargs = dict(u_right=ur,
                                 stereo_mask=valid & (ur > 0),
                                 bf=self.bf)
        prob = ba.make_problem(
            poses, self.map.mp_pos, kf_idx, mp_idx, uv, inv_s2, valid,
            jnp.asarray(fixed_pose), self.cam_params,
            fixed_point=~self.map.mp_valid, max_obs=Wpad, **stereo_kwargs)

        ifac = self._inertial_factor_batch(start, n_kf, pad_to=Wpad - 1)
        if ifac is None:
            super()._local_ba()
            return

        state = VIState(
            poses=poses,
            vel=jnp.asarray(np.stack(
                [self.kf_vel[k] if 0 <= k < n_kf else np.zeros(3)
                 for k in window]), jnp.float32),
            bg=jnp.asarray(np.stack(
                [np.asarray(self.kf_bias[k].gyro) if 0 <= k < n_kf
                 else np.zeros(3) for k in window]), jnp.float32),
            ba=jnp.asarray(np.stack(
                [np.asarray(self.kf_bias[k].acc) if 0 <= k < n_kf
                 else np.zeros(3) for k in window]), jnp.float32),
        )
        new_state, new_points, costs = visual_inertial_ba(
            state, prob, ifac, self.calib,
            fixed_pose=jnp.asarray(fixed_pose),
            fixed_inertial=jnp.asarray(fixed_in),
            cam_model=cfg.cam_model,
            iters=iters)

        ids_j = jnp.asarray(ids)
        self.map = self.map._replace(
            kf_pose=lie.SE3(
                self.map.kf_pose.R.at[ids_j].set(new_state.poses.R[:n_in]),
                self.map.kf_pose.t.at[ids_j].set(new_state.poses.t[:n_in]),
            ),
            mp_pos=jnp.where(self.map.mp_valid[:, None], new_points,
                             self.map.mp_pos),
        )
        for slot, k in enumerate(ids):
            self.kf_vel[k] = np.asarray(new_state.vel[slot])
            self.kf_bias[k] = ImuBias(new_state.bg[slot],
                                      new_state.ba[slot])
        self.bias = self.kf_bias[n_kf - 1]
        self.cur_vel = jnp.asarray(self.kf_vel[n_kf - 1])
        if self.last_kf_id >= 0:
            self.cur_pose = lie.SE3(self.map.kf_pose.R[self.last_kf_id],
                                    self.map.kf_pose.t[self.last_kf_id])


class VioTracker(InertialMixin, MonoTracker):
    """Monocular-inertial SLAM session (reference: IMU_MONOCULAR)."""

    _imu_optimize_scale = True

    def __init__(self, config: SlamConfig, calib: ImuCalib):
        MonoTracker.__init__(self, config)
        self._init_inertial(calib)


class StereoVioTracker(InertialMixin, StereoTracker):
    """Stereo-inertial SLAM session (reference: IMU_STEREO — the
    slam_euroc_si headline configuration). Visual scale is already metric,
    so the IMU init only estimates gravity direction, biases and
    velocities (reference: fixed-scale InertialOptimization overload)."""

    _imu_optimize_scale = False

    def __init__(self, config: SlamConfig, baseline: float,
                 calib: ImuCalib):
        StereoTracker.__init__(self, config, baseline)
        self._init_inertial(calib)

    def process_stereo_imu(self, featsL, featsR, timestamp, acc, gyro,
                           meas_t, images=None):
        """Stereo pair + IMU batch (reference System::TrackStereo with
        vImuMeas, system.cc:259)."""
        from ..frontend.stereo import stereo_match, subpixel_refine
        u_right, has_stereo = stereo_match(featsL, featsR)
        if images is not None:
            u_right, has_stereo = subpixel_refine(
                images[0], images[1], featsL.uv, u_right, has_stereo)
        self._cur_uright = u_right
        self._cur_has_stereo = has_stereo
        return self.process_frame_imu(featsL, timestamp, acc, gyro, meas_t)

    def _process_visual(self, feats, timestamp) -> FrameRecord:
        if self.state in (TrackState.NO_IMAGES, TrackState.NOT_INITIALIZED):
            rec = self._stereo_initialize(feats, timestamp)
            self.frame_id += 1
            self._append_record(rec)
            return rec
        return self.process_features(feats, timestamp)


class FisheyeStereoVioTracker(InertialMixin, FisheyeStereoTracker):
    """Stereo-inertial fisheye session (TUM-VI style KB8 rig + IMU).

    The fisheye left-right association (lapping-area Hamming match + ray
    triangulation, frontend/stereo.py) supplies metric depth; scale is
    observable visually, so like the rectified stereo-inertial mode the IMU
    init holds scale fixed (reference: fixed-scale InertialOptimization)."""

    _imu_optimize_scale = False

    def __init__(self, config: SlamConfig, cam2_params, T_c1_c2,
                 calib: ImuCalib, lapping1=None, lapping2=None):
        FisheyeStereoTracker.__init__(self, config, cam2_params, T_c1_c2,
                                      lapping1, lapping2)
        self._init_inertial(calib)

    def process_stereo_imu(self, featsL, featsR, timestamp, acc, gyro,
                           meas_t):
        from ..frontend.stereo import fisheye_stereo_match
        depth, has = fisheye_stereo_match(
            featsL, featsR, self.cam_params, self.cam2_params,
            self.R21, self.t21, self.lap1, self.lap2)
        self._cur_uright = jnp.where(
            has, featsL.uv[:, 0] - self.bf / jnp.maximum(depth, 1e-6), -1.0)
        self._cur_has_stereo = has & featsL.valid
        return self.process_frame_imu(featsL, timestamp, acc, gyro, meas_t)
