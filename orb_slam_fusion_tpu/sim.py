"""Synthetic world + sequence generator for integration testing and bench.

The reference's integration oracle is EuRoC imagery + ground truth
(tests/slam_euroc_si.cc, evaluation/Ground_truth). Image data is not
available in this environment, so the integration harness renders synthetic
feature observations from (a) procedurally generated trajectories, or (b)
the real EuRoC ground-truth trajectories (available in the reference repo)
— exercising the full geometric pipeline (matching, RANSAC init, pose LM,
triangulation, BA, loop closing) with a known-exact oracle.

Each world point carries a persistent random 256-bit descriptor; per-frame
observations add pixel noise and random bit flips, so data association has
realistic failure modes instead of being an oracle lookup.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import cameras, lie
from .frontend.extractor import Features


class SyntheticWorld(NamedTuple):
    points: np.ndarray        # (P, 3) world points
    descriptors: np.ndarray   # (P, 8) uint32
    poses: lie.SE3            # (T,) ground-truth Tcw per frame
    timestamps: np.ndarray    # (T,)
    # per-point canonical detection distance: the range at which the point's
    # corner fires at pyramid octave 0. Observed octave then follows the
    # distance ratio like a real multi-scale detector —
    # octave = round(log_1.2(ref_dist / dist)) — which exercises the
    # MapPoint scale-prediction machinery (PredictScale + octave gates).
    # None = legacy scale-free rendering (all octave 0).
    ref_dist: Optional[np.ndarray] = None
    # viewpoint-dependent appearance (exercises the distinctive-descriptor
    # refresh, reference MapPoint::ComputeDistinctiveDescriptors,
    # mappoint.h:139): (P, 4, 8) uint32 — one descriptor variant per
    # horizontal view QUADRANT of the point; a real BRIEF descriptor of a
    # 3D corner drifts with viewing direction, so a representative frozen
    # at triangulation time stops matching after the camera swings around
    # the structure. None = persistent descriptors (legacy).
    quad_desc: Optional[np.ndarray] = None


def make_quadrant_descriptors(desc: np.ndarray, rng: np.random.RandomState,
                              drift_bits: int = 80) -> np.ndarray:
    """(P, 8) base descriptors -> (P, 4, 8) per-view-quadrant variants.

    Quadrants differ by ~2*drift_bits*(1-drift_bits/256) bits — at the
    default 80 that is ~110, past TH_HIGH, so a descriptor frozen at
    creation time stops matching once the camera has swung a quadrant
    around the point, while observations from the same quadrant still
    match each other (4-8 bits apart).
    """
    P = desc.shape[0]
    out = np.empty((P, 4, 8), np.uint32)
    for q in range(4):
        mask = np.zeros((P, 256), bool)
        cols = rng.randint(0, 256, (P, drift_bits))
        mask[np.arange(P)[:, None], cols] = True
        words = np.packbits(mask.reshape(P, 8, 32),
                            axis=-1, bitorder='little')
        xor = words.view(np.uint32).reshape(P, 8)
        out[:, q] = desc ^ (xor if q else 0)
    return out


def _view_quadrant(view_dir: np.ndarray) -> np.ndarray:
    """(N, 3) point->camera directions -> (N,) quadrant index 0..3."""
    ang = np.arctan2(view_dir[:, 1], view_dir[:, 0])
    return ((ang + np.pi) / (np.pi / 2.0)).astype(np.int64) % 4


def _canonical_distances(pts: np.ndarray, cam_positions: np.ndarray,
                         rng: np.random.RandomState) -> np.ndarray:
    """ref_dist per point: its distance from the trajectory centroid pushed
    up by a random 0-3 octave margin, so a typical observation lands on a
    low-but-nonzero pyramid level and dollying in/out moves it."""
    centroid = np.asarray(cam_positions, np.float64).mean(axis=0)
    d = np.linalg.norm(pts - centroid[None, :], axis=1)
    return (d * 1.2 ** rng.uniform(0.0, 3.0, len(pts))).astype(np.float32)


def make_corridor_world(
    n_frames: int = 120,
    n_points: int = 4000,
    seed: int = 0,
    fps: float = 20.0,
    motion: str = "arc",
) -> SyntheticWorld:
    """Points in a corridor volume; camera advances with gentle yaw/sway."""
    rng = np.random.RandomState(seed)
    if motion == "circle":
        # points surround the whole orbit (radius 3 circle centered at
        # (0, 0, 3)) so every heading sees structure
        pts = np.stack([
            rng.uniform(-9.0, 9.0, n_points),
            rng.uniform(-2.5, 2.5, n_points),
            rng.uniform(-6.0, 12.0, n_points),
        ], axis=1).astype(np.float32)
    else:
        length = 3.0 + 0.25 * n_frames
        pts = np.stack([
            rng.uniform(-4.0, 4.0, n_points),
            rng.uniform(-2.5, 2.5, n_points),
            rng.uniform(0.0, length, n_points),
        ], axis=1).astype(np.float32)
    desc = rng.randint(0, 2 ** 32, size=(n_points, 8), dtype=np.uint64)
    desc = desc.astype(np.uint32)

    Rs, ts = [], []
    for k in range(n_frames):
        s = k / max(n_frames - 1, 1)
        if motion == "arc":
            # forward with sinusoidal sway + slow yaw
            pos_w = np.array([
                0.8 * np.sin(2.0 * np.pi * s),
                0.2 * np.sin(4.0 * np.pi * s),
                0.18 * k,
            ])
            yaw = 0.15 * np.sin(2.0 * np.pi * s)
            pitch = 0.05 * np.sin(4.0 * np.pi * s)
            w = np.array([pitch, yaw, 0.0], np.float32)
        elif motion == "circle":
            # closed loop: camera orbits a circle (radius ~ corridor width),
            # heading tangentially — frame 0 and frame n-1 see the same
            # scene, which exercises loop closing.
            ang = 2.0 * np.pi * s
            r_c = 3.0
            pos_w = np.array([r_c * np.sin(ang), 0.0, r_c * (1 - np.cos(ang))])
            # camera forward (+z, = [sin yaw, 0, cos yaw] in world) follows
            # the tangent [cos ang, 0, sin ang] => yaw = pi/2 - ang
            w = np.array([0.0, np.pi / 2 - ang, 0.0], np.float32)
        else:  # straight
            pos_w = np.array([0.0, 0.0, 0.18 * k])
            w = np.zeros(3, np.float32)
        R_wc = np.asarray(lie.so3_exp(jnp.asarray(w)))
        # Tcw: x_c = R_cw (x_w - C) with R_cw = R_wc^T
        R_cw = R_wc.T
        t_cw = -R_cw @ pos_w
        Rs.append(R_cw)
        ts.append(t_cw)
    poses = lie.SE3(jnp.asarray(np.stack(Rs), jnp.float32),
                    jnp.asarray(np.stack(ts), jnp.float32))
    timestamps = np.arange(n_frames) / fps
    cam_pos = np.stack([-R.T @ t for R, t in zip(Rs, ts)])
    return SyntheticWorld(pts, desc, poses, timestamps,
                          _canonical_distances(pts, cam_pos, rng))


def quat_to_mat(qv):
    """wxyz quaternion -> rotation matrix (R_wb for GT body quats)."""
    w, x, y, z = qv
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def world_from_trajectory(
    positions: np.ndarray,
    n_points: int = 6000,
    seed: int = 0,
    timestamps: Optional[np.ndarray] = None,
    point_margin: float = 3.0,
    quats_wxyz: Optional[np.ndarray] = None,
) -> SyntheticWorld:
    """Build a synthetic world around an externally supplied trajectory
    (e.g. a EuRoC ground-truth path): points fill the bounding volume with a
    margin. With `quats_wxyz` (T, 4) the camera carries the REAL recorded
    orientations (R_wc per frame); otherwise it looks along the direction
    of travel with a rate-limited synthetic heading. Prefer real quats
    when available: the synthetic heading can sit at its rate clamp for
    seconds at a time (57 deg/s sustained), which no real MAV sequence
    does and which dominates tracking difficulty as a sim artifact."""
    rng = np.random.RandomState(seed)
    positions = np.asarray(positions, np.float64)
    T = len(positions)
    lo = positions.min(axis=0) - point_margin
    hi = positions.max(axis=0) + point_margin
    pts = rng.uniform(lo, hi, size=(n_points, 3)).astype(np.float32)
    desc = rng.randint(0, 2 ** 32, size=(n_points, 8),
                       dtype=np.uint64).astype(np.uint32)

    if quats_wxyz is not None:
        Rs, ts = [], []
        for i in range(T):
            R_cw = quat_to_mat(np.asarray(quats_wxyz[i], np.float64)).T
            Rs.append(R_cw)
            ts.append(-R_cw @ positions[i])
        poses = lie.SE3(jnp.asarray(np.stack(Rs), jnp.float32),
                        jnp.asarray(np.stack(ts), jnp.float32))
        if timestamps is None:
            timestamps = np.arange(T) / 20.0
        return SyntheticWorld(pts, desc, poses, np.asarray(timestamps),
                              _canonical_distances(pts, positions, rng))

    # camera orientation: z-axis along smoothed velocity, x right, y down.
    # Real trajectories (e.g. EuRoC MH01) start stationary — there the
    # velocity direction is pure noise, so below a speed threshold the
    # camera HOLDS its previous heading (a hovering MAV doesn't spin).
    vel = np.gradient(positions, axis=0)
    k = np.ones(15) / 15.0
    vel = np.stack([np.convolve(vel[:, i], k, mode="same")
                    for i in range(3)], axis=1)
    speeds = np.linalg.norm(vel, axis=1)
    speed_th = max(1e-6, 0.2 * np.median(speeds[speeds > 1e-9])
                   if np.any(speeds > 1e-9) else 1e-6)
    # first confident direction seeds the stationary prefix
    good = np.nonzero(speeds > speed_th)[0]
    z_prev = (vel[good[0]] / speeds[good[0]]) if len(good) else \
        np.array([1.0, 0.0, 0.0])
    # continuous orientation: start from an up-consistent frame, then
    # rotate minimally so the camera z-axis follows the (smoothed, rate-
    # limited) heading — no gimbal flip when the heading passes vertical.
    up = np.array([0.0, 0.0, 1.0])
    x0 = np.cross(z_prev, up)
    if np.linalg.norm(x0) < 1e-6:
        x0 = np.array([0.0, 1.0, 0.0])
    x0 = x0 / np.linalg.norm(x0)
    R_wc = np.stack([x0, np.cross(z_prev, x0), z_prev], axis=1)
    max_step = 0.05  # rad per frame — MAVs don't snap their heading
    Rs, ts = [], []
    for i in range(T):
        if speeds[i] > speed_th:
            z_new = vel[i] / speeds[i]
            z_cur = R_wc[:, 2]
            axis = np.cross(z_cur, z_new)
            na = np.linalg.norm(axis)
            ang = float(np.arctan2(na, np.clip(z_cur @ z_new, -1, 1)))
            if na > 1e-9 and ang > 1e-6:
                step = min(ang, max_step)
                w = axis / na * step
                R_step = np.asarray(lie.so3_exp(jnp.asarray(
                    w.astype(np.float32))))
                R_wc = R_step @ R_wc
        R_cw = R_wc.T
        Rs.append(R_cw.copy())
        ts.append(-R_cw @ positions[i])
    poses = lie.SE3(jnp.asarray(np.stack(Rs), jnp.float32),
                    jnp.asarray(np.stack(ts), jnp.float32))
    if timestamps is None:
        timestamps = np.arange(T) / 20.0
    return SyntheticWorld(pts, desc, poses, np.asarray(timestamps),
                          _canonical_distances(pts, positions, rng))


def render_frame(
    world: SyntheticWorld,
    frame: int,
    cam_params: jnp.ndarray,
    image_size: Tuple[int, int],
    n_features: int,
    pixel_noise: float = 0.4,
    desc_bit_flips: int = 4,
    dropout: float = 0.1,
    seed: int = 0,
    cam_model: str = cameras.PINHOLE,
    pose_override: Optional[lie.SE3] = None,
) -> Features:
    """Observe the world from frame's GT pose -> fixed-capacity Features."""
    rng = np.random.RandomState(seed * 100003 + frame)
    h, w = image_size
    pose = pose_override if pose_override is not None else \
        lie.SE3(world.poses.R[frame], world.poses.t[frame])
    pc = np.asarray(lie.se3_apply(pose, jnp.asarray(world.points)))
    uv = np.asarray(cameras.project(cam_model, cam_params, jnp.asarray(pc)))
    vis = (pc[:, 2] > 0.3) & (pc[:, 2] < 40.0) \
        & (uv[:, 0] >= 8) & (uv[:, 0] < w - 8) \
        & (uv[:, 1] >= 8) & (uv[:, 1] < h - 8)
    vis &= rng.rand(len(vis)) > dropout
    # Select by persistent per-point saliency (like a real detector re-firing
    # on the same strong corners every frame) so consecutive frames observe
    # mostly the same points — random subsets would give unrealistically low
    # frame-to-frame overlap.
    saliency_rng = np.random.RandomState(9177)
    saliency = saliency_rng.rand(len(world.points))
    idx = np.nonzero(vis)[0]
    idx = idx[np.argsort(-saliency[idx])][:n_features]
    # randomize row order (feature order in a real frame is arbitrary)
    rng.shuffle(idx)
    n = len(idx)

    uv_obs = uv[idx] + rng.randn(n, 2).astype(np.float32) * pixel_noise
    # multi-scale detection: octave from the distance ratio vs the point's
    # canonical range, with occasional +-1 level jitter (real pyramids fire
    # adjacent levels); clamped to the 8-level pyramid
    if world.ref_dist is not None:
        dist = np.linalg.norm(pc[idx], axis=1)
        octv = np.round(np.log(world.ref_dist[idx] /
                               np.maximum(dist, 1e-6)) / np.log(1.2))
        octv += (rng.rand(n) < 0.15) * rng.choice([-1, 1], n)
        octv = np.clip(octv, 0, 7).astype(np.int32)
    else:
        octv = np.zeros(n, np.int32)
    if world.quad_desc is not None:
        # viewpoint-dependent appearance: descriptor variant chosen by the
        # horizontal quadrant of the point->camera direction
        C = np.asarray(lie.se3_apply(lie.se3_inverse(pose), jnp.zeros(3)))
        vdir = C[None, :] - world.points[idx]
        quad = _view_quadrant(vdir)
        desc = world.quad_desc[idx, quad].copy()
    else:
        desc = world.descriptors[idx].copy()
    # random bit flips
    if desc_bit_flips > 0:
        for _ in range(desc_bit_flips):
            word = rng.randint(0, 8, n)
            bit = rng.randint(0, 32, n).astype(np.uint32)
            desc[np.arange(n), word] ^= (np.uint32(1) << bit)

    f_uv = np.zeros((n_features, 2), np.float32)
    f_desc = np.zeros((n_features, 8), np.uint32)
    f_oct = np.zeros(n_features, np.int32)
    f_val = np.zeros(n_features, bool)
    f_uv[:n] = uv_obs
    f_desc[:n] = desc
    f_oct[:n] = octv
    f_val[:n] = True
    return Features(
        uv=jnp.asarray(f_uv),
        response=jnp.asarray(f_val, jnp.float32),
        octave=jnp.asarray(f_oct),
        angle=jnp.zeros(n_features, jnp.float32),
        desc=jnp.asarray(f_desc),
        valid=jnp.asarray(f_val),
    )


def render_stereo_frame(world: SyntheticWorld, frame: int, cam_params,
                        image_size, n_features: int, baseline: float,
                        seed: int = 0, **kw):
    """Render a rectified stereo pair: right camera displaced by `baseline`
    along the left camera's x axis. Returns (featsL, featsR)."""
    pose_l = lie.SE3(world.poses.R[frame], world.poses.t[frame])
    # x_r = x_l - b  =>  T_rw = T_rl o T_lw with T_rl = (I, [-b,0,0])
    pose_r = lie.SE3(pose_l.R, pose_l.t + jnp.array([-baseline, 0.0, 0.0]))
    fL = render_frame(world, frame, cam_params, image_size, n_features,
                      seed=seed, **kw)
    fR = render_frame(world, frame, cam_params, image_size, n_features,
                      seed=seed + 1, pose_override=pose_r, **kw)
    return fL, fR


class VioSequence(NamedTuple):
    world: SyntheticWorld          # points/descriptors/frame poses (camera)
    frame_imu: list                # per frame: (acc (N,3), gyro (N,3), t (N,))
    vel: np.ndarray                # (T,3) GT body velocity in world
    gravity: np.ndarray            # (3,)
    gyro_bias_true: np.ndarray = np.zeros(3)   # injected sensor biases
    acc_bias_true: np.ndarray = np.zeros(3)


def make_vio_sequence(
    n_frames: int = 120,
    fps: float = 20.0,
    imu_rate: float = 200.0,
    n_points: int = 5000,
    seed: int = 0,
    gyro_noise: float = 0.0,
    acc_noise: float = 0.0,
    gyro_bias: float = 0.0,
    acc_bias: float = 0.0,
) -> VioSequence:
    """Monocular-inertial synthetic sequence with exactly consistent IMU.

    Body accelerations/rates are sampled at IMU rate and Euler-integrated
    (same discretization as the preintegrator) to produce the frame poses,
    so preintegration residuals at ground truth are ~machine precision.
    Camera frame = body frame (Tbc = I); world z is up-negated gravity.
    """
    rng = np.random.RandomState(seed)
    g_w = np.array([0.0, 0.0, -9.81])
    dt = 1.0 / imu_rate
    n_imu = int(round(imu_rate / fps))
    total = n_frames * n_imu

    # analytic body-rate / world-acceleration profiles (gentle flight)
    tt = np.arange(total) * dt
    T_total = n_frames / fps
    a_w = np.stack([
        0.6 * np.sin(2 * np.pi * tt / T_total * 2.0),
        0.4 * np.sin(2 * np.pi * tt / T_total * 3.0 + 1.0),
        0.3 * np.sin(2 * np.pi * tt / T_total * 1.5 + 2.0),
    ], axis=1)
    w_b = np.stack([
        0.10 * np.sin(2 * np.pi * tt / T_total * 1.0),
        0.25 * np.sin(2 * np.pi * tt / T_total * 0.5),
        0.05 * np.sin(2 * np.pi * tt / T_total * 2.0 + 0.7),
    ], axis=1)

    bg = rng.randn(3) * gyro_bias
    ba_ = rng.randn(3) * acc_bias

    R = np.eye(3)
    p = np.zeros(3)
    v = np.array([0.25, 0.05, 0.6])   # initial velocity (forward = +z-ish)
    Rs, ts, vels = [], [], []
    accs = np.zeros((total, 3))
    gyros = np.zeros((total, 3))
    for k in range(total):
        if k % n_imu == 0:
            Rs.append(R.T.copy())            # R_cw = R_wb^T (cam = body)
            ts.append((-R.T @ p).copy())
            vels.append(v.copy())
        accs[k] = R.T @ (a_w[k] - g_w) + ba_ \
            + rng.randn(3) * acc_noise
        gyros[k] = w_b[k] + bg + rng.randn(3) * gyro_noise
        p = p + v * dt + 0.5 * a_w[k] * dt * dt
        v = v + a_w[k] * dt
        Rtmp = np.asarray(lie.so3_exp(jnp.asarray(w_b[k] * dt)))
        R = R @ Rtmp

    poses = lie.SE3(jnp.asarray(np.stack(Rs), jnp.float32),
                    jnp.asarray(np.stack(ts), jnp.float32))
    timestamps = np.arange(n_frames) / fps

    # world points around the traversed volume
    centers = -np.einsum("kji,kj->ki", np.stack(Rs), np.stack(ts))
    lo = centers.min(axis=0) - 4.0
    hi = centers.max(axis=0) + 4.0
    hi[2] = max(hi[2], lo[2] + 12.0)
    pts = rng.uniform(lo, hi, size=(n_points, 3)).astype(np.float32)
    desc = rng.randint(0, 2 ** 32, size=(n_points, 8),
                       dtype=np.uint64).astype(np.uint32)
    world = SyntheticWorld(pts, desc, poses, timestamps,
                           _canonical_distances(pts, centers, rng))

    frame_imu = []
    for f in range(n_frames):
        sl = slice(f * n_imu, (f + 1) * n_imu)
        t_meas = tt[sl] + dt  # measurement timestamps (end of each step)
        frame_imu.append((accs[sl].astype(np.float32),
                          gyros[sl].astype(np.float32),
                          t_meas.astype(np.float64)))
    return VioSequence(world=world, frame_imu=frame_imu,
                       vel=np.stack(vels), gravity=g_w,
                       gyro_bias_true=bg, acc_bias_true=ba_)


def with_viewdep_descriptors(world: SyntheticWorld, seed: int = 0,
                             drift_bits: int = 80) -> SyntheticWorld:
    """Equip a world with viewpoint-dependent (per-view-quadrant)
    descriptors — see SyntheticWorld.quad_desc."""
    rng = np.random.RandomState(seed ^ 0x5EED)
    return world._replace(quad_desc=make_quadrant_descriptors(
        world.descriptors, rng, drift_bits))


def gt_positions(world: SyntheticWorld) -> np.ndarray:
    """Ground-truth camera centers (T, 3) in world coords."""
    inv = lie.se3_inverse(world.poses)
    return np.asarray(inv.t)


def render_fisheye_stereo_frame(world: SyntheticWorld, frame: int,
                                cam1, cam2, image_size, n_features: int,
                                T_c1_c2, seed: int = 0, **kw):
    """Render a NON-rectified fisheye stereo pair (two KB8 cameras related
    by the full rig extrinsics T_c1_c2). Returns (featsL, featsR)."""
    T12 = jnp.asarray(T_c1_c2, jnp.float32)
    T21_R = T12[:3, :3].T
    T21_t = -T21_R @ T12[:3, 3]
    pose_l = lie.SE3(world.poses.R[frame], world.poses.t[frame])
    pose_r = lie.se3_compose(lie.SE3(T21_R, T21_t), pose_l)
    fL = render_frame(world, frame, jnp.asarray(cam1), image_size,
                      n_features, seed=seed,
                      cam_model=cameras.KANNALA_BRANDT8, **kw)
    fR = render_frame(world, frame, jnp.asarray(cam2), image_size,
                      n_features, seed=seed + 1, pose_override=pose_r,
                      cam_model=cameras.KANNALA_BRANDT8, **kw)
    return fL, fR


def vio_from_gt_trajectory(
    positions: np.ndarray,        # (T, 3) at frame rate (e.g. EuRoC GT 20 Hz)
    quats_wxyz: np.ndarray,       # (T, 4) body orientation R_wb as wxyz
    timestamps: np.ndarray,       # (T,) seconds
    imu_rate: float = 200.0,
    n_points: int = 8000,
    seed: int = 0,
    gyro_noise: float = 0.0,
    acc_noise: float = 0.0,
    gyro_bias: float = 0.0,
    acc_bias: float = 0.0,
    point_margin: float = 3.0,
) -> VioSequence:
    """Inertial sequence along a REAL ground-truth trajectory (e.g. the
    EuRoC GT files shipped with the reference).

    The 20 Hz GT is upsampled to IMU rate (cubic positions, slerp
    orientations), then IMU measurements are synthesized EXACTLY consistent
    with the preintegrator's Euler discretization: a_k solves
    p_{k+1} = p_k + v_k dt + a_k dt^2/2 and w_k solves
    R_{k+1} = R_k exp(w_k dt), so preintegration residuals vanish at ground
    truth regardless of GT jitter. Camera frame = body frame (Tbc = I);
    world gravity is -9.81 z (EuRoC GT frames are ~z-up).
    """
    from scipy.interpolate import CubicSpline

    rng = np.random.RandomState(seed)
    g_w = np.array([0.0, 0.0, -9.81])
    t = np.asarray(timestamps, np.float64)
    t = t - t[0]
    fps = (len(t) - 1) / max(t[-1], 1e-9)
    n_imu = int(round(imu_rate / fps))
    dt = (t[-1] - t[0]) / ((len(t) - 1) * n_imu)
    n_frames = len(t)
    total = (n_frames - 1) * n_imu + 1
    tt = np.arange(total) * dt

    p_spline = CubicSpline(t, np.asarray(positions, np.float64), axis=0)
    p_hi = p_spline(tt)

    # slerp quaternions segment by segment (hemisphere-aligned)
    q = np.asarray(quats_wxyz, np.float64)
    for k in range(1, len(q)):
        if np.dot(q[k], q[k - 1]) < 0:
            q[k] = -q[k]
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    idx = np.clip(np.searchsorted(t, tt, side="right") - 1, 0, n_frames - 2)
    u = (tt - t[idx]) / np.maximum(t[idx + 1] - t[idx], 1e-9)
    q0, q1 = q[idx], q[idx + 1]
    dotq = np.clip(np.sum(q0 * q1, axis=1, keepdims=True), -1.0, 1.0)
    ang = np.arccos(dotq)
    small = ang[:, 0] < 1e-6
    w0 = np.where(small[:, None], 1 - u[:, None],
                  np.sin((1 - u[:, None]) * ang) / np.maximum(np.sin(ang),
                                                              1e-12))
    w1 = np.where(small[:, None], u[:, None],
                  np.sin(u[:, None] * ang) / np.maximum(np.sin(ang), 1e-12))
    q_hi = q0 * w0 + q1 * w1
    q_hi /= np.linalg.norm(q_hi, axis=1, keepdims=True)

    R_hi = np.stack([quat_to_mat(qv) for qv in q_hi])   # R_wb

    # exactly integrator-consistent IMU synthesis (+ injected sensor biases)
    bg = rng.randn(3) * gyro_bias
    ba_ = rng.randn(3) * acc_bias
    v = (p_hi[1] - p_hi[0]) / dt
    accs = np.zeros((total - 1, 3))
    gyros = np.zeros((total - 1, 3))
    vels_frame = []
    Rs_cw, ts_cw = [], []
    for k in range(total - 1):
        if k % n_imu == 0:
            Rs_cw.append(R_hi[k].T)
            ts_cw.append(-R_hi[k].T @ p_hi[k])
            vels_frame.append(v.copy())
        a_w = 2.0 * (p_hi[k + 1] - p_hi[k] - v * dt) / (dt * dt)
        dR = R_hi[k].T @ R_hi[k + 1]
        w_b = np.asarray(lie.so3_log(jnp.asarray(dR))) / dt
        accs[k] = R_hi[k].T @ (a_w - g_w) + ba_ + rng.randn(3) * acc_noise
        gyros[k] = w_b + bg + rng.randn(3) * gyro_noise
        v = v + a_w * dt
    # final frame pose
    Rs_cw.append(R_hi[-1].T)
    ts_cw.append(-R_hi[-1].T @ p_hi[-1])
    vels_frame.append(v.copy())

    poses = lie.SE3(jnp.asarray(np.stack(Rs_cw), jnp.float32),
                    jnp.asarray(np.stack(ts_cw), jnp.float32))
    lo = p_hi.min(axis=0) - point_margin
    hi = p_hi.max(axis=0) + point_margin
    pts = rng.uniform(lo, hi, size=(n_points, 3)).astype(np.float32)
    desc = rng.randint(0, 2 ** 32, size=(n_points, 8),
                       dtype=np.uint64).astype(np.uint32)
    world = SyntheticWorld(pts, desc, poses,
                           (t[: n_frames]).astype(np.float64),
                           _canonical_distances(pts, p_hi[::n_imu], rng))

    # frame_imu[f] covers (t[f], t[f+1]] — same convention as
    # make_vio_sequence (drivers feed frame_imu[k-1] with frame k)
    frame_imu = []
    for f in range(n_frames):
        sl = slice(f * n_imu, min((f + 1) * n_imu, total - 1))
        t_meas = tt[sl.start:sl.stop] + dt
        frame_imu.append((accs[sl].astype(np.float32),
                          gyros[sl].astype(np.float32),
                          t_meas.astype(np.float64)))
    return VioSequence(world=world, frame_imu=frame_imu,
                       vel=np.stack(vels_frame),
                       gravity=g_w, gyro_bias_true=bg, acc_bias_true=ba_)


# ---------------------------------------------------------------------------
# Image rendering (pixels-to-pose path)
# ---------------------------------------------------------------------------


def _landmark_textures(n_points: int, seed: int = 4242,
                       cells: int = 6) -> np.ndarray:
    """Persistent per-landmark texture patches: (P, cells, cells) in [0,1].

    Three properties matter for the pixels-in protocol:
    * blocky high-contrast cells -> strong FAST corners on every landmark;
    * a persistent per-landmark AMPLITUDE -> the per-cell top-K selection
      ranks the same landmarks above their neighbours every frame (equal-
      contrast textures made the response ranking pure noise: measured 47
      common landmarks between consecutive frames' 500-feature sets);
    * a dominant directional ramp -> the IC-angle intensity centroid
      points the same way every frame, so the rotated BRIEF pattern
      samples the same pixels (near-symmetric blobs gave orientation
      noise and a 95-bit median Hamming distance between re-detections).
    """
    rng = np.random.RandomState(seed)
    tex = (rng.rand(n_points, cells, cells) > 0.5).astype(np.float32)
    # dominant orientation: linear ramp in a persistent random direction
    ang = rng.rand(n_points, 1, 1) * 2 * np.pi
    yy, xx = np.mgrid[0:cells, 0:cells].astype(np.float32)
    yy = (yy / (cells - 1) - 0.5)[None]
    xx = (xx / (cells - 1) - 0.5)[None]
    ramp = xx * np.cos(ang) + yy * np.sin(ang) + 0.5
    tex = 0.45 * tex + 0.55 * np.clip(ramp, 0, 1)
    # persistent amplitude in [0.45, 1]: stable selection ranking
    amp = 0.45 + 0.55 * rng.rand(n_points, 1, 1)
    return (tex * amp).astype(np.float32)


def render_image(
    world: SyntheticWorld,
    frame: int,
    cam_params: jnp.ndarray,
    image_size: Tuple[int, int],
    seed: int = 0,
    cam_model: str = cameras.PINHOLE,
    pose_override: Optional[lie.SE3] = None,
    bg_noise: float = 3.0,
    base_px: float = 18.0,
    max_points: int = 1500,
    center_marker: bool = False,
    _tex_cache: dict = {},
) -> np.ndarray:
    """Render a (H, W) float32 grayscale image of the world from frame's
    GT pose: every visible landmark is splatted as its persistent random
    texture patch, sized by the distance ratio against the landmark's
    canonical range (so apparent scale tracks 1/depth and the pyramid's
    octave prediction is exercised for real).

    This is the pixels-in protocol: the ORB front-end
    (frontend.extractor.extract_features — the reference consumes images,
    tracking.cc:948-1092) runs on these images and the SLAM engine never
    sees ground-truth feature observations. Feature repeatability, octave
    distribution and subpixel noise are whatever the real extractor
    produces.
    """
    rng = np.random.RandomState(seed * 70001 + frame)
    h, w = image_size
    pose = pose_override if pose_override is not None else \
        lie.SE3(world.poses.R[frame], world.poses.t[frame])
    pc = np.asarray(lie.se3_apply(pose, jnp.asarray(world.points)))
    uv = np.asarray(cameras.project(cam_model, cam_params, jnp.asarray(pc)))
    vis = (pc[:, 2] > 0.3) & (pc[:, 2] < 40.0) \
        & (uv[:, 0] >= 4) & (uv[:, 0] < w - 4) \
        & (uv[:, 1] >= 4) & (uv[:, 1] < h - 4)
    idx = np.nonzero(vis)[0]
    if len(idx) > max_points:
        # persistent saliency order (same rule as render_frame): the
        # strongest corners fire every frame
        saliency = np.random.RandomState(9177).rand(len(world.points))
        idx = idx[np.argsort(-saliency[idx])][:max_points]

    key = len(world.points)
    if key not in _tex_cache:
        _tex_cache[key] = _landmark_textures(len(world.points))
    tex = _tex_cache[key]

    img = rng.randn(h, w).astype(np.float32) * bg_noise + 64.0
    ref = (world.ref_dist if world.ref_dist is not None
           else np.full(len(world.points), 6.0, np.float32))
    dist = np.linalg.norm(pc[idx], axis=1)
    sizes = np.clip(base_px * ref[idx] / np.maximum(dist, 1e-6),
                    6, 64).astype(np.int32)
    # draw far (small) landmarks first so near ones overwrite them
    order = np.argsort(-dist)
    for i in order:
        p = idx[i]
        s = int(sizes[i])
        cu, cv = uv[p]
        u0 = int(round(cu)) - s // 2
        v0 = int(round(cv)) - s // 2
        u1, v1 = u0 + s, v0 + s
        cu0, cv0 = max(u0, 0), max(v0, 0)
        cu1, cv1 = min(u1, w), min(v1, h)
        if cu1 <= cu0 or cv1 <= cv0:
            continue
        # bilinear sample of the landmark's texture: appearance is
        # CONTINUOUS in scale, so a depth change re-renders the same
        # pattern larger/smaller (a nearest-neighbour upsample reshuffles
        # the BRIEF sampling points every time the patch size crosses a
        # cell boundary — measured 56 vs 300+ frame-to-frame matches)
        C = tex.shape[1]
        fy = (np.arange(cv0, cv1) - v0 + 0.5) / s * (C - 1)
        fx = (np.arange(cu0, cu1) - u0 + 0.5) / s * (C - 1)
        y0 = np.clip(fy.astype(np.int32), 0, C - 2)
        x0 = np.clip(fx.astype(np.int32), 0, C - 2)
        wy = (fy - y0)[:, None]
        wx = (fx - x0)[None, :]
        tp = tex[p]
        patch = (tp[np.ix_(y0, x0)] * (1 - wy) * (1 - wx)
                 + tp[np.ix_(y0 + 1, x0)] * wy * (1 - wx)
                 + tp[np.ix_(y0, x0 + 1)] * (1 - wy) * wx
                 + tp[np.ix_(y0 + 1, x0 + 1)] * wy * wx)
        img[cv0:cv1, cu0:cu1] = 64.0 + patch * 130.0
        # crisp checkerboard junction at the landmark's EXACT projected
        # position: the dominant, precisely-localizable corner every
        # frame (texture-cell intersections alone fire FAST at arbitrary
        # in-patch positions that shift with viewpoint)
        if not center_marker:
            continue
        # small, per-landmark-polarized: a large identical checker made
        # every landmark's descriptor alike (aliasing -> association
        # collapse at frame ~35); at 2-4 px the descriptor still samples
        # mostly the random texture around it
        cs = max(2, s // 10)
        hi, lo = (224.0, 32.0) if (p & 1) == 0 else (32.0, 224.0)
        ju0, jv0 = int(round(cu)) - cs, int(round(cv)) - cs
        for (qy, qx, val) in ((0, 0, hi), (0, 1, lo),
                              (1, 0, lo), (1, 1, hi)):
            a0 = max(jv0 + qy * cs, 0)
            a1 = min(jv0 + (qy + 1) * cs, h)
            b0 = max(ju0 + qx * cs, 0)
            b1 = min(ju0 + (qx + 1) * cs, w)
            if a1 > a0 and b1 > b0:
                img[a0:a1, b0:b1] = val
    return np.clip(img, 0.0, 255.0)
