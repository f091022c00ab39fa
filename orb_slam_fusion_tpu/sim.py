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


def make_corridor_world(
    n_frames: int = 120,
    n_points: int = 4000,
    seed: int = 0,
    fps: float = 20.0,
    motion: str = "arc",
) -> SyntheticWorld:
    """Points in a corridor volume; camera advances with gentle yaw/sway."""
    rng = np.random.RandomState(seed)
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
    return SyntheticWorld(pts, desc, poses, timestamps)


def world_from_trajectory(
    positions: np.ndarray,
    n_points: int = 6000,
    seed: int = 0,
    timestamps: Optional[np.ndarray] = None,
    point_margin: float = 3.0,
) -> SyntheticWorld:
    """Build a synthetic world around an externally supplied trajectory
    (e.g. a EuRoC ground-truth path): points fill the bounding volume with a
    margin; camera looks along the direction of travel."""
    rng = np.random.RandomState(seed)
    positions = np.asarray(positions, np.float64)
    T = len(positions)
    lo = positions.min(axis=0) - point_margin
    hi = positions.max(axis=0) + point_margin
    pts = rng.uniform(lo, hi, size=(n_points, 3)).astype(np.float32)
    desc = rng.randint(0, 2 ** 32, size=(n_points, 8),
                       dtype=np.uint64).astype(np.uint32)

    # camera orientation: z-axis along smoothed velocity, x right, y down
    vel = np.gradient(positions, axis=0)
    # smooth velocities
    k = np.ones(7) / 7.0
    vel = np.stack([np.convolve(vel[:, i], k, mode="same")
                    for i in range(3)], axis=1)
    Rs, ts = [], []
    up = np.array([0.0, 0.0, 1.0])
    for i in range(T):
        z = vel[i]
        nz = np.linalg.norm(z)
        z = z / nz if nz > 1e-6 else np.array([1.0, 0.0, 0.0])
        x = np.cross(z, up)
        nx = np.linalg.norm(x)
        x = x / nx if nx > 1e-6 else np.array([0.0, 1.0, 0.0])
        y = np.cross(z, x)
        R_wc = np.stack([x, y, z], axis=1)  # columns = camera axes in world
        R_cw = R_wc.T
        t_cw = -R_cw @ positions[i]
        Rs.append(R_cw)
        ts.append(t_cw)
    poses = lie.SE3(jnp.asarray(np.stack(Rs), jnp.float32),
                    jnp.asarray(np.stack(ts), jnp.float32))
    if timestamps is None:
        timestamps = np.arange(T) / 20.0
    return SyntheticWorld(pts, desc, poses, np.asarray(timestamps))


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
) -> Features:
    """Observe the world from frame's GT pose -> fixed-capacity Features."""
    rng = np.random.RandomState(seed * 100003 + frame)
    h, w = image_size
    pose = lie.SE3(world.poses.R[frame], world.poses.t[frame])
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
    desc = world.descriptors[idx].copy()
    # random bit flips
    if desc_bit_flips > 0:
        for _ in range(desc_bit_flips):
            word = rng.randint(0, 8, n)
            bit = rng.randint(0, 32, n).astype(np.uint32)
            desc[np.arange(n), word] ^= (np.uint32(1) << bit)

    f_uv = np.zeros((n_features, 2), np.float32)
    f_desc = np.zeros((n_features, 8), np.uint32)
    f_val = np.zeros(n_features, bool)
    f_uv[:n] = uv_obs
    f_desc[:n] = desc
    f_val[:n] = True
    return Features(
        uv=jnp.asarray(f_uv),
        response=jnp.asarray(f_val, jnp.float32),
        octave=jnp.zeros(n_features, jnp.int32),
        angle=jnp.zeros(n_features, jnp.float32),
        desc=jnp.asarray(f_desc),
        valid=jnp.asarray(f_val),
    )


def gt_positions(world: SyntheticWorld) -> np.ndarray:
    """Ground-truth camera centers (T, 3) in world coords."""
    inv = lie.se3_inverse(world.poses)
    return np.asarray(inv.t)
