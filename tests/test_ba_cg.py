"""Matrix-free PCG reduced-camera solve (solver/ba._lm_step_cg).

Round-2 verdict weak #5: the dense Schur assembly materializes (M, K, 6, 3)
intermediates and a dense (6K)^2 Cholesky — GBs per LM iteration at grown
capacities. The PCG path must (a) match the dense path's convergence on
problems both can solve, and (b) run full-map GBA at K=512 / M=32768 within
ordinary memory/time budgets.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam_fusion_tpu import lie
from orb_slam_fusion_tpu.solver import ba


def _window_problem(K, nf, M, seed=0, noise=0.05, spacing=0.1):
    """Consistent multi-view problem in the window-contiguous factor layout
    (kf_idx[f] == f // nf) that the PCG path requires."""
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-6, 6, (M, 3)).astype(np.float32) + [0, 0, 12]
    cam = jnp.array([400.0, 400.0, 376.0, 240.0])
    F = K * nf
    kf_idx = np.repeat(np.arange(K, dtype=np.int32), nf)
    Cs = np.stack([spacing * np.arange(K), 0.2 * spacing * np.arange(K),
                   0.4 * spacing * np.arange(K)], 1).astype(np.float32)
    ts = -Cs
    Rs = np.broadcast_to(np.eye(3, dtype=np.float32), (K, 3, 3)).copy()
    mp_idx = np.zeros(F, np.int32)
    uv = np.zeros((F, 2), np.float32)
    valid = np.zeros(F, bool)
    for k in range(K):
        pc = pts + ts[k]
        u = 400 * pc[:, 0] / pc[:, 2] + 376
        v = 400 * pc[:, 1] / pc[:, 2] + 240
        vis = (pc[:, 2] > 1) & (u > 0) & (u < 752) & (v > 0) & (v < 480)
        rows = np.nonzero(vis)[0]
        rng.shuffle(rows)
        rows = rows[:nf]
        sl = slice(k * nf, k * nf + len(rows))
        mp_idx[sl] = rows
        uv[sl] = np.stack([u[rows], v[rows]], 1) + rng.randn(len(rows), 2) * 0.4
        valid[sl] = True
    poses = lie.SE3(jnp.asarray(Rs),
                    jnp.asarray(ts + rng.randn(K, 3).astype(np.float32)
                                * noise))
    pts_n = jnp.asarray(pts + rng.randn(M, 3).astype(np.float32) * noise)
    fixed = np.zeros(K, bool)
    fixed[0] = True
    prob = ba.make_problem(
        poses, pts_n, kf_idx, mp_idx, uv, np.ones(F, np.float32), valid,
        jnp.asarray(fixed), cam, max_obs=min(K, 16))
    return prob


def test_cg_matches_dense_small():
    prob = _window_problem(K=16, nf=96, M=1024)
    inl = jnp.ones_like(prob.valid)
    c0 = float(ba.lm_cost(prob.poses, prob.points, inl, prob, "pinhole"))
    _, _, _, c_dense, _ = ba.lm_chunk(
        prob.poses, prob.points, jnp.float32(1e-4), jnp.float32(c0), inl,
        prob, "pinhole", 8, 5.991, True, 0)
    _, _, _, c_cg, _ = ba.lm_chunk(
        prob.poses, prob.points, jnp.float32(1e-4), jnp.float32(c0), inl,
        prob, "pinhole", 8, 5.991, True, 96)
    c_dense, c_cg = float(c_dense), float(c_cg)
    assert c_dense < 0.1 * c0
    # CG solves the same normal equations iteratively — must land within a
    # few percent of the exact reduced solve
    assert c_cg < 1.1 * c_dense + 1e-3


def test_cg_full_map_gba_grown_capacity():
    """The round-2 OOM shape: K=512 keyframes, M=32768 landmarks. The dense
    path would allocate ~2x1.2 GB (M,K,6,3) intermediates per iteration;
    the PCG path must complete a two-phase robust solve outright."""
    prob = _window_problem(K=512, nf=48, M=32768, spacing=0.05)
    lm = ba.ChunkedLM(prob, "pinhole", iters_first=2, iters_second=3,
                      chunk=2, pose_stride=48)
    c0 = float(lm.cost)
    while not lm.step():
        pass
    c1 = float(ba.lm_cost(lm.poses, lm.points, lm.inlier, prob, "pinhole"))
    assert np.isfinite(c1)
    assert c1 < 0.2 * c0
    assert bool(jnp.all(jnp.isfinite(lm.poses.t)))
    assert bool(jnp.all(jnp.isfinite(lm.points)))


def test_cg_respects_fixed_poses():
    prob = _window_problem(K=16, nf=96, M=1024)
    inl = jnp.ones_like(prob.valid)
    c0 = float(ba.lm_cost(prob.poses, prob.points, inl, prob, "pinhole"))
    p, x, _, _, _ = ba.lm_chunk(
        prob.poses, prob.points, jnp.float32(1e-4), jnp.float32(c0), inl,
        prob, "pinhole", 5, 5.991, True, 96)
    np.testing.assert_array_equal(np.asarray(p.t[0]),
                                  np.asarray(prob.poses.t[0]))
    np.testing.assert_array_equal(np.asarray(p.R[0]),
                                  np.asarray(prob.poses.R[0]))
