"""Distributed bundle adjustment: landmark-sharded Schur reduction.

Decomposition (the BASELINE.json north-star design):

* **Landmarks shard** across the mesh axis ``mp`` — each device owns M/D
  landmarks, their 3x3 Hessian blocks, their Schur cross terms, and their
  back-substitution.
* **Poses replicate** — every device holds all K pose blocks (poses are the
  small dimension in SLAM; a 1000-KF map is 36 KB of pose blocks).
* The reduced camera system ``S = Hpp - sum_l W_l Hll_l^-1 W_l^T`` is a sum
  of per-landmark contributions -> one ``psum`` over the mesh, then a
  replicated dense Cholesky. This mirrors distributed data-parallel
  training: per-device partial reductions, collective, replicated update.

Factor arrays are replicated in this first implementation (they are a few
MB); the per-landmark gather pulls only the owned rows. The same structure
extends to multi-host DCN meshes unchanged — `psum` rides ICI within a
slice and DCN across.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import cameras, lie
from ..solver import robust
from ..solver.ba import inv3x3
from ..solver.ba import BAProblem, _eval_factors, _eval_residuals


def make_slam_mesh(n_devices: int | None = None,
                   devices=None) -> Mesh:
    """1-D mesh over the landmark axis."""
    if devices is None:
        devices = jax.devices()[: n_devices] if n_devices else jax.devices()
    return Mesh(np.asarray(devices), ("mp",))


def _pad_to_multiple(x, mult, axis=0, fill=0):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "cam_model", "iters", "chi2_th"),
)
def _dist_lm_run(poses, points, prob: BAProblem, mesh: Mesh,
                 cam_model: str, iters: int, chi2_th: float):
    """LM iterations with the Schur reduction sharded over mesh axis 'mp'.

    `points`, `prob.lm_factor_idx/valid`, `prob.fixed_point` must already be
    padded to a multiple of the mesh size.
    """
    D = mesh.shape["mp"]
    K = poses.t.shape[0]
    M = points.shape[0]
    dtype = points.dtype

    # Replicated factor-level arrays; landmark-level arrays sharded.
    lm_spec = P("mp")
    rep = P()

    def step(poses, points, lam):
        # --- replicated factor evaluation ------------------------------
        r, Jp, Jl, depth_ok = _eval_factors(poses, points, prob, cam_model)
        active = prob.valid & depth_ok
        chi2 = jnp.sum(r * r, axis=-1) * prob.inv_sigma2
        w = jnp.where(active,
                      robust.huber_weight(chi2, chi2_th) * prob.inv_sigma2,
                      0.0).astype(dtype)
        Hpp_f = jnp.einsum("fik,f,fil->fkl", Jp, w, Jp)
        Hll_f = jnp.einsum("fik,f,fil->fkl", Jl, w, Jl)
        Hpl_f = jnp.einsum("fik,f,fil->fkl", Jp, w, Jl)
        gp_f = jnp.einsum("fik,f,fi->fk", Jp, w, r)
        gl_f = jnp.einsum("fik,f,fi->fk", Jl, w, r)

        # one-hot contraction instead of segment_sum (TPU scatters
        # serialize; this is a small (F, K) matmul)
        P_f = (prob.kf_idx[:, None]
               == jnp.arange(K, dtype=prob.kf_idx.dtype)[None, :]
               ).astype(dtype)
        Hpp = jnp.einsum("fk,fij->kij", P_f, Hpp_f)
        gp = jnp.einsum("fk,fi->ki", P_f, gp_f)

        # --- landmark-sharded Schur assembly ---------------------------
        def schur_local(lm_idx, lm_val, fixed_pt):
            # lm_idx: (M/D, O) rows into replicated factor arrays
            obs_mask = lm_val
            Wg = jnp.where(obs_mask[..., None, None], Hpl_f[lm_idx], 0.0)
            Hll = jnp.sum(
                jnp.where(obs_mask[..., None, None], Hll_f[lm_idx], 0.0),
                axis=1)                                     # (M/D,3,3)
            gl = jnp.sum(
                jnp.where(obs_mask[..., None], gl_f[lm_idx], 0.0), axis=1)
            eye3 = jnp.eye(3, dtype=dtype)
            Hll_d = Hll + lam * Hll * eye3 + 1e-8 * eye3
            fix = fixed_pt[:, None, None]
            Hll_d = jnp.where(fix, jnp.broadcast_to(eye3, Hll_d.shape), Hll_d)
            gl = jnp.where(fixed_pt[:, None], 0.0, gl)
            Hll_inv = jnp.where(fix, 0.0, inv3x3(Hll_d))

            pose_of = prob.kf_idx[lm_idx]                  # (M/D,O)
            E = jnp.einsum("moik,mkl->moil", Wg, Hll_inv)
            # pairwise cross terms contracted straight into (K,K) blocks
            # via one-hot memberships (no scatter, no (M,O,O) blow-up)
            Pm = ((pose_of[..., None]
                   == jnp.arange(K, dtype=pose_of.dtype))
                  & obs_mask[..., None]).astype(dtype)     # (M/D,O,K)
            T1 = jnp.einsum("mok,moil->mkil", Pm, E)
            T2 = jnp.einsum("mok,moil->mkil", Pm, Wg)
            S_local = -jnp.einsum("mkil,mqjl->kqij", T1, T2)
            # g correction: sum_l W_l Hll_inv gl over owned landmarks
            corr = jnp.einsum("moik,mkl,ml->moi", Wg, Hll_inv, gl)
            g_corr = jnp.einsum("mok,moi->ki", Pm, corr)
            # collective: sum partial S and g over the mesh
            S_sum = jax.lax.psum(S_local, "mp")
            g_sum = jax.lax.psum(g_corr, "mp")
            return S_sum, g_sum, Hll_inv, gl, Wg, pose_of

        S_blocks, g_corr, Hll_inv, gl, Wg, pose_of = shard_map(
            schur_local, mesh=mesh,
            in_specs=(lm_spec, lm_spec, lm_spec),
            out_specs=(rep, rep, lm_spec, lm_spec, lm_spec, lm_spec),
        )(prob.lm_factor_idx, prob.lm_factor_valid, prob.fixed_point)

        S_blocks = S_blocks.at[jnp.arange(K), jnp.arange(K)].add(Hpp)
        g_r = gp - g_corr

        eye6 = jnp.eye(6, dtype=dtype)
        fp = prob.fixed_pose
        S_blocks = jnp.where(
            fp[:, None, None, None] | fp[None, :, None, None], 0.0, S_blocks)
        S_blocks = S_blocks.at[jnp.arange(K), jnp.arange(K)].add(
            jnp.where(fp[:, None, None], eye6, 0.0))
        g_r = jnp.where(fp[:, None], 0.0, g_r)

        S = jnp.transpose(S_blocks, (0, 2, 1, 3)).reshape(K * 6, K * 6)
        S = S + jnp.diag(lam * jnp.diag(S) + 1e-8)
        dx_p = -jax.scipy.linalg.solve(S, g_r.reshape(-1), assume_a="pos")
        dx_p = dx_p.reshape(K, 6)
        dx_p = jnp.where(fp[:, None], 0.0, dx_p)

        # --- sharded landmark back-substitution ------------------------
        def backsub_local(Hll_inv, gl, Wg, pose_of, fixed_pt):
            back = jnp.einsum("moki,mok->moi", Wg, dx_p[pose_of])
            back = jnp.sum(back, axis=1)
            dx_l = jnp.einsum("mij,mj->mi", Hll_inv, -gl - back)
            return jnp.where(fixed_pt[:, None], 0.0, dx_l)

        dx_l = shard_map(
            backsub_local, mesh=mesh,
            in_specs=(lm_spec, lm_spec, lm_spec, lm_spec, lm_spec),
            out_specs=lm_spec,
        )(Hll_inv, gl, Wg, pose_of, prob.fixed_point)

        return lie.se3_boxplus(poses, dx_p), points + dx_l

    def cost_at(ps, pt):
        r, fin = _eval_residuals(ps, pt, prob, cam_model)
        chi2 = jnp.sum(r * r, axis=-1) * prob.inv_sigma2
        act = prob.valid & fin
        return jnp.sum(jnp.where(act, robust.huber_rho(chi2, chi2_th), 0.0))

    def body(carry, _):
        # carried cost + residual-only accept eval: one full-Jacobian
        # evaluation per iteration instead of three
        poses, points, lam, cost0 = carry
        cand_poses, cand_points = step(poses, points, lam)
        cost1 = cost_at(cand_poses, cand_points)
        finite = (jnp.all(jnp.isfinite(cand_poses.t))
                  & jnp.all(jnp.isfinite(cand_points)) & jnp.isfinite(cost1))
        accept = (cost1 < cost0) & finite
        poses = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), cand_poses, poses)
        points = jnp.where(accept, cand_points, points)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-8),
                        jnp.minimum(lam * 4.0, 1e6))
        return (poses, points, lam, jnp.where(accept, cost1, cost0)), cost1

    (poses, points, _, _), costs = jax.lax.scan(
        body, (poses, points, jnp.asarray(1e-4, dtype),
               cost_at(poses, points)), None, length=iters)
    return poses, points, costs


def distributed_bundle_adjustment(
    prob: BAProblem,
    mesh: Mesh,
    cam_model: str = cameras.PINHOLE,
    iters: int = 10,
    chi2_th: float = robust.CHI2_2D,
) -> Tuple[lie.SE3, jnp.ndarray, jnp.ndarray]:
    """Run `iters` distributed LM iterations. Returns (poses, points, costs).

    Pads the landmark axis to the mesh size; the padded rows are marked
    fixed so they are inert.
    """
    D = mesh.shape["mp"]
    M = prob.points.shape[0]
    pad = (-M) % D
    if pad:
        prob = prob._replace(
            points=_pad_to_multiple(prob.points, D),
            lm_factor_idx=_pad_to_multiple(prob.lm_factor_idx, D),
            lm_factor_valid=_pad_to_multiple(prob.lm_factor_valid, D),
            fixed_point=jnp.concatenate(
                [prob.fixed_point, jnp.ones(pad, bool)]),
        )
    poses, points, costs = _dist_lm_run(
        prob.poses, prob.points, prob, mesh, cam_model, iters, chi2_th)
    return poses, points[:M], costs
