"""Distributed visual-inertial bundle adjustment.

Extends the landmark-sharded Schur reduction of ``dist_ba.py`` to the
15-dof inertial state (pose, velocity, gyro/acc bias — the reference's
LocalInertialBA / FullInertialBA, optimizer.cc:2329/364):

* the VISUAL factors — the heavy O(F) part — shard by landmark over mesh
  axis ``mp`` exactly as in ``dist_ba``: per-device residual/Jacobian
  evaluation, Schur elimination and back-substitution, with one ``psum``
  for the reduced (K,K,6,6) camera system per LM iteration;
* the INERTIAL chain — O(K) preintegration factors, bias random-walk
  edges and the first-keyframe bias prior — is assembled REPLICATED on
  every device (``solver.vi_ba.inertial_system``): K-1 nine-dim factors
  are microseconds of work, so sharding them would buy nothing and cost a
  collective;
* the dense equilibrated (15K x 15K) solve is replicated (identical psum
  inputs -> identical solve on every device).

This is the multi-chip path for FullInertialBA-scale problems: map size
(landmarks/observations) is the axis that grows with trajectory length,
and it is exactly the axis the mesh shards.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .. import lie
from ..imu.preintegration import GRAVITY, ImuCalib
from ..solver import robust
from ..solver.ba import BAProblem, _eval_factors, _eval_residuals, inv3x3
from ..solver.vi_ba import (InertialFactorBatch, VIState,
                            inertial_cost_terms, inertial_system)
from .dist_ba import _landmark_major, _pad_to_multiple


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "cam_model", "iters", "chi2_th",
                     "bias_rw_info_g", "bias_rw_info_a",
                     "bias_prior_info_g", "bias_prior_info_a"),
)
def _dist_vi_run(state: VIState, points, kf_of, uv, isig, valid, ur, sm,
                 fixed_point, fixed_pose, fixed_inertial, cam_params, bf,
                 ifac: InertialFactorBatch, calib: ImuCalib, g_w,
                 mesh: Mesh, cam_model: str, iters: int, chi2_th: float,
                 bias_rw_info_g: float, bias_rw_info_a: float,
                 bias_prior_info_g: float, bias_prior_info_a: float):
    K = state.poses.t.shape[0]
    D = 15
    dtype = points.dtype
    lm_spec = P("mp")
    rep = P()

    def shard_fn(points_s, kf_s, uv_s, isig_s, val_s, ur_s, sm_s, fixpt_s,
                 state, fixed_pose, fixed_inertial, cam_params, bf, ifac,
                 calib, g_w):
        Ms, O = kf_s.shape

        def flat(x):
            return x.reshape((Ms * O,) + x.shape[2:])

        loc = BAProblem(
            poses=state.poses, points=points_s,
            kf_idx=flat(kf_s),
            mp_idx=jnp.repeat(jnp.arange(Ms, dtype=jnp.int32), O),
            uv=flat(uv_s), inv_sigma2=flat(isig_s), valid=flat(val_s),
            fixed_pose=fixed_pose, fixed_point=fixpt_s,
            cam_params=cam_params,
            lm_factor_idx=jnp.arange(
                Ms * O, dtype=jnp.int32).reshape(Ms, O),
            lm_factor_valid=val_s,
            u_right=flat(ur_s), stereo_mask=flat(sm_s), bf=bf)
        th_f = jnp.where(loc.stereo_mask,
                         chi2_th * robust.CHI2_3D / robust.CHI2_2D,
                         jnp.asarray(chi2_th, dtype))
        eye3 = jnp.eye(3, dtype=dtype)
        eyeK = jnp.eye(K, dtype=dtype)

        def cost_at(st: VIState, pt):
            r, fin = _eval_residuals(st.poses, pt, loc, cam_model)
            chi2 = jnp.sum(r * r, axis=-1) * loc.inv_sigma2
            act = loc.valid & fin
            c_vis = jax.lax.psum(
                jnp.sum(jnp.where(act, robust.huber_rho(chi2, th_f), 0.0)),
                "mp")
            return c_vis + inertial_cost_terms(
                st, ifac, calib, g_w, bias_rw_info_g, bias_rw_info_a,
                bias_prior_info_g, bias_prior_info_a)

        def step(st: VIState, points_s, lam):
            # --- sharded visual Schur reduction ------------------------
            r, Jp, Jl, depth_ok = _eval_factors(st.poses, points_s, loc,
                                                cam_model)
            active = loc.valid & depth_ok
            chi2 = jnp.sum(r * r, axis=-1) * loc.inv_sigma2
            w = jnp.where(active,
                          robust.huber_weight(chi2, th_f) * loc.inv_sigma2,
                          0.0).astype(dtype)
            Hll_f = jnp.einsum("fik,f,fil->fkl", Jl, w, Jl)
            Hpl_f = jnp.einsum("fik,f,fil->fkl", Jp, w, Jl)
            gp_f = jnp.einsum("fik,f,fi->fk", Jp, w, r)
            gl_f = jnp.einsum("fik,f,fi->fk", Jl, w, r)
            P_f = (loc.kf_idx[:, None]
                   == jnp.arange(K, dtype=loc.kf_idx.dtype)[None, :]
                   ).astype(dtype)
            Hpp = jax.lax.psum(
                jnp.einsum("fk,fij->kij", P_f,
                           jnp.einsum("fik,f,fil->fkl", Jp, w, Jp)), "mp")
            gp = jax.lax.psum(jnp.einsum("fk,fi->ki", P_f, gp_f), "mp")

            Hll = jnp.einsum("moij->mij", Hll_f.reshape(Ms, O, 3, 3))
            gl = jnp.einsum("moi->mi", gl_f.reshape(Ms, O, 3))
            Hll_d = Hll + lam * Hll * eye3 + 1e-8 * eye3
            fix = fixpt_s[:, None, None]
            Hll_d = jnp.where(fix, jnp.broadcast_to(eye3, Hll_d.shape),
                              Hll_d)
            gl = jnp.where(fixpt_s[:, None], 0.0, gl)
            Hll_inv = jnp.where(fix, 0.0, inv3x3(Hll_d))

            Wg = Hpl_f.reshape(Ms, O, 6, 3)
            Wg = jnp.where(val_s[..., None, None], Wg, 0.0)
            E = jnp.einsum("moik,mkl->moil", Wg, Hll_inv)
            Pm = ((kf_s[..., None] == jnp.arange(K, dtype=kf_s.dtype))
                  & val_s[..., None]).astype(dtype)
            T1 = jnp.einsum("mok,moil->mkil", Pm, E)
            T2 = jnp.einsum("mok,moil->mkil", Pm, Wg)
            S_pose = jax.lax.psum(
                -jnp.einsum("mkil,mqjl->kqij", T1, T2), "mp")
            S_pose = S_pose + eyeK[:, :, None, None] * Hpp[:, None]
            corr = jnp.einsum("moik,mkl,ml->moi", Wg, Hll_inv, gl)
            g_corr = jax.lax.psum(
                jnp.einsum("mok,moi->ki", Pm, corr), "mp")
            g_pose = gp - g_corr

            # --- replicated (K*15) system ------------------------------
            H = jnp.zeros((K, D, K, D), dtype)
            H = H.at[:, :6, :, :6].add(jnp.transpose(S_pose, (0, 2, 1, 3)))
            g = jnp.zeros((K, D), dtype)
            g = g.at[:, :6].add(g_pose)
            H_in, g_in = inertial_system(
                st, ifac, calib, g_w, bias_rw_info_g, bias_rw_info_a,
                bias_prior_info_g, bias_prior_info_a)
            H = H + H_in
            g = g + g_in

            fx_dim = jnp.concatenate([
                jnp.repeat(fixed_pose[:, None], 6, axis=1),
                jnp.repeat(fixed_inertial[:, None], 9, axis=1)], axis=1)
            Hm = jnp.where(
                fx_dim[:, :, None, None] | fx_dim[None, None, :, :],
                0.0, H)
            kk = jnp.arange(K)
            dd = jnp.arange(D)
            Hm = Hm.at[kk[:, None], dd[None, :], kk[:, None],
                       dd[None, :]].add(jnp.where(fx_dim, 1.0, 0.0))
            g = jnp.where(fx_dim, 0.0, g)
            Hd = Hm.reshape(K * D, K * D)
            Hd = Hd + jnp.diag(lam * jnp.diag(Hd) + 1e-7)
            # Jacobi equilibration (see vi_ba.lm_step: IMU information
            # ~1e8 next to visual ~1e2 is unsolvable raw at fp32)
            d = jnp.sqrt(jnp.maximum(jnp.diag(Hd), 1e-12))
            Hs = Hd / d[:, None] / d[None, :]
            gs = g.reshape(-1) / d
            dx = -jax.scipy.linalg.solve(Hs, gs, assume_a="pos") / d
            dx = jnp.where(fx_dim, 0.0, dx.reshape(K, D))

            new_state = VIState(
                lie.se3_boxplus(st.poses, dx[:, :6]),
                st.vel + dx[:, 6:9], st.bg + dx[:, 9:12],
                st.ba + dx[:, 12:15])

            # --- sharded landmark back-substitution --------------------
            back = jnp.einsum("moki,mok->moi", Wg, dx[kf_s, :6])
            back = jnp.sum(back, axis=1)
            dx_l = jnp.einsum("mij,mj->mi", Hll_inv, -gl - back)
            dx_l = jnp.where(fixpt_s[:, None], 0.0, dx_l)
            return new_state, points_s + dx_l

        def body(carry, _):
            st, points_s, lam, c0 = carry
            cand_s, cand_p = step(st, points_s, lam)
            c1 = cost_at(cand_s, cand_p)
            pts_bad = jax.lax.psum(
                jnp.any(~jnp.isfinite(cand_p)).astype(jnp.int32), "mp")
            ok = ((c1 < c0) & jnp.isfinite(c1) & (pts_bad == 0)
                  & jnp.all(jnp.isfinite(cand_s.poses.t)))
            st = jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), cand_s, st)
            points_s = jnp.where(ok, cand_p, points_s)
            lam = jnp.where(ok, jnp.maximum(lam / 3.0, 1e-8),
                            jnp.minimum(lam * 4.0, 1e6))
            return (st, points_s, lam, jnp.where(ok, c1, c0)), c1

        (st, points_s, _, _), costs = jax.lax.scan(
            body, (state, points_s, jnp.asarray(1e-4, dtype),
                   cost_at(state, points_s)), None, length=iters)
        return st, points_s, costs

    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(lm_spec, lm_spec, lm_spec, lm_spec, lm_spec, lm_spec,
                  lm_spec, lm_spec, rep, rep, rep, rep, rep, rep, rep,
                  rep),
        out_specs=(rep, lm_spec, rep),
        check_vma=False,
    )(points, kf_of, uv, isig, valid, ur, sm, fixed_point,
      state, fixed_pose, fixed_inertial, cam_params, bf, ifac, calib, g_w)


def distributed_visual_inertial_ba(
    state: VIState,
    prob: BAProblem,                 # visual part (poses field ignored)
    ifac: InertialFactorBatch,
    calib: ImuCalib,
    mesh: Mesh,
    fixed_pose,
    fixed_inertial=None,
    cam_model: str = "pinhole",
    iters: int = 10,
    chi2_th: float = 5.991,
    bias_rw_info_g: float = 1e4,
    bias_rw_info_a: float = 1e2,
    bias_prior_info_g: float = 1e4,
    bias_prior_info_a: float = 1e2,
    g_w: Optional[jnp.ndarray] = None,
) -> Tuple[VIState, jnp.ndarray, jnp.ndarray]:
    """Landmark-sharded VI-BA over a device mesh (see module docstring).

    Same surface as ``solver.vi_ba.visual_inertial_ba`` plus the mesh.
    Returns (state, points, costs).
    """
    D = mesh.shape["mp"]
    M = prob.points.shape[0]
    dtype = prob.points.dtype
    if g_w is None:
        g_w = jnp.array([0.0, 0.0, -GRAVITY], dtype)
    if fixed_inertial is None:
        fixed_inertial = jnp.zeros(state.poses.t.shape[0], bool)
    kf_of, uv, isig, val, ur, sm = _landmark_major(prob)
    pad = (-M) % D
    points = _pad_to_multiple(prob.points, D)
    kf_of = _pad_to_multiple(kf_of, D)
    uv = _pad_to_multiple(uv, D)
    isig = _pad_to_multiple(isig, D)
    val = _pad_to_multiple(val, D)
    ur = _pad_to_multiple(ur, D)
    sm = _pad_to_multiple(sm, D)
    fixed_point = prob.fixed_point
    if pad:
        fixed_point = jnp.concatenate([fixed_point, jnp.ones(pad, bool)])
    bf = prob.bf if prob.bf is not None else jnp.asarray(0.0, jnp.float32)
    st, points, costs = _dist_vi_run(
        state, points, kf_of, uv, isig, val, ur, sm, fixed_point,
        jnp.asarray(fixed_pose, bool), jnp.asarray(fixed_inertial, bool),
        prob.cam_params, bf, ifac, calib, g_w, mesh, cam_model, iters,
        chi2_th, bias_rw_info_g, bias_rw_info_a, bias_prior_info_g,
        bias_prior_info_a)
    return st, points[:M], costs
