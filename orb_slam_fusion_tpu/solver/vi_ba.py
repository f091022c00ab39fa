"""Visual-inertial bundle adjustment + IMU initialization.

Replaces the inertial back-end entry points of the reference Optimizer:

* `visual_inertial_ba`  <- LocalInertialBA / FullInertialBA
  (optimizer.cc:2329 / :364): keyframe states are (pose, velocity, gyro
  bias, acc bias) = 15 dof; factors are reprojections (analytic Jacobians,
  landmarks Schur-eliminated exactly as in ba.py), 9-dim preintegration
  factors between consecutive keyframes (EdgeInertial, g2o_types.h:458),
  bias random-walk factors (EdgeGyroRW/EdgeAccRW), and optionally the
  backward (bidirectional) inertial factors this build adds.
* `inertial_init`       <- InertialOptimization (optimizer.cc:2985):
  gravity direction (2 dof), scale, shared biases and per-keyframe
  velocities estimated with poses held fixed — the core of the 3-stage IMU
  initialization (localmapping.cc:1035).

Inertial Jacobians come from forward-mode autodiff of the residual under
tangent perturbation — exact, 30 input dims per factor, negligible next to
the visual work. States use camera-from-world poses (Tcw) like the visual
solver; body quantities are derived through the camera-to-body extrinsic.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import lie
from ..imu.preintegration import GRAVITY, ImuBias, ImuCalib, Preintegrated
from ..imu.factors import inertial_residual, inertial_residual_backward
from .ba import BAProblem, _eval_factors, inv3x3
from .robust import huber_rho, huber_weight


class VIState(NamedTuple):
    poses: lie.SE3        # (K,) Tcw
    vel: jnp.ndarray      # (K,3) body velocity in world
    bg: jnp.ndarray       # (K,3) gyro bias
    ba: jnp.ndarray       # (K,3) acc bias


class InertialFactorBatch(NamedTuple):
    """Preintegration factors between keyframe pairs (usually (k, k+1))."""

    i: jnp.ndarray        # (P,) int32
    j: jnp.ndarray        # (P,) int32
    pre: Preintegrated    # batched (P, ...)
    info: jnp.ndarray     # (P,9,9) information of [phi, v, p]
    valid: jnp.ndarray    # (P,)
    pre_bwd: Optional[Preintegrated] = None  # batched backward deltas
    info_bwd: Optional[jnp.ndarray] = None


def body_state(pose_cw: lie.SE3, calib: ImuCalib):
    """Tcw -> (R_wb, p_wb): world-from-body rotation + body position."""
    R_bw = calib.Tbc_R @ pose_cw.R
    t_bw = jnp.einsum("...ij,...j->...i", calib.Tbc_R, pose_cw.t) + calib.Tbc_t
    R_wb = jnp.swapaxes(R_bw, -1, -2)
    p_wb = -jnp.einsum("...ij,...j->...i", R_wb, t_bw)
    return R_wb, p_wb


def _inertial_res_one(pre_k, info_k, pose_i: lie.SE3, v_i, pose_j: lie.SE3,
                      v_j, bg_i, ba_i, calib: ImuCalib, g_w,
                      backward: bool = False):
    R_wi, p_wi = body_state(pose_i, calib)
    R_wj, p_wj = body_state(pose_j, calib)
    bias = ImuBias(bg_i, ba_i)
    if backward:
        r = inertial_residual_backward(pre_k, R_wi, p_wi, v_i,
                                       R_wj, p_wj, v_j, bias, g_w)
    else:
        r = inertial_residual(pre_k, R_wi, p_wi, v_i,
                              R_wj, p_wj, v_j, bias, g_w)
    return r


def inertial_system(state: VIState, ifac: InertialFactorBatch,
                    calib: ImuCalib, g_w, bias_rw_info_g: float,
                    bias_rw_info_a: float, bias_prior_info_g: float,
                    bias_prior_info_a: float):
    """Assemble the inertial + bias-walk + bias-prior contributions to the
    dense (K,D,K,D) normal system (D=15). O(K) work — shared by the
    single-device VI-BA below and the distributed variant
    (parallel/dist_vi_ba.py), where it runs replicated on every device
    next to the landmark-sharded visual reduction."""
    K = state.poses.t.shape[0]
    P = ifac.i.shape[0]
    dtype = state.poses.t.dtype
    D = 15

    H = jnp.zeros((K, D, K, D), dtype)
    g = jnp.zeros((K, D), dtype)

    def edge_res(k, dx_i, dx_j):
        pre_k = jax.tree_util.tree_map(lambda a: a[k], ifac.pre)
        pi = lie.se3_boxplus(
            lie.SE3(state.poses.R[ifac.i[k]], state.poses.t[ifac.i[k]]),
            dx_i[:6])
        pj = lie.se3_boxplus(
            lie.SE3(state.poses.R[ifac.j[k]], state.poses.t[ifac.j[k]]),
            dx_j[:6])
        return _inertial_res_one(
            pre_k, None, pi, state.vel[ifac.i[k]] + dx_i[6:9],
            pj, state.vel[ifac.j[k]] + dx_j[6:9],
            state.bg[ifac.i[k]] + dx_i[9:12],
            state.ba[ifac.i[k]] + dx_i[12:15], calib, g_w)

    zero_dx = jnp.zeros(D, dtype)

    def edge_blocks(k):
        r0 = edge_res(k, zero_dx, zero_dx)
        Ji = jax.jacfwd(lambda d: edge_res(k, d, zero_dx))(zero_dx)
        Jj = jax.jacfwd(lambda d: edge_res(k, zero_dx, d))(zero_dx)
        return r0, Ji, Jj

    r_in, Ji, Jj = jax.vmap(edge_blocks)(jnp.arange(P))
    w_in = jnp.where(ifac.valid, 1.0, 0.0).astype(dtype)
    info = ifac.info * w_in[:, None, None]
    Hii = jnp.einsum("pri,prs,psj->pij", Ji, info, Ji)
    Hjj = jnp.einsum("pri,prs,psj->pij", Jj, info, Jj)
    Hij = jnp.einsum("pri,prs,psj->pij", Ji, info, Jj)
    gi = jnp.einsum("pri,prs,ps->pi", Ji, info, r_in)
    gj = jnp.einsum("pri,prs,ps->pi", Jj, info, r_in)
    H = H.at[ifac.i, :, ifac.i, :].add(Hii)
    H = H.at[ifac.j, :, ifac.j, :].add(Hjj)
    H = H.at[ifac.i, :, ifac.j, :].add(Hij)
    H = H.at[ifac.j, :, ifac.i, :].add(jnp.swapaxes(Hij, -1, -2))
    g = g.at[ifac.i].add(gi)
    g = g.at[ifac.j].add(gj)

    # ---- bias random-walk edges ------------------------------------
    rw = jnp.concatenate([
        jnp.full(3, bias_rw_info_g, dtype),
        jnp.full(3, bias_rw_info_a, dtype)])
    db = jnp.concatenate(
        [state.bg[ifac.j] - state.bg[ifac.i],
         state.ba[ifac.j] - state.ba[ifac.i]], axis=-1)  # (P,6)
    gb = rw[None, :] * db * w_in[:, None]
    Hb = jnp.diag(rw)
    idx_b = jnp.arange(9, 15)
    H = H.at[ifac.i[:, None, None], idx_b[:, None],
             ifac.i[:, None, None], idx_b[None, :]].add(
        Hb[None] * w_in[:, None, None])
    H = H.at[ifac.j[:, None, None], idx_b[:, None],
             ifac.j[:, None, None], idx_b[None, :]].add(
        Hb[None] * w_in[:, None, None])
    H = H.at[ifac.i[:, None, None], idx_b[:, None],
             ifac.j[:, None, None], idx_b[None, :]].add(
        -Hb[None] * w_in[:, None, None])
    H = H.at[ifac.j[:, None, None], idx_b[:, None],
             ifac.i[:, None, None], idx_b[None, :]].add(
        -Hb[None] * w_in[:, None, None])
    g = g.at[ifac.i, 9:].add(-gb)
    g = g.at[ifac.j, 9:].add(gb)

    # ---- bias prior on the first keyframe --------------------------
    prior = jnp.concatenate([
        jnp.full(3, bias_prior_info_g, dtype),
        jnp.full(3, bias_prior_info_a, dtype)])
    H = H.at[0, idx_b, 0, idx_b].add(prior)
    g = g.at[0, 9:].add(prior * jnp.concatenate(
        [state.bg[0], state.ba[0]]))
    return H, g


def inertial_cost_terms(state: VIState, ifac: InertialFactorBatch,
                        calib: ImuCalib, g_w, bias_rw_info_g: float,
                        bias_rw_info_a: float, bias_prior_info_g: float,
                        bias_prior_info_a: float):
    """Scalar inertial + bias-walk + bias-prior cost at a state (the
    non-visual half of the VI-BA accept test; shared with the distributed
    variant)."""
    P = ifac.i.shape[0]

    def one(k):
        pre_k = jax.tree_util.tree_map(lambda a: a[k], ifac.pre)
        pi = lie.SE3(state.poses.R[ifac.i[k]], state.poses.t[ifac.i[k]])
        pj = lie.SE3(state.poses.R[ifac.j[k]], state.poses.t[ifac.j[k]])
        return _inertial_res_one(
            pre_k, None, pi, state.vel[ifac.i[k]], pj,
            state.vel[ifac.j[k]], state.bg[ifac.i[k]],
            state.ba[ifac.i[k]], calib, g_w)

    ri = jax.vmap(one)(jnp.arange(P))
    c_in = jnp.sum(jnp.where(
        ifac.valid,
        jnp.einsum("pi,pij,pj->p", ri, ifac.info, ri), 0.0))
    dbg = state.bg[ifac.j] - state.bg[ifac.i]
    dba = state.ba[ifac.j] - state.ba[ifac.i]
    c_b = jnp.sum(jnp.where(
        ifac.valid,
        bias_rw_info_g * jnp.sum(dbg * dbg, axis=-1)
        + bias_rw_info_a * jnp.sum(dba * dba, axis=-1), 0.0))
    c_prior = (bias_prior_info_g * jnp.sum(state.bg[0] ** 2)
               + bias_prior_info_a * jnp.sum(state.ba[0] ** 2))
    return c_in + c_b + c_prior


@functools.partial(jax.jit, static_argnames=("cam_model", "iters",
                                             "chi2_th", "use_backward"))
def visual_inertial_ba(
    state: VIState,
    prob: BAProblem,                 # visual part (poses field ignored)
    ifac: InertialFactorBatch,
    calib: ImuCalib,
    fixed_pose: jnp.ndarray,         # (K,) bool — pose frozen (gauge/ring)
    fixed_inertial: Optional[jnp.ndarray] = None,  # (K,) bool — vel+bias
                                     # frozen too (out-of-window anchors);
                                     # defaults to none — gauge fixing must
                                     # NOT freeze a bias estimate, or the
                                     # walk edges drag every bias toward it
    cam_model: str = "pinhole",
    iters: int = 10,
    chi2_th: float = 5.991,
    bias_rw_info_g: float = 1e4,     # information of gyro-bias walk edges
    bias_rw_info_a: float = 1e2,
    bias_prior_info_g: float = 1e4,  # prior anchoring KF-0 bias (reference:
    bias_prior_info_a: float = 1e2,  # EdgePriorGyro/Acc in FullInertialBA —
                                     # without it, (acc bias <-> pose drift)
                                     # is a flat valley over short windows)
    use_backward: bool = False,
    g_w: Optional[jnp.ndarray] = None,
) -> Tuple[VIState, jnp.ndarray, jnp.ndarray]:
    """LM over (pose, vel, biases) x K + landmarks (Schur-eliminated).

    Returns (state, points, costs).
    """
    K = state.poses.t.shape[0]
    M = prob.points.shape[0]
    P = ifac.i.shape[0]
    dtype = prob.points.dtype
    if g_w is None:
        g_w = jnp.array([0.0, 0.0, -GRAVITY], dtype)

    D = 15  # per-keyframe state dim: [pose 6, vel 3, bg 3, ba 3]

    def perturb(state: VIState, dx):
        # dx: (K, 15)
        poses = lie.se3_boxplus(state.poses, dx[:, :6])
        return VIState(poses, state.vel + dx[:, 6:9],
                       state.bg + dx[:, 9:12], state.ba + dx[:, 12:15])

    def total_cost(state: VIState, points, inlier):
        prob2 = prob._replace(poses=state.poses)
        r, _, _, dok = _eval_factors(state.poses, points, prob2, cam_model)
        chi2 = jnp.sum(r * r, axis=-1) * prob.inv_sigma2
        act = prob.valid & inlier & dok
        c_vis = jnp.sum(jnp.where(act, huber_rho(chi2, chi2_th), 0.0))
        return c_vis + inertial_cost_terms(
            state, ifac, calib, g_w, bias_rw_info_g, bias_rw_info_a,
            bias_prior_info_g, bias_prior_info_a)

    def lm_step(state: VIState, points, lam, inlier):
        prob2 = prob._replace(poses=state.poses)
        # ---- visual part (identical structure to ba._lm_step) ----------
        r, Jp, Jl, depth_ok = _eval_factors(state.poses, points, prob2,
                                            cam_model)
        active = prob.valid & inlier & depth_ok
        chi2 = jnp.sum(r * r, axis=-1) * prob.inv_sigma2
        w = jnp.where(active, huber_weight(chi2, chi2_th) * prob.inv_sigma2,
                      0.0).astype(dtype)
        Hpp_f = jnp.einsum("fik,f,fil->fkl", Jp, w, Jp)
        Hll_f = jnp.einsum("fik,f,fil->fkl", Jl, w, Jl)
        Hpl_f = jnp.einsum("fik,f,fil->fkl", Jp, w, Jl)
        gp_f = jnp.einsum("fik,f,fi->fk", Jp, w, r)
        gl_f = jnp.einsum("fik,f,fi->fk", Jl, w, r)
        # scatter-free reductions (TPU scatters serialize): pose segments
        # via a (F, K) one-hot contraction, landmark segments via the
        # per-landmark factor table (gather + masked sum)
        Fn = prob.kf_idx.shape[0]
        P_f = (prob.kf_idx[:, None]
               == jnp.arange(K, dtype=prob.kf_idx.dtype)[None, :]
               ).astype(dtype)
        fidx = jnp.clip(prob.lm_factor_idx, 0, Fn - 1)
        vmf = prob.lm_factor_valid.astype(dtype)
        Hpp = jnp.einsum("fk,fij->kij", P_f, Hpp_f)
        Hll = jnp.einsum("mo,moij->mij", vmf, Hll_f[fidx])
        gp = jnp.einsum("fk,fi->ki", P_f, gp_f)
        gl = jnp.einsum("mo,moi->mi", vmf, gl_f[fidx])

        eye3 = jnp.eye(3, dtype=dtype)
        Hll_d = Hll + lam * Hll * eye3 + 1e-8 * eye3
        fixl = prob.fixed_point[:, None, None]
        Hll_d = jnp.where(fixl, jnp.broadcast_to(eye3, Hll_d.shape), Hll_d)
        gl = jnp.where(prob.fixed_point[:, None], 0.0, gl)
        Hll_inv = jnp.where(fixl, 0.0, inv3x3(Hll_d))

        Wg = Hpl_f[fidx]
        pose_of = prob.kf_idx[fidx]
        obs_mask = prob.lm_factor_valid
        Wg = jnp.where(obs_mask[..., None, None], Wg, 0.0)
        E = jnp.einsum("moik,mkl->moil", Wg, Hll_inv)
        Pm = ((pose_of[..., None] == jnp.arange(K, dtype=pose_of.dtype))
              & obs_mask[..., None]).astype(dtype)
        T1 = jnp.einsum("mok,moil->mkil", Pm, E)
        T2 = jnp.einsum("mok,moil->mkil", Pm, Wg)
        eyeK = jnp.eye(K, dtype=dtype)
        S_pose = -jnp.einsum("mkil,mqjl->kqij", T1, T2)
        S_pose = S_pose + eyeK[:, :, None, None] * Hpp[:, None, :, :]
        corr = jnp.einsum("fik,fkl,fl->fi", Hpl_f, Hll_inv[prob.mp_idx],
                          gl[prob.mp_idx])
        g_pose = gp - jnp.einsum("fk,fi->ki", P_f, corr)

        # ---- full (K*15) system: embed visual pose blocks --------------
        H = jnp.zeros((K, D, K, D), dtype)
        H = H.at[:, :6, :, :6].add(jnp.transpose(S_pose, (0, 2, 1, 3)))
        g = jnp.zeros((K, D), dtype)
        g = g.at[:, :6].add(g_pose)

        # ---- inertial + bias-walk + prior contributions (O(K)) ---------
        H_in, g_in = inertial_system(
            state, ifac, calib, g_w, bias_rw_info_g, bias_rw_info_a,
            bias_prior_info_g, bias_prior_info_a)
        H = H + H_in
        g = g + g_in

        # ---- fixed dims (per-dimension masking), damping, solve --------
        fin = (jnp.zeros(K, bool) if fixed_inertial is None
               else fixed_inertial)
        fx_dim = jnp.concatenate([
            jnp.repeat(fixed_pose[:, None], 6, axis=1),
            jnp.repeat(fin[:, None], 9, axis=1)], axis=1)  # (K, D)
        Hm = jnp.where(fx_dim[:, :, None, None] | fx_dim[None, None, :, :],
                       0.0, H)
        kk = jnp.arange(K)
        dd = jnp.arange(D)
        Hm = Hm.at[kk[:, None], dd[None, :], kk[:, None], dd[None, :]].add(
            jnp.where(fx_dim, 1.0, 0.0))
        g = jnp.where(fx_dim, 0.0, g)

        Hd = Hm.reshape(K * D, K * D)
        Hd = Hd + jnp.diag(lam * jnp.diag(Hd) + 1e-7)
        # Jacobi equilibration: the IMU information (~1e8) next to visual
        # blocks (~1e2) makes the raw system unsolvable at fp32 precision;
        # symmetric diagonal scaling brings the condition number back into
        # fp32 range (g2o gets away without this because it factorizes in
        # double).
        d = jnp.sqrt(jnp.maximum(jnp.diag(Hd), 1e-12))
        Hs = Hd / d[:, None] / d[None, :]
        gs = g.reshape(-1) / d
        dx = -jax.scipy.linalg.solve(Hs, gs, assume_a="pos") / d
        dx = dx.reshape(K, D)
        dx = jnp.where(fx_dim, 0.0, dx)

        new_state = perturb(state, dx)

        # ---- landmark back-substitution --------------------------------
        back_f = jnp.einsum("fki,fk->fi", Hpl_f, dx[prob.kf_idx, :6])
        back = jnp.einsum("mo,moi->mi", vmf, back_f[fidx])
        dx_l = jnp.einsum("mij,mj->mi", Hll_inv, -gl - back)
        dx_l = jnp.where(prob.fixed_point[:, None], 0.0, dx_l)
        return new_state, points + dx_l

    inlier = jnp.ones_like(prob.valid)

    def body(carry, _):
        # cost carried from the previous accept test: one fewer full cost
        # evaluation per iteration
        state, points, lam, c0 = carry
        cand_s, cand_p = lm_step(state, points, lam, inlier)
        c1 = total_cost(cand_s, cand_p, inlier)
        finite = (jnp.isfinite(c1) & jnp.all(jnp.isfinite(cand_s.poses.t))
                  & jnp.all(jnp.isfinite(cand_p)))
        ok = (c1 < c0) & finite
        state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), cand_s, state)
        points = jnp.where(ok, cand_p, points)
        lam = jnp.where(ok, jnp.maximum(lam / 3.0, 1e-8),
                        jnp.minimum(lam * 4.0, 1e6))
        return (state, points, lam, jnp.where(ok, c1, c0)), c1

    (state, points, _, _), costs = jax.lax.scan(
        body, (state, prob.points, jnp.asarray(1e-4, dtype),
               total_cost(state, prob.points, inlier)),
        None, length=iters)
    return state, points, costs


# ---------------------------------------------------------------------------
# IMU initialization
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("iters", "optimize_scale"))
def inertial_init(
    poses: lie.SE3,           # (K,) Tcw — FIXED visual poses (arbitrary scale)
    ifac: InertialFactorBatch,
    calib: ImuCalib,
    iters: int = 30,
    optimize_scale: bool = True,
    prior_g: float = 1e2,
    prior_a: float = 1e5,
) -> Tuple[jnp.ndarray, jnp.ndarray, ImuBias, jnp.ndarray, jnp.ndarray]:
    """Estimate (scale, R_wg gravity rotation, shared bias, velocities).

    Reference: Optimizer::InertialOptimization (optimizer.cc:2985) with
    VertexGDir (2-dof gravity) + VertexScale: poses fixed, minimize the
    preintegration residuals over scale s, gravity direction, one shared
    bias, and per-keyframe velocities.

    prior_g/prior_a weight zero-mean priors on the shared biases
    (reference EdgePriorGyro/EdgePriorAcc with priorG/priorA,
    localmapping.cc:151-182: 1e2/1e5-1e10 at first init, relaxed at
    VIBA1/VIBA2). Without the acc prior, gravity direction <-> acc bias
    is a flat valley over a short low-excitation window and the solve
    dumps a gravity misfit of several m/s^2 into the bias — measured to
    kill tracking outright at IMU init on EuRoC-trajectory sims.

    Returns (scale, R_wg, bias, velocities (K,3), costs).
    """
    K = poses.t.shape[0]
    P = ifac.i.shape[0]
    dtype = poses.t.dtype
    g0 = jnp.array([0.0, 0.0, -GRAVITY], dtype)

    R_wb, p_wb = body_state(poses, calib)

    # params: [dgdir(2), log_s(1), bg(3), ba(3), vel(K*3)]
    n_par = 9 + 3 * K

    def unpack(theta):
        R_wg = lie.so3_exp(jnp.concatenate(
            [theta[:2], jnp.zeros(1, dtype)]))
        s = jnp.exp(theta[2]) if optimize_scale else jnp.asarray(1.0, dtype)
        bias = ImuBias(theta[3:6], theta[6:9])
        vel = theta[9:].reshape(K, 3)
        return R_wg, s, bias, vel

    def residuals(theta):
        R_wg, s, bias, vel = unpack(theta)
        g_w = R_wg @ g0

        def one(k):
            pre_k = jax.tree_util.tree_map(lambda a: a[k], ifac.pre)
            i, j = ifac.i[k], ifac.j[k]
            return inertial_residual(
                pre_k, R_wb[i], s * p_wb[i], vel[i],
                R_wb[j], s * p_wb[j], vel[j], bias, g_w)

        r = jax.vmap(one)(jnp.arange(P))                 # (P,9)
        return jnp.where(ifac.valid[:, None], r, 0.0)

    # zero-mean bias priors (see docstring): quadratic in theta[3:9]
    prior_vec = jnp.concatenate([jnp.full(3, prior_g, dtype),
                                 jnp.full(3, prior_a, dtype)])

    def cost(theta):
        r = residuals(theta)
        c = jnp.sum(jnp.einsum("pi,pij,pj->p", r, ifac.info, r))
        return c + jnp.sum(prior_vec * theta[3:9] ** 2)

    def body(carry, _):
        theta, lam = carry
        r = residuals(theta)
        J = jax.jacfwd(residuals)(theta).reshape(P * 9, n_par)
        # weight rows by info via einsum on (P,9) blocks
        Jb = J.reshape(P, 9, n_par)
        H = jnp.einsum("pri,prs,psj->ij", Jb, ifac.info, Jb)
        gvec = jnp.einsum("pri,prs,ps->i", Jb, ifac.info, r)
        H = H.at[jnp.arange(3, 9), jnp.arange(3, 9)].add(prior_vec)
        gvec = gvec.at[3:9].add(prior_vec * theta[3:9])
        H = H + jnp.diag(lam * jnp.diag(H) + 1e-7)
        dx = -jax.scipy.linalg.solve(H, gvec, assume_a="pos")
        c0 = cost(theta)
        c1 = cost(theta + dx)
        ok = (c1 < c0) & jnp.all(jnp.isfinite(dx))
        theta = jnp.where(ok, theta + dx, theta)
        lam = jnp.where(ok, jnp.maximum(lam / 3.0, 1e-9),
                        jnp.minimum(lam * 5.0, 1e6))
        return (theta, lam), c1

    theta0 = jnp.zeros(n_par, dtype)
    (theta, _), costs = jax.lax.scan(
        body, (theta0, jnp.asarray(1e-3, dtype)), None, length=iters)
    R_wg, s, bias, vel = unpack(theta)
    return s, R_wg, bias, vel, costs
