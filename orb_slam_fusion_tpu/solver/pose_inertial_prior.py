"""Per-frame pose-inertial solve with a marginalized 15-dim prior.

Reference: Optimizer::PoseInertialOptimizationLastFrame (optimizer.cc:4762)
+ Optimizer::Marginalize (optimizer.cc:2904) + ConstraintPoseImu /
EdgePriorPoseImu (g2o_types.h:664-722). The reference keeps BOTH frames in
the graph — the previous frame carries the 15-dim prior produced by the
previous call's Schur marginalization, the current frame carries the
reprojection factors, and an EdgeInertial + bias-random-walk edges connect
them; after convergence the previous state is marginalized into a fresh
prior on the current state. Nothing is fixed outright, so inter-keyframe
information is CARRIED, not discarded (the round-1 build fixed the previous
state and lost it every frame).

TPU formulation — one jitted 24-dim Gauss-Newton solve. Two deliberate
departures from the reference's graph shape, both forced by float32 (g2o
runs in double):

* The bias random walk is NOT an in-graph factor. Over a 50 ms gap its
  information (~1/(sigma_w^2 dt) ~ 5e10) exceeds the per-frame bias
  evidence (~1e3) by 8 orders of magnitude — the informative eigenvalue of
  the scaled system sits below float32 epsilon and no preconditioning can
  recover it. Instead the two frames SHARE one 6-dim bias variable (exact
  limit of an infinitely stiff walk edge) and the walk enters as covariance
  inflation of the carried prior's bias block (a Kalman prediction step,
  numerically a small correction rather than a stiff coupling).
* The normal equations are Jacobi-preconditioned before the dense solve.

State tangent ordering: [pose_prev (6, left-mult se3), vel_prev (3),
pose_cur (6), vel_cur (3), bias_g (3), bias_a (3)] — 24 total; the
marginalized output covers [pose_cur, vel_cur, bias] (15).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .. import cameras, lie
from ..imu.preintegration import GRAVITY, ImuBias, ImuCalib, Preintegrated
from .robust import CHI2_2D, huber_rho, huber_weight
from .pose_opt import _residual_and_jac
from .vi_ba import _inertial_res_one


class PoseImuPrior(NamedTuple):
    """Marginalized Gaussian over one frame's [pose, vel, bg, ba].

    `H` is the information matrix in the tangent at the stored linearization
    point (reference ConstraintPoseImu: H + estimates, g2o_types.h:664).
    """

    pose: lie.SE3           # camera Tcw linearization point
    vel: jnp.ndarray        # (3,)
    bg: jnp.ndarray         # (3,)
    ba: jnp.ndarray         # (3,)
    H: jnp.ndarray          # (15,15)


def make_initial_prior(pose: lie.SE3, vel, bias: ImuBias,
                       pose_info: float = 1e4, vel_info: float = 1e2,
                       bias_info_g: float = 1e4, bias_info_a: float = 1e2
                       ) -> PoseImuPrior:
    """Fresh prior at a keyframe-anchored state (the windowed VI-BA just
    re-estimated it, so the chain restarts from moderate confidence —
    reference: the prior is rebuilt from the KF-anchored marginalization,
    optimizer.cc:4394+)."""
    d = jnp.concatenate([
        jnp.full(6, pose_info), jnp.full(3, vel_info),
        jnp.full(3, bias_info_g), jnp.full(3, bias_info_a)])
    return PoseImuPrior(pose=pose, vel=jnp.asarray(vel),
                        bg=jnp.asarray(bias.gyro), ba=jnp.asarray(bias.acc),
                        H=jnp.diag(d.astype(jnp.float32)))


def inflate_bias_walk(H: jnp.ndarray, calib: ImuCalib, dT) -> jnp.ndarray:
    """Kalman-predict the bias block: C' = C + E Q E^T in information form
    (Woodbury): H' = H - H E (Q^-1 + E^T H E)^-1 E^T H, with
    Q = diag(sigma_wg^2, sigma_wa^2) * dT (reference EdgeGyroRW/AccRW
    semantics moved out of the graph — see module docstring)."""
    dtype = H.dtype
    dT = jnp.maximum(dT, 1e-6)
    q_inv = jnp.concatenate([
        jnp.full(3, 1.0 / (calib.walk_gyro ** 2 * dT)),
        jnp.full(3, 1.0 / (calib.walk_acc ** 2 * dT))]).astype(dtype)
    HE = H[:, 9:15]                              # (15, 6)
    B = jnp.diag(q_inv) + H[9:15, 9:15]          # (6, 6)
    corr = HE @ jax.scipy.linalg.solve(B, HE.T, assume_a="pos")
    Hn = H - corr
    return 0.5 * (Hn + Hn.T)


def _boxminus15(pose, vel, bg, ba, prior: PoseImuPrior) -> jnp.ndarray:
    """15-dim tangent residual of a state vs the prior linearization point
    (boxplus(prior_state, r) = state for the pose block)."""
    dp = lie.se3_log(lie.se3_compose(pose, lie.se3_inverse(prior.pose)))
    return jnp.concatenate([dp, vel - prior.vel, bg - prior.bg,
                            ba - prior.ba])


@functools.partial(
    jax.jit,
    static_argnames=("cam_model", "rounds", "iters_per_round", "chi2_th"),
)
def pose_inertial_marginalized(
    prior: PoseImuPrior,        # marginalized info on the PREVIOUS frame
    pose0: lie.SE3,             # current-frame init (visual solve / predict)
    vel0: jnp.ndarray,          # (3,) current-frame velocity init (world)
    pre: Preintegrated,         # preintegration previous -> current
    info: jnp.ndarray,          # (9,9) information of [phi, v, p]
    calib: ImuCalib,
    points_w: jnp.ndarray,      # (N,3) matched map points (world)
    uv: jnp.ndarray,            # (N,2) observed keypoints
    inv_sigma2: jnp.ndarray,    # (N,)
    valid: jnp.ndarray,         # (N,)
    cam_params: jnp.ndarray,
    cam_model: str = cameras.PINHOLE,
    rounds: int = 2,
    iters_per_round: int = 3,
    chi2_th: float = CHI2_2D,
) -> Tuple[lie.SE3, jnp.ndarray, ImuBias, PoseImuPrior, jnp.ndarray,
           jnp.ndarray]:
    """Joint [prev(9) + cur(9) + shared bias(6)] solve, then marginalize.

    Returns (pose, vel, bias, next_prior, inlier (N,), n_inliers ()).
    """
    valid = valid.astype(bool)
    dtype = points_w.dtype
    g_w = jnp.array([0.0, 0.0, -GRAVITY], dtype)
    # prior with walk-inflated bias block (Kalman prediction over the gap)
    H_prior = inflate_bias_walk(prior.H.astype(dtype), calib, pre.dT)

    def residuals(dx, base):
        """Prior (15) + inertial (9) residuals at base boxplus dx (24,)."""
        (pp0, vp0, pc0, vc0, bg0, ba0) = base
        pp = lie.se3_boxplus(pp0, dx[0:6])
        vp = vp0 + dx[6:9]
        pc_ = lie.se3_boxplus(pc0, dx[9:15])
        vc = vc0 + dx[15:18]
        bg = bg0 + dx[18:21]
        ba = ba0 + dx[21:24]
        r_prior = _boxminus15(pp, vp, bg, ba, prior)            # (15,)
        r_inert = _inertial_res_one(pre, None, pp, vp, pc_, vc,
                                    bg, ba, calib, g_w)         # (9,)
        return jnp.concatenate([r_prior, r_inert])              # (24,)

    W_blocks = jax.scipy.linalg.block_diag(H_prior, info.astype(dtype))

    def visual_Hg(pose, inlier):
        r, J, depth_ok = _residual_and_jac(pose, points_w, uv,
                                           cam_model, cam_params)
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        w = jnp.where(inlier & valid & depth_ok,
                      huber_weight(chi2, chi2_th) * inv_sigma2,
                      0.0).astype(dtype)
        Hv = jnp.einsum("nik,n,nil->kl", J, w, J)   # (6,6) cur-pose block
        gv = jnp.einsum("nik,n,ni->k", J, w, r)
        return Hv, gv

    def full_Hg(base, inlier):
        """Gauss-Newton normal equations of the 24-dim joint problem."""
        z = jnp.zeros(24, dtype)
        r0 = residuals(z, base)
        Jr = jax.jacfwd(residuals)(z, base)          # (24, 24)
        H = Jr.T @ W_blocks @ Jr
        g = Jr.T @ (W_blocks @ r0)
        Hv, gv = visual_Hg(base[2], inlier)
        H = H.at[9:15, 9:15].add(Hv)
        g = g.at[9:15].add(gv)
        return H, g

    def cost_of(base, inlier):
        r0 = residuals(jnp.zeros(24, dtype), base)
        c = r0 @ W_blocks @ r0
        r, _, depth_ok = _residual_and_jac(base[2], points_w, uv,
                                           cam_model, cam_params)
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        c += jnp.sum(jnp.where(inlier & valid & depth_ok,
                               huber_rho(chi2, chi2_th), 0.0))
        return c

    def apply_dx(base, dx):
        (pp0, vp0, pc0, vc0, bg0, ba0) = base
        return (lie.se3_boxplus(pp0, dx[0:6]), vp0 + dx[6:9],
                lie.se3_boxplus(pc0, dx[9:15]), vc0 + dx[15:18],
                bg0 + dx[18:21], ba0 + dx[21:24])

    def gn_iters(base, inlier):
        def body(b, _):
            H, g = full_Hg(b, inlier)
            # Jacobi preconditioning: information scales span ~1e2..1e6;
            # symmetric diagonal scaling keeps the float32 solve honest
            d = jnp.sqrt(jnp.clip(jnp.diag(H), 1e-12, None))
            Hs = H / d[:, None] / d[None, :]
            Hs = Hs + 1e-5 * jnp.eye(24, dtype=dtype)
            dx = -jax.scipy.linalg.solve(Hs, g / d, assume_a="pos") / d
            b2 = apply_dx(b, dx)
            ok = jnp.all(jnp.isfinite(dx))
            b = jax.tree_util.tree_map(
                lambda a, c: jnp.where(ok, a, c), b2, b)
            return b, None
        base1, _ = jax.lax.scan(body, base, None, length=iters_per_round)
        worse = cost_of(base1, inlier) >= cost_of(base, inlier)
        return jax.tree_util.tree_map(
            lambda a, b_: jnp.where(worse, b_, a), base1, base)

    def round_body(i, carry):
        base, inlier = carry
        base = gn_iters(base, inlier)
        r, _, depth_ok = _residual_and_jac(base[2], points_w, uv,
                                           cam_model, cam_params)
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        inlier = (chi2 <= chi2_th) & valid & depth_ok
        return base, inlier

    base0 = (prior.pose, prior.vel, pose0, vel0, prior.bg, prior.ba)
    base, inlier = jax.lax.fori_loop(0, rounds, round_body, (base0, valid))

    # ---- marginalize the previous pose+vel block (reference
    # Optimizer::Marginalize, optimizer.cc:2904): H' = Hcc - Hcp Hpp^-1 Hpc
    # at the solution; the remaining block order is already
    # [pose_cur, vel_cur, bias] = the next prior's 15-dim state ----------
    H, _ = full_Hg(base, inlier)
    dd = jnp.sqrt(jnp.clip(jnp.diag(H), 1e-12, None))
    Hn = H / dd[:, None] / dd[None, :]
    Hpp = Hn[:9, :9] + 1e-6 * jnp.eye(9, dtype=dtype)
    Hpc = Hn[:9, 9:]
    Hcc = Hn[9:, 9:]
    Hm = Hcc - Hpc.T @ jax.scipy.linalg.solve(Hpp, Hpc, assume_a="pos")
    H_marg = Hm * dd[9:, None] * dd[None, 9:]
    H_marg = 0.5 * (H_marg + H_marg.T)
    H_marg = jnp.where(jnp.isfinite(H_marg), H_marg, 0.0)

    (pp, vp, pc_, vc, bg, ba) = base
    next_prior = PoseImuPrior(pose=pc_, vel=vc, bg=bg, ba=ba, H=H_marg)
    n_in = jnp.sum(inlier.astype(jnp.int32))
    return pc_, vc, ImuBias(bg, ba), next_prior, inlier, n_in
