"""Pose-graph optimization over Sim3 (essential graph) and SE3/4DoF.

Replaces Optimizer::OptimizeEssentialGraph (optimizer.cc:1443 and the 4DoF
variant :5161): after a loop closure, keyframe poses are corrected by
optimizing a graph of relative-pose constraints (loop edges + spanning tree
+ strong covisibility edges) over Sim(3) — which also absorbs monocular
scale drift.

TPU formulation: all E edges evaluate in one vmapped residual+Jacobian pass
(7-dim Sim3 log residuals, Jacobians by forward-mode autodiff of the tangent
perturbation — exact, and only 14 input dims per edge), assembled into a
dense (7K x 7K) Gauss-Newton system solved by Cholesky. Local BA windows and
EuRoC-scale maps keep 7K in the low thousands — tiny for the MXU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .. import lie


class PoseGraphProblem(NamedTuple):
    """Sim3 pose-graph with relative constraints.

    poses:      Sim3 batch (K,) — current (e.g. drift-corrupted) estimates.
    edge_i/j:   (E,) int32 endpoints.
    edge_rel:   Sim3 batch (E,) — measured relative S_ji (pose j expressed
                relative to i): residual = Log(S_rel * S_i * S_j^-1).
    edge_weight:(E,) float — information scale per edge.
    edge_valid: (E,) bool.
    fixed:      (K,) bool — anchored keyframes (e.g. loop KF).
    """

    poses: lie.Sim3
    edge_i: jnp.ndarray
    edge_j: jnp.ndarray
    edge_rel: lie.Sim3
    edge_weight: jnp.ndarray
    edge_valid: jnp.ndarray
    fixed: jnp.ndarray


def _edge_residual(rel: lie.Sim3, Si: lie.Sim3, Sj: lie.Sim3,
                   xi_i: jnp.ndarray, xi_j: jnp.ndarray,
                   right: bool = False) -> jnp.ndarray:
    """7-dim residual with tangent perturbations.

    Left-multiplicative (camera-frame) by default; `right=True` perturbs on
    the world side (S o exp(xi)) so tangent axes align with world axes —
    required for the 4-DoF mode, whose yaw axis is the world gravity axis.
    """
    if right:
        Si_p = lie.sim3_compose(Si, lie.sim3_exp(xi_i))
        Sj_p = lie.sim3_compose(Sj, lie.sim3_exp(xi_j))
    else:
        Si_p = lie.sim3_compose(lie.sim3_exp(xi_i), Si)
        Sj_p = lie.sim3_compose(lie.sim3_exp(xi_j), Sj)
    err = lie.sim3_compose(rel, lie.sim3_compose(
        Si_p, lie.sim3_inverse(Sj_p)))
    return lie.sim3_log(err)


# tangent layout [v(3), w(3), sigma]: 4-DoF keeps translation + yaw about
# the world z (gravity) axis, freezing roll/pitch/scale — the directions an
# initialized IMU makes observable (reference OptimizeEssentialGraph4DoF,
# optimizer.cc:5161, VertexPose4DoF/Edge4DoF g2o_types.h:152/773)
_MASK_4DOF = (1.0, 1.0, 1.0, 0.0, 0.0, 1.0, 0.0)


@functools.partial(jax.jit, static_argnames=("iters", "four_dof"))
def optimize_pose_graph(prob: PoseGraphProblem, iters: int = 20,
                        four_dof: bool = False
                        ) -> Tuple[lie.Sim3, jnp.ndarray]:
    """Gauss-Newton pose-graph optimization. Returns (poses, costs)."""
    K = prob.poses.s.shape[0]
    E = prob.edge_i.shape[0]
    dtype = prob.poses.t.dtype
    dof_mask = (jnp.asarray(_MASK_4DOF, dtype) if four_dof
                else jnp.ones(7, dtype))

    def all_residuals(poses):
        Si = lie.Sim3(poses.s[prob.edge_i], poses.R[prob.edge_i],
                      poses.t[prob.edge_i])
        Sj = lie.Sim3(poses.s[prob.edge_j], poses.R[prob.edge_j],
                      poses.t[prob.edge_j])
        r = jax.vmap(lambda rel, si, sj: _edge_residual(
            rel, si, sj, jnp.zeros(7, dtype), jnp.zeros(7, dtype),
            right=four_dof))(prob.edge_rel, Si, Sj)
        return r

    def gn_step(poses, lam):
        Si = lie.Sim3(poses.s[prob.edge_i], poses.R[prob.edge_i],
                      poses.t[prob.edge_i])
        Sj = lie.Sim3(poses.s[prob.edge_j], poses.R[prob.edge_j],
                      poses.t[prob.edge_j])

        def res_ij(rel, si, sj, xi2):
            xi2 = xi2 * jnp.concatenate([dof_mask, dof_mask])
            return _edge_residual(rel, si, sj, xi2[:7], xi2[7:],
                                  right=four_dof)

        r = jax.vmap(lambda rel, si, sj: res_ij(rel, si, sj,
                                                jnp.zeros(14, dtype)))(
            prob.edge_rel, Si, Sj)
        J = jax.vmap(lambda rel, si, sj: jax.jacfwd(
            lambda xi2: res_ij(rel, si, sj, xi2))(jnp.zeros(14, dtype)))(
            prob.edge_rel, Si, Sj)                   # (E,7,14)
        w = jnp.where(prob.edge_valid, prob.edge_weight, 0.0).astype(dtype)

        Ji = J[:, :, :7]
        Jj = J[:, :, 7:]
        Hii = jnp.einsum("eri,e,erj->eij", Ji, w, Ji)
        Hjj = jnp.einsum("eri,e,erj->eij", Jj, w, Jj)
        Hij = jnp.einsum("eri,e,erj->eij", Ji, w, Jj)
        gi = jnp.einsum("eri,e,er->ei", Ji, w, r)
        gj = jnp.einsum("eri,e,er->ei", Jj, w, r)

        Hd = jnp.zeros((K, K, 7, 7), dtype)
        Hd = Hd.at[prob.edge_i, prob.edge_i].add(Hii)
        Hd = Hd.at[prob.edge_j, prob.edge_j].add(Hjj)
        Hd = Hd.at[prob.edge_i, prob.edge_j].add(Hij)
        Hd = Hd.at[prob.edge_j, prob.edge_i].add(
            jnp.swapaxes(Hij, -1, -2))
        g = jnp.zeros((K, 7), dtype)
        g = g.at[prob.edge_i].add(gi)
        g = g.at[prob.edge_j].add(gj)

        eye7 = jnp.eye(7, dtype=dtype)
        fx = prob.fixed
        Hd = jnp.where(fx[:, None, None, None] | fx[None, :, None, None],
                       0.0, Hd)
        Hd = Hd.at[jnp.arange(K), jnp.arange(K)].add(
            jnp.where(fx[:, None, None], eye7, 0.0))
        g = jnp.where(fx[:, None], 0.0, g)

        H = jnp.transpose(Hd, (0, 2, 1, 3)).reshape(K * 7, K * 7)
        H = H + jnp.diag(lam * jnp.diag(H) + 1e-8)
        dx = -jax.scipy.linalg.solve(H, g.reshape(-1), assume_a="pos")
        dx = dx.reshape(K, 7)
        dx = jnp.where(fx[:, None], 0.0, dx) * dof_mask
        if four_dof:
            return lie.sim3_compose(poses, lie.sim3_exp(dx))
        return lie.sim3_compose(lie.sim3_exp(dx), poses)

    def cost(poses):
        r = all_residuals(poses)
        w = jnp.where(prob.edge_valid, prob.edge_weight, 0.0)
        return jnp.sum(w * jnp.sum(r * r, axis=-1))

    def body(carry, _):
        poses, lam = carry
        c0 = cost(poses)
        cand = gn_step(poses, lam)
        c1 = cost(cand)
        ok = (c1 < c0) & jnp.all(jnp.isfinite(cand.t)) \
            & jnp.all(jnp.isfinite(cand.s))
        poses = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), cand, poses)
        lam = jnp.where(ok, jnp.maximum(lam * 0.3, 1e-9),
                        jnp.minimum(lam * 5.0, 1e5))
        return (poses, lam), c1

    (poses, _), costs = jax.lax.scan(
        body, (prob.poses, jnp.asarray(1e-6, dtype)), None, length=iters)
    # renormalize rotations after repeated composition
    poses = lie.Sim3(poses.s, lie.so3_normalize(poses.R), poses.t)
    return poses, costs
