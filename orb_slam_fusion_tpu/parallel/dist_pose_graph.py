"""Distributed pose-graph optimization: edge-sharded Gauss-Newton.

Completes the distributed story of SURVEY §2.3 (sharded pose-graph
optimization next to the sharded Schur BA of dist_ba.py): after a loop
closure or cross-host atlas merge, the essential graph can hold tens of
thousands of relative-pose constraints; their residual/Jacobian evaluation
and Hessian assembly are embarrassingly parallel over edges.

Decomposition:

* **Edges shard** across mesh axis ``mp`` — each device evaluates E/D
  7-dim Sim3 residuals + (7x14) Jacobians and scatters its partial
  (K,K,7,7) Hessian and (K,7) gradient.
* **Poses replicate** — the dense (7K x 7K) Gauss-Newton system is
  `psum`-accumulated over the mesh and solved replicated (K is the number
  of keyframes; a few thousand at most).

The same mesh and collectives ride ICI within a slice and DCN across
slices under `jax.distributed`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .. import lie
from ..solver.pose_graph import PoseGraphProblem, _edge_residual


@functools.partial(jax.jit, static_argnames=("mesh", "iters", "four_dof"))
def _dist_pg_run(prob: PoseGraphProblem, mesh: Mesh, iters: int,
                 four_dof: bool):
    K = prob.poses.s.shape[0]
    dtype = prob.poses.t.dtype
    from ..solver.pose_graph import _MASK_4DOF
    dof_mask = (jnp.asarray(_MASK_4DOF, dtype) if four_dof
                else jnp.ones(7, dtype))
    e_spec = P("mp")
    rep = P()

    def assemble(poses, lam, edge_i, edge_j, rel, weight, valid):
        """Per-device: partial H, g, cost over the owned edge shard."""
        Si = lie.Sim3(poses.s[edge_i], poses.R[edge_i], poses.t[edge_i])
        Sj = lie.Sim3(poses.s[edge_j], poses.R[edge_j], poses.t[edge_j])

        def res_ij(rel1, si, sj, xi2):
            xi2 = xi2 * jnp.concatenate([dof_mask, dof_mask])
            return _edge_residual(rel1, si, sj, xi2[:7], xi2[7:],
                                  right=four_dof)

        zero14 = jnp.zeros(14, dtype)
        r = jax.vmap(lambda rel1, si, sj: res_ij(rel1, si, sj, zero14))(
            rel, Si, Sj)
        J = jax.vmap(lambda rel1, si, sj: jax.jacfwd(
            lambda xi2: res_ij(rel1, si, sj, xi2))(zero14))(rel, Si, Sj)
        w = jnp.where(valid, weight, 0.0).astype(dtype)

        Ji, Jj = J[:, :, :7], J[:, :, 7:]
        Hii = jnp.einsum("eri,e,erj->eij", Ji, w, Ji)
        Hjj = jnp.einsum("eri,e,erj->eij", Jj, w, Jj)
        Hij = jnp.einsum("eri,e,erj->eij", Ji, w, Jj)
        gi = jnp.einsum("eri,e,er->ei", Ji, w, r)
        gj = jnp.einsum("eri,e,er->ei", Jj, w, r)

        Hd = jnp.zeros((K, K, 7, 7), dtype)
        Hd = Hd.at[edge_i, edge_i].add(Hii)
        Hd = Hd.at[edge_j, edge_j].add(Hjj)
        Hd = Hd.at[edge_i, edge_j].add(Hij)
        Hd = Hd.at[edge_j, edge_i].add(jnp.swapaxes(Hij, -1, -2))
        g = jnp.zeros((K, 7), dtype)
        g = g.at[edge_i].add(gi)
        g = g.at[edge_j].add(gj)
        cost = jnp.sum(w * jnp.sum(r * r, axis=-1))
        return (jax.lax.psum(Hd, "mp"), jax.lax.psum(g, "mp"),
                jax.lax.psum(cost, "mp"))

    def edge_cost(poses, edge_i, edge_j, rel, weight, valid):
        Si = lie.Sim3(poses.s[edge_i], poses.R[edge_i], poses.t[edge_i])
        Sj = lie.Sim3(poses.s[edge_j], poses.R[edge_j], poses.t[edge_j])
        r = jax.vmap(lambda rel1, si, sj: _edge_residual(
            rel1, si, sj, jnp.zeros(7, dtype), jnp.zeros(7, dtype),
            right=four_dof))(rel, Si, Sj)
        w = jnp.where(valid, weight, 0.0)
        return jax.lax.psum(jnp.sum(w * jnp.sum(r * r, axis=-1)), "mp")

    sharded_assemble = shard_map(
        assemble, mesh=mesh,
        in_specs=(rep, rep, e_spec, e_spec, e_spec, e_spec, e_spec),
        out_specs=(rep, rep, rep))
    sharded_cost = shard_map(
        edge_cost, mesh=mesh,
        in_specs=(rep, e_spec, e_spec, e_spec, e_spec, e_spec),
        out_specs=rep)

    def body(carry, _):
        poses, lam = carry
        Hd, g, c0 = sharded_assemble(
            poses, lam, prob.edge_i, prob.edge_j, prob.edge_rel,
            prob.edge_weight, prob.edge_valid)

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
            cand = lie.sim3_compose(poses, lie.sim3_exp(dx))
        else:
            cand = lie.sim3_compose(lie.sim3_exp(dx), poses)

        c1 = sharded_cost(cand, prob.edge_i, prob.edge_j, prob.edge_rel,
                          prob.edge_weight, prob.edge_valid)
        ok = (c1 < c0) & jnp.all(jnp.isfinite(cand.t)) \
            & jnp.all(jnp.isfinite(cand.s))
        poses = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), cand, poses)
        lam = jnp.where(ok, jnp.maximum(lam * 0.3, 1e-9),
                        jnp.minimum(lam * 5.0, 1e5))
        return (poses, lam), c1

    (poses, _), costs = jax.lax.scan(
        body, (prob.poses, jnp.asarray(1e-6, dtype)), None, length=iters)
    poses = lie.Sim3(poses.s, lie.so3_normalize(poses.R), poses.t)
    return poses, costs


def distributed_pose_graph(prob: PoseGraphProblem, mesh: Mesh,
                           iters: int = 20, four_dof: bool = False
                           ) -> Tuple[lie.Sim3, jnp.ndarray]:
    """Edge-sharded pose-graph GN over a device mesh.

    Pads the edge axis to a multiple of the mesh size (padded edges are
    invalid). Returns (poses, costs) — numerically identical to the
    single-device `optimize_pose_graph` up to fp reduction order.
    """
    D = mesh.shape["mp"]
    E = prob.edge_i.shape[0]
    pad = (-E) % D
    if pad:
        z = jnp.zeros(pad, jnp.int32)
        rel_pad = jax.tree_util.tree_map(
            lambda x: jnp.concatenate(
                [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])]),
            prob.edge_rel)
        prob = prob._replace(
            edge_i=jnp.concatenate([prob.edge_i, z]),
            edge_j=jnp.concatenate([prob.edge_j, z]),
            edge_rel=rel_pad,
            edge_weight=jnp.concatenate(
                [prob.edge_weight, jnp.zeros(pad, jnp.float32)]),
            edge_valid=jnp.concatenate(
                [prob.edge_valid, jnp.zeros(pad, bool)]),
        )
    return _dist_pg_run(prob, mesh, iters, four_dof)
