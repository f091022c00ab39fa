"""Distributed per-frame tracking: the map table sharded over the mesh.

The reference tracks against an in-memory map bounded by one machine's RAM
and one core's matching throughput (ORBmatcher::SearchByProjection +
PoseOptimization per frame, tracking.cc:2163/2255). Sharding the map-point
table over a device mesh removes that bound — "map size" becomes the
sequence-length analogue scaled over chips (SURVEY §5):

* **Map points shard** across mesh axis ``mp`` — each device owns M/D rows
  of the position/descriptor/counter tables and matches them against the
  (replicated, small) frame keypoints entirely locally: a map point's best
  keypoint depends only on its own row, so matching needs NO collective.
* **The pose replicates** — each Gauss-Newton iteration reduces the owned
  matches to a partial (H, g), one ``psum`` over the mesh yields the global
  normal equations, and every device applies the identical 6x6 solve and
  update (the classic data-parallel shape: local grads, collective,\
  replicated step).
* Per-frame collective traffic is `iters * (36 + 6 + 1)` floats — ICI
  round-trips, nothing else.

Semantically identical to the single-device fused step (engine/step.py
fused_frame_update's match-then-solve stages) up to float reduction order.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .. import cameras, lie
from ..frontend import matcher
from ..solver.robust import CHI2_2D, huber_weight


class DistFrameResult(NamedTuple):
    pose: lie.SE3            # optimized Tcw (replicated)
    match_idx: jnp.ndarray   # (M,) keypoint row per map point or -1
    inlier: jnp.ndarray      # (M,) bool
    mp_visible: jnp.ndarray  # (M,) updated counters
    mp_found: jnp.ndarray    # (M,) updated counters
    counts: jnp.ndarray      # (2,) [n_matches, n_inliers] (replicated)


def _pad_rows(x, mult, fill=0):
    pad = (-x.shape[0]) % mult
    if pad == 0:
        return x
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths, constant_values=fill)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "cam_model", "img_h", "img_w", "iters"),
)
def distributed_frame_update(
    mp_pos: jnp.ndarray,       # (M, 3) — M divisible by mesh size (padded)
    mp_desc: jnp.ndarray,      # (M, 8) uint32
    mp_valid: jnp.ndarray,     # (M,)
    mp_visible: jnp.ndarray,   # (M,) int32
    mp_found: jnp.ndarray,     # (M,) int32
    prev_pose: lie.SE3,
    pred_pose: lie.SE3,
    kp_uv: jnp.ndarray,        # (F, 2) replicated
    kp_desc: jnp.ndarray,      # (F, 8)
    kp_valid: jnp.ndarray,     # (F,)
    kp_inv_sigma2: jnp.ndarray,  # (F,)
    cam_params: jnp.ndarray,
    mesh: Mesh,
    cam_model: str = cameras.PINHOLE,
    img_h: int = 480,
    img_w: int = 752,
    radius_coarse: float = 15.0,
    radius_fine: float = 9.0,
    iters: int = 6,
) -> DistFrameResult:
    """One tracked frame against a mesh-sharded map point table."""
    dtype = mp_pos.dtype
    mp_spec = P("mp")
    rep = P()

    def local(mp_pos, mp_desc, mp_valid, mp_visible, mp_found):
        F = kp_uv.shape[0]

        def project(pose):
            pc = lie.se3_apply(pose, mp_pos)
            uv = cameras.project(cam_model, cam_params, pc)
            vis = (mp_valid & (pc[..., 2] > 0.05)
                   & (uv[..., 0] >= 0) & (uv[..., 0] < img_w)
                   & (uv[..., 1] >= 0) & (uv[..., 1] < img_h))
            return uv, vis

        dist = matcher.hamming_distance(mp_desc, kp_desc)  # (M/D, F)

        def match_at(uv_pred, vis, radius):
            d2 = jnp.sum((uv_pred[:, None, :] - kp_uv[None, :, :]) ** 2,
                         axis=-1)
            mask = (d2 <= radius * radius) & vis[:, None] & kp_valid[None, :]
            idx, best, second = matcher.masked_min2(dist, mask)
            ok = ((best <= matcher.TH_HIGH)
                  & (best.astype(jnp.float32)
                     <= matcher.RATIO * second.astype(jnp.float32)))
            return jnp.where(ok, idx, -1).astype(jnp.int32), ok

        def gn_solve(pose0, midx, mok, n_iters):
            """Replicated pose from psum-reduced normal equations."""
            midx_c = jnp.clip(midx, 0, F - 1)
            obs_uv = kp_uv[midx_c]
            w_info = kp_inv_sigma2[midx_c]

            def body(pose, _):
                pc = lie.se3_apply(pose, mp_pos)
                pred = cameras.project(cam_model, cam_params, pc)
                r = pred - obs_uv
                Jproj = cameras.project_jac(cam_model, cam_params, pc)
                Jpc = jnp.concatenate(
                    [jnp.broadcast_to(jnp.eye(3, dtype=dtype),
                                      pc.shape[:-1] + (3, 3)),
                     -lie.hat(pc)], axis=-1)
                J = jnp.einsum("nij,njk->nik", Jproj, Jpc)
                chi2 = jnp.sum(r * r, axis=-1) * w_info
                w = jnp.where(mok & (pc[..., 2] > 1e-4),
                              huber_weight(chi2, CHI2_2D) * w_info,
                              0.0).astype(dtype)
                H = jax.lax.psum(
                    jnp.einsum("nik,n,nil->kl", J, w, J), "mp")
                g = jax.lax.psum(
                    jnp.einsum("nik,n,ni->k", J, w, r), "mp")
                damped = H + 1e-5 * jnp.diag(jnp.diag(H)) \
                    + 1e-9 * jnp.eye(6, dtype=dtype)
                dx = -jax.scipy.linalg.solve(damped, g, assume_a="pos")
                new_pose = lie.se3_boxplus(pose, dx)
                ok = (jnp.all(jnp.isfinite(new_pose.t))
                      & jnp.all(jnp.isfinite(new_pose.R)))
                return jax.tree_util.tree_map(
                    lambda a, b: jnp.where(ok, a, b), new_pose, pose), None

            pose, _ = jax.lax.scan(body, pose0, None, length=n_iters)
            return pose

        # stage 1: coarse match at the prediction, solve from there
        uv1, vis1 = project(pred_pose)
        midx, mok = match_at(uv1, vis1, radius_coarse)
        pose1 = gn_solve(pred_pose, midx, mok, iters)

        # stage 2: fine re-match at the refined pose, anchored re-solve
        uv2, vis2 = project(pose1)
        midx, mok = match_at(uv2, vis2, radius_fine)
        n_match = jax.lax.psum(jnp.sum(mok.astype(jnp.int32)), "mp")
        pose2 = gn_solve(prev_pose, midx, mok, iters)

        def classify(pose, active):
            pc = lie.se3_apply(pose, mp_pos)
            pred = cameras.project(cam_model, cam_params, pc)
            midx_c = jnp.clip(midx, 0, F - 1)
            r = pred - kp_uv[midx_c]
            chi2 = jnp.sum(r * r, axis=-1) * kp_inv_sigma2[midx_c]
            return active & (chi2 <= CHI2_2D) & (pc[..., 2] > 1e-4)

        # chi2 outlier toggle + final round (the reference's between-round
        # re-classification, optimizer.cc:956-1027, collapsed to one toggle)
        inlier = classify(pose2, mok)
        pose2 = gn_solve(pose2, midx, inlier, iters // 2 + 1)
        inlier = classify(pose2, mok)
        n_in = jax.lax.psum(jnp.sum(inlier.astype(jnp.int32)), "mp")

        mp_visible = mp_visible + vis2.astype(jnp.int32)
        mp_found = mp_found + inlier.astype(jnp.int32)
        counts = jnp.stack([n_match, n_in])
        return (pose2.R, pose2.t, midx, inlier, mp_visible, mp_found,
                counts)

    R, t, midx, inlier, vis, found, counts = shard_map(
        local, mesh=mesh,
        in_specs=(mp_spec, mp_spec, mp_spec, mp_spec, mp_spec),
        out_specs=(rep, rep, mp_spec, mp_spec, mp_spec, mp_spec, rep),
    )(mp_pos, mp_desc, mp_valid, mp_visible, mp_found)

    return DistFrameResult(pose=lie.SE3(R, t), match_idx=midx,
                           inlier=inlier, mp_visible=vis, mp_found=found,
                           counts=counts)


def pad_map_for_mesh(mesh: Mesh, mp_pos, mp_desc, mp_valid,
                     mp_visible, mp_found
                     ) -> Tuple[jnp.ndarray, ...]:
    """Pad the map tables so the row count divides the mesh ('mp') size.

    Padded rows are invalid, so they are inert in matching and solving.
    """
    D = mesh.shape["mp"]
    return (_pad_rows(mp_pos, D), _pad_rows(mp_desc, D),
            _pad_rows(mp_valid, D, fill=False),
            _pad_rows(mp_visible, D), _pad_rows(mp_found, D))
