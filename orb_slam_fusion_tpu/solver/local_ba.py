"""Windowed local bundle adjustment as ONE device program.

Reference: Optimizer::LocalBundleAdjustment (optimizer.cc:1053) as invoked
per keyframe by LocalMapping::Run. The host tracker used to assemble the
problem with several separate dispatches (observation flattening, host-side
landmark grouping, BA run, four write-back updates); through the remote-TPU
tunnel each dispatch pays a full round trip. This module fuses problem
build -> two-phase robust LM -> map write-back into a single jitted call:
the window indices and fixed mask are the only host-produced inputs.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .. import cameras, lie
from ..map import map_state as ms
from . import ba


@functools.partial(
    jax.jit,
    static_argnames=("cam_model", "iters_first", "iters_second"),
)
def local_ba_step(
    m: ms.MapState,
    window: jnp.ndarray,          # (W,) keyframe rows, -1 padded
    fixed: jnp.ndarray,           # (W,) bool — poses held constant
    inv_sigma2_table: jnp.ndarray,  # (L,) per-octave information
    cam_params: jnp.ndarray,
    kf_uright: jnp.ndarray = None,  # (K, F) right-u table or None (mono)
    bf: float = 0.0,
    cam_model: str = cameras.PINHOLE,
    iters_first: int = 5,
    iters_second: int = 10,
) -> Tuple[ms.MapState, jnp.ndarray, jnp.ndarray]:
    """Run local BA over `window` and write results back into the map.

    Returns (updated map, costs, n_edges). Outlier observations (by the
    final chi2 classification) are unbound from their keyframes, matching
    the reference's erase of high-chi2 edges after local BA
    (optimizer.cc:1250-1297).
    """
    W = window.shape[0]
    F = m.n_feat
    L = inv_sigma2_table.shape[0]

    kf_idx, mp_idx, uv, octv, valid = ms.observation_triples(m, window)
    inv_s2 = inv_sigma2_table[jnp.clip(octv, 0, L - 1)]

    wclip = jnp.clip(window, 0, m.max_kf - 1)
    poses = lie.SE3(m.kf_pose.R[wclip], m.kf_pose.t[wclip])

    stereo_kwargs = {}
    if kf_uright is not None:
        ur = kf_uright[wclip].reshape(-1)
        stereo_kwargs = dict(u_right=ur, stereo_mask=valid & (ur > 0), bf=bf)

    prob = ba.make_window_problem(
        poses, m.mp_pos, kf_idx, mp_idx, uv, inv_s2, valid,
        fixed | (window < 0), cam_params, window_size=W,
        fixed_point=~m.mp_valid, **stereo_kwargs)
    new_poses, new_points, inlier, costs = ba.bundle_adjustment(
        prob, cam_model=cam_model, iters_first=iters_first,
        iters_second=iters_second, window_layout=True)

    # ---- write back: window poses, landmark positions, outlier unbinding.
    # Padded window slots are routed to an out-of-bounds row and dropped —
    # a clipped index would collide with row 0 when it is in the window.
    win_ok = window >= 0
    widx = jnp.where(win_ok, wclip, m.max_kf)
    kf_R = m.kf_pose.R.at[widx].set(new_poses.R, mode="drop")
    kf_t = m.kf_pose.t.at[widx].set(new_poses.t, mode="drop")
    drop = (valid & ~inlier).reshape(W, F)
    kfo = m.kf_obs_mp.at[widx].set(
        jnp.where(drop, -1, m.kf_obs_mp[wclip]), mode="drop")
    new_map = m._replace(
        kf_pose=lie.SE3(kf_R, kf_t),
        mp_pos=jnp.where(m.mp_valid[:, None], new_points, m.mp_pos),
        kf_obs_mp=kfo,
    )
    n_edges = jnp.sum(valid.astype(jnp.int32))
    return new_map, costs, n_edges
