"""Pallas TPU kernel: fused masked Hamming matching.

The dense matcher (matcher.search_by_projection) materializes the full
(M, N) distance matrix plus masks in HBM (~35 MB per call at production
sizes) before the argmin. This kernel streams the computation: descriptors
and keypoint attributes stay in VMEM, each grid step computes one M-tile of
distances in VMEM scratch, applies the spatial/validity predicates inline,
and reduces to per-row (best index, best distance, second distance) — the
only HBM traffic is the O(M + N) inputs and O(M) outputs.

Falls back to the dense XLA path off-TPU (the `interpret=True` mode is used
by the CPU tests for bit-exact parity).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1 << 14  # sentinel distance (python int: pallas kernels must not
# capture traced module-level constants)


def _match_kernel(pred_uv_ref, mp_desc_ref, mp_valid_ref, radius_ref,
                  kp_uv_ref, kp_desc_ref, kp_valid_ref,
                  best_idx_ref, best_ref, second_ref):
    """One grid step handles a TILE_M slice of map points vs ALL keypoints."""
    # (TILE_M, 8) x (N, 8) -> (TILE_M, N) hamming distances
    d1 = mp_desc_ref[:]                       # (TILE_M, 8) uint32
    d2 = kp_desc_ref[:]                       # (N, 8) uint32
    x = jnp.bitwise_xor(d1[:, None, :], d2[None, :, :])
    dist = jnp.sum(jax.lax.population_count(x).astype(jnp.int32), axis=-1)

    # spatial window + validity predicates. NOTE: all dim insertions happen
    # on 32-bit values — Mosaic cannot relayout i1 (bool) across a new
    # minor dimension.
    duv = pred_uv_ref[:][:, None, :] - kp_uv_ref[:][None, :, :]
    d2px = jnp.sum(duv * duv, axis=-1)
    r = radius_ref[:]
    mv = mp_valid_ref[:][:, None]        # int32 (TILE_M, 1)
    kv = kp_valid_ref[:][None, :]        # int32 (1, N)
    ok = (d2px <= (r * r)[:, None]) & (mv > 0) & (kv > 0)
    # Mosaic's argmin lowering supports float32 only; distances are small
    # integers (<= 2048) so the cast is exact.
    distf = jnp.where(ok, dist, jnp.int32(BIG)).astype(jnp.float32)

    best_idx = jnp.argmin(distf, axis=1).astype(jnp.int32)
    best = jnp.min(distf, axis=1)
    # mask out the winner column to get the runner-up
    cols = jax.lax.broadcasted_iota(jnp.int32, distf.shape, 1)
    dist2 = jnp.where(cols == best_idx[:, None], jnp.float32(BIG), distf)
    second = jnp.min(dist2, axis=1)

    best_idx_ref[:] = best_idx
    best_ref[:] = best.astype(jnp.int32)
    second_ref[:] = second.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def masked_match_pallas(
    pred_uv: jnp.ndarray,    # (M,2) f32 projected positions
    mp_desc: jnp.ndarray,    # (M,8) uint32
    mp_valid: jnp.ndarray,   # (M,) bool
    radius: jnp.ndarray,     # (M,) f32 per-point search radius
    kp_uv: jnp.ndarray,      # (N,2) f32
    kp_desc: jnp.ndarray,    # (N,8) uint32
    kp_valid: jnp.ndarray,   # (N,) bool
    tile_m: int = 1024,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (best_idx (M,), best (M,), second (M,)) — BIG where masked."""
    M = pred_uv.shape[0]
    N = kp_uv.shape[0]
    pad = (-M) % tile_m
    if pad:
        pred_uv = jnp.pad(pred_uv, ((0, pad), (0, 0)))
        mp_desc = jnp.pad(mp_desc, ((0, pad), (0, 0)))
        mp_valid = jnp.pad(mp_valid, (0, pad))
        radius = jnp.pad(radius, (0, pad))
    Mp = pred_uv.shape[0]
    grid = (Mp // tile_m,)

    mvalid = mp_valid.astype(jnp.int32)
    kvalid = kp_valid.astype(jnp.int32)

    out_shape = (
        jax.ShapeDtypeStruct((Mp,), jnp.int32),
        jax.ShapeDtypeStruct((Mp,), jnp.int32),
        jax.ShapeDtypeStruct((Mp,), jnp.int32),
    )
    row_spec = pl.BlockSpec((tile_m,), lambda i: (i,),
                            memory_space=pltpu.VMEM)
    row2_spec = pl.BlockSpec((tile_m, 2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    row8_spec = pl.BlockSpec((tile_m, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(shape, lambda i: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)

    best_idx, best, second = pl.pallas_call(
        _match_kernel,
        grid=grid,
        in_specs=[row2_spec, row8_spec, row_spec, row_spec,
                  full(N, 2), full(N, 8), full(N)],
        out_specs=(row_spec, row_spec, row_spec),
        out_shape=out_shape,
        interpret=interpret,
    )(pred_uv, mp_desc, mvalid, radius, kp_uv, kp_desc, kvalid)
    return best_idx[:M], best[:M], second[:M]


def search_by_projection_pallas(
    pred_uv, mp_desc, mp_valid, kp_uv, kp_desc, kp_valid,
    radius, max_dist: int = 100, ratio: float = 0.9,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for matcher.search_by_projection (octave window folded into
    the validity masks by the caller when needed)."""
    r = jnp.asarray(radius, jnp.float32)
    if r.ndim == 0:
        r = jnp.broadcast_to(r, (pred_uv.shape[0],))
    idx, best, second = masked_match_pallas(
        pred_uv, mp_desc, mp_valid, r, kp_uv, kp_desc, kp_valid,
        interpret=interpret)
    ok = (best <= max_dist) & (
        best.astype(jnp.float32) <= ratio * second.astype(jnp.float32))
    return jnp.where(ok, idx, -1).astype(jnp.int32), ok
