"""Pallas TPU kernel: fused masked Hamming matching.

The dense matcher (matcher.search_by_projection) materializes the full
(M, N) distance matrix plus masks in HBM (~35 MB per call at production
sizes) before the argmin. This kernel streams the computation: each grid
step computes one M-tile of distances in VMEM and reduces to per-row
(best index, best distance, second distance) — the only HBM traffic is the
O(M + N) inputs and O(M) outputs.

Hardware lessons baked in (learned on a real chip):
* every operand/output is 2-D — Mosaic rejects 1-D integer operands whose
  XLA tiling disagrees with its own;
* the Hamming distance accumulates over the 8 descriptor words in a
  static loop of 2-D (TILE_M, N) XOR+popcount steps — the one-shot
  (TILE_M, N, 8) intermediate would exceed VMEM;
* keypoint attributes arrive pre-transposed ((2, N) positions, (8, N)
  descriptors) so every broadcast is row x column without relayouts;
* mixed None+slice indexing lowers to an unsupported gather — slice
  first, expand dims second;
* validity masks are folded into geometry (invalid map point => negative
  radius; invalid keypoint => position at 1e9) so no boolean operands
  cross the kernel boundary.

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


def _match_kernel(uvr_ref, mp_desc_ref, kp_uvT_ref, kp_descT_ref,
                  best_idx_ref, best_ref, second_ref):
    """One grid step handles a TILE_M slice of map points vs ALL keypoints."""
    tile_m = uvr_ref.shape[0]
    n = kp_uvT_ref.shape[1]

    # Hamming distance accumulated word-by-word in 2-D tiles
    dist = jnp.zeros((tile_m, n), jnp.int32)
    for wrd in range(8):
        d1w = mp_desc_ref[:, wrd:wrd + 1]        # (TILE_M, 1) uint32
        d2w = kp_descT_ref[wrd:wrd + 1, :]       # (1, N) uint32
        dist += jax.lax.population_count(
            jnp.bitwise_xor(d1w, d2w)).astype(jnp.int32)

    # spatial window: uvr = [u, v, radius, predicted_octave]; invalid map
    # points carry radius < 0 (empty window), invalid keypoints sit at 1e9
    # (outside all). Row 2 of kp_uvT is the keypoint octave; the pairwise
    # octave gate (reference SearchByProjection level window) accepts
    # |octave difference| <= 1. A map point with predicted octave < 0
    # disables its gate (legacy scale-free callers pass -1e4).
    uvr = uvr_ref[:]                             # (TILE_M, 4)
    du = uvr[:, 0:1] - kp_uvT_ref[0:1, :]        # (TILE_M, N)
    dv = uvr[:, 1:2] - kp_uvT_ref[1:2, :]
    d2px = du * du + dv * dv
    r = uvr[:, 2:3]
    ok = d2px <= r * jnp.abs(r)                  # r<0 -> -r^2 -> all false
    mp_oct = uvr[:, 3:4]
    doct = jnp.abs(mp_oct - kp_uvT_ref[2:3, :])
    ok = ok & ((doct <= 1.5) | (mp_oct < 0.0))
    # Mosaic's argmin lowering supports float32 only; distances are small
    # integers (<= 2048) so the cast is exact.
    distf = jnp.where(ok, dist, jnp.int32(BIG)).astype(jnp.float32)

    # lane-direction reductions with keepdims (Mosaic-native pattern)
    best_idx = jnp.argmin(distf, axis=1, keepdims=True).astype(jnp.int32)
    best = jnp.min(distf, axis=1, keepdims=True)
    cols = jax.lax.broadcasted_iota(jnp.int32, distf.shape, 1)
    dist2 = jnp.where(cols == best_idx, jnp.float32(BIG), distf)
    second = jnp.min(dist2, axis=1, keepdims=True)

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
    mp_octave: jnp.ndarray | None = None,   # (M,) predicted octave (f32/i32)
    kp_octave: jnp.ndarray | None = None,   # (N,) keypoint octave
    tile_m: int = 512,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (best_idx (M,), best (M,), second (M,)) — BIG where masked.

    When mp_octave/kp_octave are given, pairs with |octave diff| > 1 are
    masked (reference SearchByProjection level window, orb_matcher.cc:42+).
    """
    M = pred_uv.shape[0]
    N = kp_uv.shape[0]
    pad = (-M) % tile_m
    # fold masks into geometry (see module docstring)
    r_eff = jnp.where(mp_valid, jnp.asarray(radius, jnp.float32), -1.0)
    if mp_octave is None:
        mp_oct = jnp.full((M, 1), -1e4, pred_uv.dtype)   # gate disabled
    else:
        mp_oct = mp_octave.astype(pred_uv.dtype)[:, None]
    uvr = jnp.concatenate([pred_uv, r_eff[:, None], mp_oct], axis=-1)
    kp_oct = (jnp.zeros(N, pred_uv.dtype) if kp_octave is None
              else kp_octave.astype(pred_uv.dtype))
    # keypoint attribute block padded to 8 rows: the native TPU tile is
    # (8, 128) — a 3-row operand leaves Mosaic to invent a sublane layout
    # (2-row worked by luck on hardware; keep this one aligned)
    kp_uvT = jnp.concatenate(
        [jnp.where(kp_valid[None, :], kp_uv.T, 1e9),
         kp_oct[None, :],
         jnp.zeros((5, N), pred_uv.dtype)], axis=0)       # (8, N)
    kp_descT = kp_desc.T                                  # (8, N)
    if pad:
        uvr = jnp.pad(uvr, ((0, pad), (0, 0)), constant_values=-1.0)
        mp_desc = jnp.pad(mp_desc, ((0, pad), (0, 0)))
    Mp = uvr.shape[0]
    grid = (Mp // tile_m,)

    out_shape = tuple(
        jax.ShapeDtypeStruct((Mp, 1), jnp.int32) for _ in range(3))
    out_spec = pl.BlockSpec((tile_m, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    row4_spec = pl.BlockSpec((tile_m, 4), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    row8_spec = pl.BlockSpec((tile_m, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(shape, lambda i: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)

    best_idx, best, second = pl.pallas_call(
        _match_kernel,
        grid=grid,
        in_specs=[row4_spec, row8_spec, full(8, N), full(8, N)],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=out_shape,
        interpret=interpret,
    )(uvr, mp_desc, kp_uvT, kp_descT)
    return best_idx[:M, 0], best[:M, 0], second[:M, 0]


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
