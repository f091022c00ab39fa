"""ORB extraction: spatially-uniform keypoint selection + oriented BRIEF.

Replaces OrbExtractor (src/cam/orb_feature/orb_extractor.cc). The reference's
quad-tree keypoint distribution (DistributeOctTree, orb_extractor.cc:542-743)
is a pointer-chasing recursion; the TPU-native equivalent with the same goal
(spatially uniform coverage with the strongest responses) is **per-cell
top-K selection**: the score map is tiled into fixed cells, the best K
corners of each cell are kept, then a global top-N by score fills the final
fixed-capacity slots. Orientation (IC angle over a circular patch,
orb_extractor.cc:76-101) and the 256-bit rotated BRIEF descriptor are
computed from batched 31x31 patch gathers — one `vmap`ped dynamic-slice per
keypoint, then pure VPU arithmetic.

Outputs are fixed capacity (`n_features` slots + validity mask) so every
downstream consumer compiles once.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import fast as fast_mod
from . import pyramid as pyr_mod
from .orb_pattern import PATCH_RADIUS, PATTERN


class OrbParams(NamedTuple):
    """Extraction configuration (static — part of the jit cache key)."""

    n_features: int = 1024
    num_levels: int = 8
    scale_factor: float = 1.2
    fast_threshold_high: float = 20.0
    fast_threshold_low: float = 7.0
    cell_size: int = 32          # selection cell in pixels
    per_cell_k: int = 4          # candidates kept per cell
    edge_margin: int = 19        # reference EDGE_THRESHOLD (descriptor border)
    # quadratic subpixel refinement of corner positions on the FAST score
    # map (the reference keeps integer keypoints, orb_extractor.cc — the
    # +-0.5 px quantization at level l is +-0.5*1.2^l px in level-0
    # coordinates, a dominant error source for the pixels-in path)
    subpixel: bool = False


class Features(NamedTuple):
    """Fixed-capacity feature set for one image.

    uv:      (N, 2) float32 — keypoint positions at full (level-0) resolution.
    response:(N,)  float32 — corner score.
    octave:  (N,)  int32   — pyramid level.
    angle:   (N,)  float32 — orientation in radians.
    desc:    (N, 8) uint32 — 256-bit descriptors packed into 8 words.
    valid:   (N,)  bool    — slot occupancy.
    """

    uv: jnp.ndarray
    response: jnp.ndarray
    octave: jnp.ndarray
    angle: jnp.ndarray
    desc: jnp.ndarray
    valid: jnp.ndarray


def features_per_level(n_features: int, num_levels: int,
                       scale_factor: float) -> Tuple[int, ...]:
    """Geometric budget per level (reference: orb_extractor.cc ctor).

    nfeatures * (1-f)/(1-f^L) * f^level with f = 1/scale.
    """
    f = 1.0 / scale_factor
    base = n_features * (1.0 - f) / (1.0 - f ** num_levels)
    per = [int(round(base * (f ** l))) for l in range(num_levels)]
    # fix rounding so totals match
    per[0] += n_features - sum(per)
    return tuple(per)


# ---------------------------------------------------------------------------
# Per-cell selection
# ---------------------------------------------------------------------------


def select_keypoints(score: jnp.ndarray, n_out: int, cell: int,
                     per_cell_k: int, margin: int
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pick up to n_out spatially-distributed maxima from a score map.

    Returns (yx (n_out, 2) int32, score (n_out,), valid (n_out,) bool).
    """
    h, w = score.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inb = ((ys >= margin) & (ys < h - margin) &
           (xs >= margin) & (xs < w - margin))
    score = jnp.where(inb, score, 0.0)

    ph = (-h) % cell
    pw = (-w) % cell
    sp = jnp.pad(score, ((0, ph), (0, pw)))
    hh, ww = sp.shape
    ncy, ncx = hh // cell, ww // cell
    cells = sp.reshape(ncy, cell, ncx, cell).transpose(0, 2, 1, 3)
    cells = cells.reshape(ncy * ncx, cell * cell)

    k = min(per_cell_k, cell * cell)
    top_v, top_i = jax.lax.top_k(cells, k)            # (C, k)
    cy = (jnp.arange(ncy * ncx) // ncx)[:, None]
    cx = (jnp.arange(ncy * ncx) % ncx)[:, None]
    yy = cy * cell + top_i // cell
    xx = cx * cell + top_i % cell

    cand_v = top_v.reshape(-1)
    cand_y = yy.reshape(-1)
    cand_x = xx.reshape(-1)

    n_cand = cand_v.shape[0]
    if n_cand < n_out:
        pad = n_out - n_cand
        cand_v = jnp.pad(cand_v, (0, pad))
        cand_y = jnp.pad(cand_y, (0, pad))
        cand_x = jnp.pad(cand_x, (0, pad))
    sel_v, sel_i = jax.lax.top_k(cand_v, n_out)
    sel_y = cand_y[sel_i]
    sel_x = cand_x[sel_i]
    valid = sel_v > 0.0
    return jnp.stack([sel_y, sel_x], axis=-1).astype(jnp.int32), sel_v, valid


# ---------------------------------------------------------------------------
# Orientation + descriptors from patches
# ---------------------------------------------------------------------------

def _circular_mask(radius: int = PATCH_RADIUS) -> np.ndarray:
    size = 2 * radius + 1
    yy, xx = np.mgrid[-radius: radius + 1, -radius: radius + 1]
    return (yy * yy + xx * xx <= radius * radius).astype(np.float32)


_UMAX_MASK = _circular_mask()


def gather_patches(img: jnp.ndarray, yx: jnp.ndarray,
                   radius: int = PATCH_RADIUS) -> jnp.ndarray:
    """Batched (2r+1)x(2r+1) patches around integer centers yx (N,2)."""
    size = 2 * radius + 1
    h, w = img.shape
    y0 = jnp.clip(yx[:, 0] - radius, 0, h - size)
    x0 = jnp.clip(yx[:, 1] - radius, 0, w - size)

    def one(y, x):
        return jax.lax.dynamic_slice(img, (y, x), (size, size))

    return jax.vmap(one)(y0, x0)  # (N, size, size)


def ic_angle(patches: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation per patch (N, S, S) -> (N,) radians.

    Reference: OrbExtractor IC_Angle (orb_extractor.cc:76-101): moments over
    a circular patch, angle = atan2(m01, m10).
    """
    size = patches.shape[-1]
    r = (size - 1) // 2
    coords = jnp.arange(size, dtype=patches.dtype) - r
    mask = jnp.asarray(_UMAX_MASK[:size, :size])
    wimg = patches * mask
    m10 = jnp.einsum("nyx,x->n", wimg, coords)
    m01 = jnp.einsum("nyx,y->n", wimg, coords)
    return jnp.arctan2(m01, m10)


BRIEF_ANGLE_BINS = 60  # 6-degree steering quantization (max error 3 deg,
# <1px displacement at the pattern's 13px radius; the reference's own
# rotation-consistency matching histogram uses 12-degree bins)


@functools.lru_cache(maxsize=8)
def _brief_selection(size: int, bins: int) -> np.ndarray:
    """(S*S, bins*256) int8 matrix turning flat patches into all-bin BRIEF
    differences: column (b*256+k) has +1 at pattern point 2k+1 and -1 at
    point 2k, both rotated by bin angle b and rounded to the nearest pixel
    (the reference's cvRound GET_VALUE convention)."""
    r = (size - 1) // 2
    pat = PATTERN.reshape(-1, 2).astype(np.float64)    # (512, 2) as (dx, dy)
    C = np.zeros((size * size, bins * 256), np.int8)
    for b in range(bins):
        ang = 2.0 * np.pi * b / bins
        ca, sa = np.cos(ang), np.sin(ang)
        ix = np.clip(np.round(ca * pat[:, 0] - sa * pat[:, 1]).astype(int)
                     + r, 0, size - 1)
        iy = np.clip(np.round(sa * pat[:, 0] + ca * pat[:, 1]).astype(int)
                     + r, 0, size - 1)
        flat = iy * size + ix                           # (512,)
        cols = b * 256 + np.arange(256)
        # descriptor bit k: patch[point 2k] < patch[point 2k+1]
        np.add.at(C, (flat[1::2], cols), 1)
        np.subtract.at(C, (flat[0::2], cols), 1)
    return C


def brief_descriptors(patches: jnp.ndarray, angles: jnp.ndarray
                      ) -> jnp.ndarray:
    """Rotation-steered BRIEF: (N,S,S) patches + (N,) angles -> (N,8) uint32.

    Reference semantics (orb_extractor.cc descriptor loop): rotate the 256
    point pairs of the static pattern by the keypoint angle, round to the
    nearest pixel, compare. A per-keypoint gather of 512 samples is the
    direct translation, but row-wise gathers are the slowest primitive on
    TPU (~5 ms for 1024 keypoints). Instead the comparison is linear in
    the pixels — bit_k = sign(p[b_k] - p[a_k]) — so all bits for ALL
    quantized steering angles come from ONE MXU matmul against a
    precomputed +-1 selection matrix, and each keypoint picks its angle
    bin with a one-hot contraction. 46 GFLOP of systolic-array work
    replaces 0.5M scattered loads (~15x faster end to end).
    """
    n, size = patches.shape[0], patches.shape[-1]
    C = jnp.asarray(_brief_selection(size, BRIEF_ANGLE_BINS))  # (S*S, B*256)
    flat = patches.reshape(n, -1)                       # (N, S*S)
    # HIGHEST precision: the default lowers to bfloat16 on TPU, whose ~0.4%
    # rounding on 0-255 pixels can flip bits on low-contrast comparisons
    # relative to the reference's exact integer compare
    diffs = jax.lax.dot(flat, C.astype(jnp.float32),
                        precision=jax.lax.Precision.HIGHEST)  # (N, B*256)
    bits_all = (diffs > 0).astype(jnp.float32).reshape(
        n, BRIEF_ANGLE_BINS, 256)
    # pick each keypoint's angle bin (nearest; wrap to [0, 2pi))
    two_pi = 2.0 * np.pi
    binf = jnp.mod(angles, two_pi) / two_pi * BRIEF_ANGLE_BINS
    bin_idx = jnp.mod(jnp.round(binf).astype(jnp.int32), BRIEF_ANGLE_BINS)
    onehot = jax.nn.one_hot(bin_idx, BRIEF_ANGLE_BINS, dtype=jnp.float32)
    bits = jnp.einsum("nbk,nb->nk", bits_all, onehot)   # (N, 256)
    bits = (bits > 0.5).astype(jnp.uint32).reshape(n, 8, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(bits * weights[None, None, :], axis=-1, dtype=jnp.uint32)


# ---------------------------------------------------------------------------
# Full extraction
# ---------------------------------------------------------------------------


def _harris_response(img: jnp.ndarray, k: float = 0.04) -> jnp.ndarray:
    """Dense Harris corner response det(M) - k tr(M)^2 with 3x3 Sobel
    gradients and 3x3 structure-tensor smoothing. The FAST score map is
    nonzero only at isolated pixels (the segment test fails on the
    neighbours of 95% of corners — measured), so subpixel interpolation
    must run on a response that is SMOOTH around the corner."""
    def shift(a, dy, dx):
        return jnp.roll(a, (dy, dx), axis=(0, 1))

    gx = (shift(img, 0, -1) - shift(img, 0, 1)) * 2.0 \
        + (shift(img, -1, -1) - shift(img, -1, 1)) \
        + (shift(img, 1, -1) - shift(img, 1, 1))
    gy = (shift(img, -1, 0) - shift(img, 1, 0)) * 2.0 \
        + (shift(img, -1, -1) - shift(img, 1, -1)) \
        + (shift(img, -1, 1) - shift(img, 1, 1))

    def box3(a):
        a = shift(a, -1, 0) + a + shift(a, 1, 0)
        return shift(a, 0, -1) + a + shift(a, 0, 1)

    sxx = box3(gx * gx)
    syy = box3(gy * gy)
    sxy = box3(gx * gy)
    return (sxx * syy - sxy * sxy) - k * (sxx + syy) ** 2


def _subpixel_offset(score: jnp.ndarray, yx: jnp.ndarray) -> jnp.ndarray:
    """(N, 2) (dx, dy) in [-0.5, 0.5]: per-axis parabola fit through a
    dense corner response at the corner and its 4-neighbours (standard
    quadratic peak interpolation). Keypoints are selected >= margin from
    the border, so the +-1 neighbourhood is always in bounds."""
    h, w = score.shape
    y = jnp.clip(yx[:, 0], 1, h - 2)
    x = jnp.clip(yx[:, 1], 1, w - 2)
    s0 = score[y, x]

    def axis_off(sm, sp):
        denom = sm - 2.0 * s0 + sp
        off = jnp.where(jnp.abs(denom) > 1e-6,
                        0.5 * (sm - sp) / denom, 0.0)
        # a non-peak center (denom >= 0) has no interpolable maximum
        return jnp.where(denom < 0, jnp.clip(off, -0.5, 0.5), 0.0)

    dx = axis_off(score[y, x - 1], score[y, x + 1])
    dy = axis_off(score[y - 1, x], score[y + 1, x])
    return jnp.stack([dx, dy], axis=-1)


@functools.partial(jax.jit, static_argnames=("params",))
def extract_features(img: jnp.ndarray, params: OrbParams = OrbParams()
                     ) -> Features:
    """Run the full ORB pipeline on one grayscale image (H, W) float32.

    Per level: FAST -> NMS -> per-cell top-K selection -> IC angle ->
    rotated BRIEF on the blurred level. Results from all levels are merged
    into the fixed `n_features` capacity (coordinates scaled to level 0).
    """
    levels = pyr_mod.build_pyramid(img, params.num_levels, params.scale_factor)
    budgets = features_per_level(params.n_features, params.num_levels,
                                 params.scale_factor)

    all_uv, all_resp, all_oct, all_ang, all_desc, all_valid = \
        [], [], [], [], [], []
    for l, (lvl_img, budget) in enumerate(zip(levels, budgets)):
        if budget == 0:
            continue
        scale = params.scale_factor ** l
        score = fast_mod.detect(lvl_img, params.fast_threshold_high,
                                params.fast_threshold_low)
        # margin: enough for the descriptor patch
        margin = PATCH_RADIUS + 1
        yx, resp, valid = select_keypoints(
            score, budget, params.cell_size, params.per_cell_k, margin)

        blurred = pyr_mod.gaussian_blur(lvl_img)
        patches = gather_patches(blurred, yx)
        ang = ic_angle(patches)
        desc = brief_descriptors(patches, ang)

        xy = jnp.stack([yx[:, 1].astype(jnp.float32),
                        yx[:, 0].astype(jnp.float32)], axis=-1)
        if params.subpixel:
            xy = xy + _subpixel_offset(_harris_response(lvl_img), yx)
        uv = xy * scale
        all_uv.append(uv)
        all_resp.append(resp)
        all_oct.append(jnp.full((budget,), l, dtype=jnp.int32))
        all_ang.append(ang)
        all_desc.append(desc)
        all_valid.append(valid)

    uv = jnp.concatenate(all_uv)[: params.n_features]
    resp = jnp.concatenate(all_resp)[: params.n_features]
    octv = jnp.concatenate(all_oct)[: params.n_features]
    ang = jnp.concatenate(all_ang)[: params.n_features]
    desc = jnp.concatenate(all_desc)[: params.n_features]
    valid = jnp.concatenate(all_valid)[: params.n_features]
    return Features(uv=uv, response=resp, octave=octv, angle=ang,
                    desc=desc, valid=valid)


def scale_sigma2(params: OrbParams) -> jnp.ndarray:
    """Per-octave sigma^2 (reference mvLevelSigma2): scale^(2*level)."""
    return jnp.asarray(
        [params.scale_factor ** (2 * l) for l in range(params.num_levels)],
        dtype=jnp.float32)


def inv_scale_sigma2(params: OrbParams) -> jnp.ndarray:
    return 1.0 / scale_sigma2(params)
