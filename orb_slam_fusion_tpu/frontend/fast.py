"""FAST-9 corner detection, fully vectorized.

Reference semantics: per-cell cv::FAST with threshold 20 and fallback 7
(src/cam/orb_feature/orb_extractor.cc:744-849). Instead of scanning cells,
the TPU formulation evaluates the segment test for EVERY pixel at once:

* the 16 Bresenham-circle neighbours are materialized as 16 rolled copies of
  the image (cheap VPU shifts of a dense array);
* "9 contiguous brighter/darker" is a bit-trick: build a 16-bit mask per
  pixel, duplicate it to 32 bits, and AND together 9 consecutive shifts —
  any surviving bit means a valid arc;
* the corner score is the sum of absolute differences over the brighter
  (resp. darker) ring pixels — the same quantity the reference's quad-tree
  uses for ranking (via cv::FAST response);
* non-max suppression is a 3x3 reduce_window max comparison.

Everything stays (H, W)-shaped; downstream selection handles sparsification.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3 (standard FAST-16 ring, clockwise, as
# (dy, dx) offsets from the center pixel).
RING_OFFSETS = (
    (0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2), (1, -3),
    (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0), (-3, 1), (-2, 2), (-1, 3),
)

ARC_LENGTH = 9  # FAST-9: at least 9 contiguous ring pixels


def _ring_stack(img: jnp.ndarray) -> jnp.ndarray:
    """(16, H, W) rolled copies; ring pixel (dy,dx) at each center."""
    return jnp.stack(
        [jnp.roll(img, (-dy, -dx), axis=(0, 1)) for dy, dx in RING_OFFSETS])


def _has_arc(mask16: jnp.ndarray) -> jnp.ndarray:
    """mask16: (16, H, W) bool -> (H, W) bool: any >=ARC_LENGTH circular run.

    Bit-packed: the 16 comparisons collapse into one (H, W) uint32 word per
    pixel, the word is duplicated into the upper half to emulate the
    circular wrap, and ARC_LENGTH shifted copies are ANDed — all further
    traffic is (H, W)-sized instead of (16, H, W)-sized.
    """
    weights = (jnp.uint32(1) << jnp.arange(16, dtype=jnp.uint32))
    bits = jnp.sum(mask16.astype(jnp.uint32)
                   * weights[:, None, None], axis=0)          # (H, W)
    m = bits | (bits << 16)
    acc = m
    for k in range(1, ARC_LENGTH):
        acc = acc & (m >> k)
    return (acc & jnp.uint32(0xFFFF)) != 0


def fast_score_map(img: jnp.ndarray, threshold: float,
                   border: int = 3) -> jnp.ndarray:
    """FAST-9 corner response for every pixel; 0 where not a corner.

    img: (H, W) float32 grayscale (0..255 scale).
    Returns (H, W) float32 score map (SAD over the qualifying ring arc side).
    """
    h, w = img.shape
    ring = _ring_stack(img)                 # (16,H,W)
    diff = ring - img[None]                 # (16,H,W)
    return _score_from_diff(diff, threshold, h, w, border)


def _score_from_diff(diff: jnp.ndarray, threshold: float, h: int, w: int,
                     border: int) -> jnp.ndarray:
    brighter = diff > threshold
    darker = diff < -threshold

    is_corner = _has_arc(brighter) | _has_arc(darker)

    # Score: max of summed positive/negative exceedances (OpenCV-like).
    sc_b = jnp.sum(jnp.where(brighter, diff - threshold, 0.0), axis=0)
    sc_d = jnp.sum(jnp.where(darker, -diff - threshold, 0.0), axis=0)
    score = jnp.maximum(sc_b, sc_d)

    # Zero the border (ring reads wrap around otherwise).
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inb = ((ys >= border) & (ys < h - border) &
           (xs >= border) & (xs < w - border))
    return jnp.where(is_corner & inb, score, 0.0)


def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Keep only 3x3 local maxima (ties broken towards keeping)."""
    m = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    return jnp.where(score >= m, score, 0.0)


def detect(img: jnp.ndarray, threshold_high: float = 20.0,
           threshold_low: float = 7.0, border: int = 3) -> jnp.ndarray:
    """Two-threshold FAST with per-pixel fallback.

    The reference re-runs FAST at threshold 7 in cells where threshold 20
    found nothing (orb_extractor.cc:789-797). The batched equivalent: compute
    both maps; the selection stage prefers high-threshold corners by boosting
    their score so low-threshold ones only fill otherwise-empty cells.
    The ring stack and difference tensor are computed once and shared by
    both thresholds (the dominant HBM traffic of the detector).
    """
    h, w = img.shape
    ring = _ring_stack(img)
    diff = ring - img[None]
    hi = _score_from_diff(diff, threshold_high, h, w, border)
    lo = _score_from_diff(diff, threshold_low, h, w, border)
    # High-threshold corners dominate ranking; low-threshold ones keep a
    # small positive score so empty cells can still be filled.
    combined = jnp.where(hi > 0.0, hi + 1e4, lo)
    return nms3x3(combined)
