"""FAST-9 corner detection, fully vectorized.

Reference semantics: per-cell cv::FAST with threshold 20 and fallback 7
(src/cam/orb_feature/orb_extractor.cc:744-849). Instead of scanning cells,
the TPU formulation evaluates the segment test for EVERY pixel at once:

* the 16 Bresenham-circle neighbours are 16 rolled copies of the image
  (cheap VPU shifts of a dense array, kept as separate 2-D values so XLA
  fuses the whole detector into a few passes);
* the corner score IS the arc test: OpenCV's cornerScore — the largest
  threshold at which the pixel remains a corner, i.e. the max over the 16
  contiguous 9-arcs of the arc's weakest exceedance, computed by a
  doubling sliding-window minimum. score > t replaces any separate
  "9 contiguous brighter/darker" check, and one map serves both of the
  reference's thresholds;
* non-max suppression is a 3x3 reduce_window max comparison (the same
  ranking cv::FAST's NMS applies, so the surviving corner set matches
  OpenCV's — golden-tested in tests/test_golden_opencv.py).

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


def corner_score(img: jnp.ndarray, border: int = 3) -> jnp.ndarray:
    """FAST-9 corner score for every pixel (threshold-independent).

    OpenCV cornerScore semantics: the score is the LARGEST threshold at
    which the pixel is still a FAST-9 corner — max over the 16 contiguous
    9-arcs of the arc's weakest exceedance (cv::cornerScore<16> in
    fast.cpp; the reference inherits it through cv::FAST). A pixel is a
    corner at threshold t iff score > t, so the arc test needs no separate
    pass and one score map serves every threshold.
    """
    h, w = img.shape
    # Everything stays 2-D (H, W): stacked-axis rolls defeat XLA fusion,
    # while a flat expression DAG of 2-D elementwise ops compiles to a
    # handful of VPU passes. Circular sliding-window minimum over the 16
    # ring offsets by doubling: min9 = min(min8, d[k+8]), min8 from two
    # min4s, etc. — 4 min-levels instead of 8 sequential mins.
    diff = [jnp.roll(img, (-dy, -dx), axis=(0, 1)) - img
            for dy, dx in RING_OFFSETS]     # 16 x (H, W)

    def arc_score(d):
        m2 = [jnp.minimum(d[k], d[(k + 1) % 16]) for k in range(16)]
        m4 = [jnp.minimum(m2[k], m2[(k + 2) % 16]) for k in range(16)]
        m8 = [jnp.minimum(m4[k], m4[(k + 4) % 16]) for k in range(16)]
        m9 = [jnp.minimum(m8[k], d[(k + 8) % 16]) for k in range(16)]
        out = m9[0]
        for k in range(1, 16):
            out = jnp.maximum(out, m9[k])
        return out

    score = jnp.maximum(arc_score(diff), arc_score([-d for d in diff]))

    # Zero the border (ring reads wrap around otherwise).
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inb = ((ys >= border) & (ys < h - border) &
           (xs >= border) & (xs < w - border))
    return jnp.where(inb, score, 0.0)


def fast_score_map(img: jnp.ndarray, threshold: float,
                   border: int = 3) -> jnp.ndarray:
    """FAST-9 corner response for every pixel; 0 where not a corner.

    img: (H, W) float32 grayscale (0..255 scale).
    """
    score = corner_score(img, border)
    return jnp.where(score > threshold, score, 0.0)


def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Keep only 3x3 local maxima (ties broken towards keeping)."""
    m = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    return jnp.where(score >= m, score, 0.0)


def detect(img: jnp.ndarray, threshold_high: float = 20.0,
           threshold_low: float = 7.0, border: int = 3) -> jnp.ndarray:
    """Two-threshold FAST with per-pixel fallback.

    The reference re-runs FAST at threshold 7 in cells where threshold 20
    found nothing (orb_extractor.cc:789-797). The batched equivalent: the
    corner score is threshold-independent (max threshold at which the pixel
    stays a corner), so ONE score map serves both thresholds; the selection
    stage prefers high-threshold corners by boosting their score so
    low-threshold ones only fill otherwise-empty cells.
    """
    score = corner_score(img, border)
    hi = score > threshold_high
    lo = score > threshold_low
    combined = jnp.where(hi, score + 1e4, jnp.where(lo, score, 0.0))
    return nms3x3(combined)
