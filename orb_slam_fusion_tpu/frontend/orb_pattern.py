"""Deterministic rBRIEF sampling pattern.

The reference embeds the learned 256-pair pattern from the original ORB paper
as a static table (src/cam/orb_feature/orb_extractor.cc:103-466). This build
generates its own deterministic pattern instead of copying that table: 256
point pairs drawn from an isotropic Gaussian (sigma = patch/5, the BRIEF
recommendation), clipped to the radius-13 disc, from a fixed seed. The
pattern is an internal convention — descriptors only ever match against
descriptors produced by this same pattern, so any well-spread pattern works;
what matters for matching quality is the Gaussian spread and the disc
clipping, both preserved here.
"""

from __future__ import annotations

import numpy as np

PATCH_RADIUS = 15          # half patch (patch = 31x31), reference HALF_PATCH_SIZE
PATTERN_RADIUS = 13.0      # sampling points stay inside this disc
NUM_BITS = 256


def make_pattern(seed: int = 1234) -> np.ndarray:
    """Returns (256, 2, 2) float32: [bit, point(a/b), (dx, dy)]."""
    rng = np.random.RandomState(seed)
    pts = []
    sigma = 31.0 / 5.0
    while len(pts) < NUM_BITS * 2:
        p = rng.randn(2) * sigma
        if np.hypot(p[0], p[1]) <= PATTERN_RADIUS:
            pts.append(p)
    pat = np.asarray(pts[: NUM_BITS * 2], dtype=np.float32)
    return pat.reshape(NUM_BITS, 2, 2)


PATTERN = make_pattern()
