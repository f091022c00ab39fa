"""Image pyramid + Gaussian blur.

Reference semantics: OrbExtractor::ComputePyramid
(src/cam/orb_feature/orb_extractor.cc:1093-1117): L levels with scale factor
1.2, each level blurred with a 7x7 sigma=2 Gaussian before descriptor
sampling (orb_extractor.cc:1054-1060). Here levels have static shapes
computed at trace time and resize/blur are XLA convolutions on the VPU.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def level_shapes(h: int, w: int, num_levels: int, scale: float
                 ) -> List[Tuple[int, int]]:
    shapes = []
    for l in range(num_levels):
        inv = 1.0 / (scale ** l)
        shapes.append((max(16, int(round(h * inv))),
                       max(16, int(round(w * inv)))))
    return shapes


def _gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, sigma: float = 2.0,
                  radius: int = 3) -> jnp.ndarray:
    """Separable Gaussian blur of a (H, W) image (7x7 sigma=2 default).

    Implemented as 2*(2r+1) statically-shifted multiply-adds rather than a
    convolution: single-channel convs lower terribly on the MXU (the
    systolic array wants >=8 channels), while shifted adds are pure VPU
    streams — ~8x faster for this shape on real hardware.
    """
    k = _gaussian_kernel1d(sigma, radius)  # host-side constants
    h, w = img.shape
    x = jnp.pad(img, ((radius, radius), (0, 0)), mode="edge")
    out = k[0] * x[0:h]
    for i in range(1, 2 * radius + 1):
        out = out + k[i] * x[i:i + h]
    x = jnp.pad(out, ((0, 0), (radius, radius)), mode="edge")
    out = k[0] * x[:, 0:w]
    for i in range(1, 2 * radius + 1):
        out = out + k[i] * x[:, i:i + w]
    return out


def build_pyramid(img: jnp.ndarray, num_levels: int = 8,
                  scale: float = 1.2) -> List[jnp.ndarray]:
    """(H, W) float32 image -> list of per-level images (static shapes)."""
    h, w = img.shape
    shapes = level_shapes(h, w, num_levels, scale)
    levels = [img]
    for l in range(1, num_levels):
        # resize from previous level (progressive downscale, like the
        # reference's cv::resize chain) — bilinear.
        prev = levels[-1]
        levels.append(jax.image.resize(prev, shapes[l], method="bilinear"))
    return levels
