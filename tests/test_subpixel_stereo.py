"""Subpixel SAD disparity refinement (reference frame.cc:940+).

Golden-style check: the right image is the left image translated by a known
FRACTIONAL disparity (linear interpolation), the integer matcher estimate is
off by up to 2 px, and the parabola-fit SAD sweep must recover the true
disparity to well under half a pixel."""

import jax.numpy as jnp
import numpy as np

from orb_slam_fusion_tpu.frontend.stereo import stereo_match, subpixel_refine
from orb_slam_fusion_tpu.frontend.extractor import Features


def _textured(h, w, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.rand(h, w).astype(np.float32) * 255
    # smooth it so linear interpolation is a good shift model
    for _ in range(2):
        img = 0.25 * (np.roll(img, 1, 0) + np.roll(img, -1, 0)
                      + np.roll(img, 1, 1) + np.roll(img, -1, 1))
    return img


def _shift_right(img, disp):
    """Right image: scene shifted LEFT by disp (u_R = u_L - disp)."""
    h, w = img.shape
    u = np.arange(w, dtype=np.float32) + disp
    u0 = np.clip(np.floor(u).astype(int), 0, w - 1)
    u1 = np.clip(u0 + 1, 0, w - 1)
    a = (u - u0).astype(np.float32)
    return img[:, u0] * (1 - a) + img[:, u1] * a


def test_subpixel_recovers_fractional_disparity():
    disp = 7.3
    img = _textured(120, 200, seed=3)
    imgR = _shift_right(img, disp)

    rng = np.random.RandomState(1)
    n = 64
    uv = np.stack([rng.uniform(30, 170, n), rng.uniform(20, 100, n)],
                  axis=1).astype(np.float32)
    # integer matcher estimate off by up to 2 px
    u_right0 = uv[:, 0] - disp + rng.randint(-2, 3, n)
    ok = np.ones(n, bool)

    u_ref, keep = subpixel_refine(
        jnp.asarray(img), jnp.asarray(imgR), jnp.asarray(uv),
        jnp.asarray(u_right0.astype(np.float32)), jnp.asarray(ok))
    u_ref = np.asarray(u_ref)
    keep = np.asarray(keep)
    assert keep.mean() > 0.8
    err = np.abs((uv[keep, 0] - u_ref[keep]) - disp)
    err_int = np.abs((uv[keep, 0] - u_right0[keep]) - disp)
    # the parabola vertex on a near-V-shaped SAD curve carries some bias
    # (the reference uses the same fit); require a clear win over the
    # integer estimate and sub-half-pixel medians
    assert np.median(err) < 0.45, f"median disparity error {np.median(err)}"
    assert np.median(err) < 0.6 * max(np.median(err_int), 1e-6)


def test_boundary_minimum_dropped():
    """A match whose SAD minimum lands on the sweep edge is rejected
    (reference: bestincR == ±L -> continue)."""
    # a single Gaussian blob: SAD decreases monotonically toward the true
    # (out-of-sweep) optimum, so the in-sweep minimum sits on the boundary
    img = (255 * np.exp(-((np.arange(120)[None, :] - 52.0) ** 2) / 50.0)
           * np.ones((60, 1))).astype(np.float32)
    imgR = _shift_right(img, 9.0)
    uv = np.asarray([[60.0, 30.0]], np.float32)
    # initial estimate off by 9 px -> true optimum outside the ±5 sweep
    u_right0 = np.asarray([60.0], np.float32)
    u_ref, keep = subpixel_refine(
        jnp.asarray(img), jnp.asarray(imgR), jnp.asarray(uv),
        jnp.asarray(u_right0), jnp.asarray([True]))
    assert not bool(keep[0])


def test_median_filter_keeps_clean_matches():
    """The median-Hamming filter (frame.cc:1008+) must not discard matches
    on clean synthetic descriptors (median distance 0 -> floored th)."""
    rng = np.random.RandomState(0)
    n = 32
    desc = rng.randint(0, 2 ** 32, size=(n, 8), dtype=np.uint64
                       ).astype(np.uint32)
    uvL = np.stack([np.linspace(60, 100, n), np.linspace(10, 50, n)],
                   axis=1).astype(np.float32)
    uvR = uvL.copy()
    uvR[:, 0] -= 12.0
    fL = Features(uv=jnp.asarray(uvL), response=jnp.ones(n),
                  octave=jnp.zeros(n, jnp.int32), angle=jnp.zeros(n),
                  desc=jnp.asarray(desc), valid=jnp.ones(n, bool))
    fR = Features(uv=jnp.asarray(uvR), response=jnp.ones(n),
                  octave=jnp.zeros(n, jnp.int32), angle=jnp.zeros(n),
                  desc=jnp.asarray(desc), valid=jnp.ones(n, bool))
    u_right, ok = stereo_match(fL, fR)
    assert int(np.sum(np.asarray(ok))) == n
