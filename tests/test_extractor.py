"""ORB extraction pipeline: FAST detection, selection, descriptors."""

import jax.numpy as jnp
import numpy as np

from orb_slam_fusion_tpu.frontend import extractor, fast as fast_mod
from orb_slam_fusion_tpu.frontend.matcher import match_mutual


def _boxy_image(rng, h=240, w=320, n_boxes=40):
    """Bright rectangles on a noisy background — dense FAST corners."""
    img = rng.uniform(20, 40, (h, w)).astype(np.float32)
    for _ in range(n_boxes):
        y = rng.randint(10, h - 40)
        x = rng.randint(10, w - 40)
        bh = rng.randint(8, 30)
        bw = rng.randint(8, 30)
        img[y: y + bh, x: x + bw] += rng.uniform(60, 180)
    return np.clip(img, 0, 255)


class TestFast:
    def test_square_corners_detected(self):
        img = np.full((64, 64), 30.0, np.float32)
        img[20:40, 20:40] = 200.0
        score = fast_mod.detect(jnp.asarray(img))
        score = np.asarray(score)
        # corners of the square light up; flat interior must not
        assert score.max() > 0
        ys, xs = np.nonzero(score)
        for cy, cx in [(20, 20), (20, 39), (39, 20), (39, 39)]:
            d = np.sqrt((ys - cy) ** 2 + (xs - cx) ** 2).min()
            assert d <= 2.0, (cy, cx, d)
        assert score[28:32, 28:32].max() == 0.0  # flat interior

    def test_flat_image_no_corners(self):
        score = fast_mod.detect(jnp.full((64, 64), 100.0))
        assert float(jnp.max(score)) == 0.0

    def test_low_threshold_fallback(self):
        """Weak corners (contrast between 7 and 20) only appear through the
        low-threshold fallback path."""
        img = np.full((64, 64), 100.0, np.float32)
        img[20:40, 20:40] = 112.0  # contrast 12: below hi=20, above lo=7
        score = np.asarray(fast_mod.detect(jnp.asarray(img)))
        assert score.max() > 0
        assert score.max() < 1e4  # no high-threshold boost applied


class TestExtractor:
    def test_finds_corners_multi_octave(self):
        rng = np.random.RandomState(0)
        img = _boxy_image(rng)
        p = extractor.OrbParams(n_features=512)
        f = extractor.extract_features(jnp.asarray(img), p)
        n = int(jnp.sum(f.valid))
        assert n > 200, n
        octaves = np.asarray(f.octave)[np.asarray(f.valid)]
        assert len(np.unique(octaves)) >= 3, np.unique(octaves)
        desc = np.asarray(f.desc)[np.asarray(f.valid)]
        assert (desc.sum(axis=1) > 0).mean() > 0.9
        assert np.isfinite(np.asarray(f.angle)).all()

    def test_constant_image_yields_nothing(self):
        p = extractor.OrbParams(n_features=128)
        f = extractor.extract_features(jnp.full((120, 160), 77.0), p)
        assert int(jnp.sum(f.valid)) == 0

    def test_shift_repeatability(self):
        """Descriptors of a translated image match back to the original at
        the translated positions."""
        rng = np.random.RandomState(1)
        img = _boxy_image(rng)
        dy, dx = 5, 9
        img2 = np.roll(img, (dy, dx), axis=(0, 1))
        p = extractor.OrbParams(n_features=384)
        f1 = extractor.extract_features(jnp.asarray(img), p)
        f2 = extractor.extract_features(jnp.asarray(img2), p)
        idx, ok = match_mutual(f1.desc, f1.valid, f2.desc, f2.valid,
                               max_dist=40)
        ok_np = np.asarray(ok)
        assert ok_np.sum() > 50, ok_np.sum()
        uv1 = np.asarray(f1.uv)[ok_np]
        uv2 = np.asarray(f2.uv)[np.asarray(idx)[ok_np]]
        d = uv2 - uv1 - np.array([dx, dy])
        inlier = np.abs(d).max(axis=1) < 2.0
        assert inlier.mean() > 0.7, inlier.mean()
