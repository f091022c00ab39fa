"""Golden tests against OpenCV — the reference's algorithmic ancestor.

The reference's OrbExtractor (src/cam/orb_feature/orb_extractor.cc) is a
modified copy of OpenCV's ORB: same FAST-9 detector, same intensity-centroid
orientation, same pyramid recipe. OpenCV's Python bindings are available in
this environment, so these tests check semantic parity of our batched
TPU formulations against the original CPU implementations on the same
images (SURVEY §4: "kernel-vs-reference golden tests").

The rBRIEF pattern is intentionally NOT golden-tested: this build generates
its own deterministic sampling pattern (frontend/orb_pattern.py docstring),
an internal convention that only needs self-consistency.
"""

import numpy as np
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from orb_slam_fusion_tpu.frontend import fast as fast_mod
from orb_slam_fusion_tpu.frontend.extractor import gather_patches, ic_angle
from orb_slam_fusion_tpu.frontend.pyramid import gaussian_blur


@pytest.fixture(scope="module")
def image():
    rng = np.random.RandomState(7)
    img = rng.rand(480, 640).astype(np.float32) * 25
    for _ in range(150):
        y, x = rng.randint(20, 440), rng.randint(20, 600)
        h, w = rng.randint(6, 50), rng.randint(6, 50)
        img[y:y + h, x:x + w] += rng.uniform(50, 180)
    return np.clip(img, 0, 255)


def test_fast_corners_match_opencv(image):
    """FAST-9 with the same threshold finds the same corner set."""
    th = 20
    det = cv2.FastFeatureDetector_create(
        threshold=th, nonmaxSuppression=True,
        type=cv2.FAST_FEATURE_DETECTOR_TYPE_9_16)
    kps = det.detect(image.astype(np.uint8), None)
    cv_pts = {(int(round(k.pt[1])), int(round(k.pt[0]))) for k in kps}
    assert len(cv_pts) > 100  # scene produces plenty of corners

    score = fast_mod.fast_score_map(jnp.asarray(image), float(th))
    score = fast_mod.nms3x3(score)
    ys, xs = np.nonzero(np.asarray(score) > 0)
    our_pts = set(zip(ys.tolist(), xs.tolist()))

    # NMS tie-breaking and score definitions differ slightly; demand high
    # mutual coverage within a 1px tolerance rather than exact equality.
    def near(p, s):
        y, x = p
        return any((y + dy, x + dx) in s
                   for dy in (-1, 0, 1) for dx in (-1, 0, 1))

    cv_hit = sum(near(p, our_pts) for p in cv_pts) / len(cv_pts)
    our_hit = sum(near(p, cv_pts) for p in our_pts) / max(len(our_pts), 1)
    assert cv_hit > 0.85, f"only {cv_hit:.2%} of OpenCV corners found"
    assert our_hit > 0.85, f"{1-our_hit:.2%} of our corners are spurious"


def test_ic_angle_matches_opencv_orb(image):
    """Intensity-centroid orientation agrees with OpenCV ORB's angles."""
    orb = cv2.ORB_create(nfeatures=300, edgeThreshold=31, nlevels=1,
                         fastThreshold=20)
    kps = orb.detect(image.astype(np.uint8), None)
    kps = [k for k in kps if 31 < k.pt[0] < 608 and 31 < k.pt[1] < 448]
    assert len(kps) > 50
    yx = jnp.asarray([[int(round(k.pt[1])), int(round(k.pt[0]))]
                      for k in kps], jnp.int32)
    patches = gather_patches(jnp.asarray(image), yx)
    ours = np.degrees(np.asarray(ic_angle(patches))) % 360.0
    theirs = np.asarray([k.angle for k in kps]) % 360.0
    diff = np.abs(ours - theirs)
    diff = np.minimum(diff, 360.0 - diff)
    # integer-rounded centers + float vs fixed-point moments: allow a few
    # degrees; the bulk must agree tightly
    assert np.median(diff) < 5.0, np.median(diff)
    assert (diff < 15.0).mean() > 0.9, (diff < 15.0).mean()


def test_gaussian_blur_matches_opencv(image):
    """The shifted-add separable blur equals cv2.GaussianBlur(7x7, sigma=2)
    away from the border (edge-padding conventions differ at the rim)."""
    ours = np.asarray(gaussian_blur(jnp.asarray(image), sigma=2.0, radius=3))
    theirs = cv2.GaussianBlur(image, (7, 7), 2.0, borderType=cv2.BORDER_REPLICATE)
    np.testing.assert_allclose(ours[8:-8, 8:-8], theirs[8:-8, 8:-8],
                               atol=0.35)
