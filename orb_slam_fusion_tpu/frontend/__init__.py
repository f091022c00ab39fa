"""ORB feature front-end as batched TPU kernels.

Replaces the reference's OpenCV-based per-feature pipeline
(src/cam/orb_feature/{orb_extractor,orb_matcher}.cc) with dense, static-shape
array programs:

* `pyramid`  — image pyramid + separable Gaussian blur (VPU convolutions)
* `fast`     — FAST-9 corner test on every pixel at once via 16 rolled
               copies + bit-mask arc tests; 3x3 NMS via reduce_window
* `orb`      — per-cell top-K spatial selection (the quad-tree replacement),
               IC-angle orientation and rotated-BRIEF descriptors from
               batched 31x31 patch gathers
* `matcher`  — Hamming distances via XOR + population_count over uint32
               words; all search strategies (projection-window, brute-force,
               epipolar) are masked dense distance matrices + argmin
* `stereo`   — rectified-row stereo matching as a masked distance problem

Everything is fixed capacity: a frame always carries `n_features` slots with
a validity mask, so downstream jit programs never recompile.
"""

from .extractor import OrbParams, Features, extract_features  # noqa: F401
from .matcher import hamming_distance, match_mutual, search_by_projection  # noqa: F401
