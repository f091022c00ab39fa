"""Levenberg-Marquardt factor-graph solver — the TPU-native g2o replacement.

The reference uses g2o's pointer-based sparse graph (vertices + edges, virtual
`computeError`/`linearizeOplus`, Schur-complement block solver —
3rdparty/g2o/g2o/core/{sparse_optimizer,block_solver}.*). Here the same math
is expressed batch-first:

* factors of one type are a struct-of-arrays batch; residuals + analytic
  Jacobians evaluate for the whole batch in one fused XLA computation;
* the normal equations are assembled with `segment_sum` scatter-adds into
  dense per-variable blocks;
* landmarks are eliminated with a batched Schur complement (per-landmark 3x3
  inverses + pairwise pose-block outer products), leaving a dense reduced
  camera system solved by Cholesky on the MXU;
* robust kernels and outlier rounds are masks, not graph rebuilds, so the
  whole optimizer runs as a single compiled program with static shapes.
"""

from .robust import huber_weight, CHI2_2D, CHI2_3D  # noqa: F401
from .pose_opt import pose_optimization  # noqa: F401
from .ba import bundle_adjustment, BAProblem  # noqa: F401
