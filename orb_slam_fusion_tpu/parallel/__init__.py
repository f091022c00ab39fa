"""Multi-chip scale-out: mesh construction + distributed bundle adjustment.

The reference is a single-process pthread system with zero distributed
capability (SURVEY.md §2.3); this package is the genuinely new axis of the
TPU build: map-scale parallelism over a `jax.sharding.Mesh`. Landmarks (and
their Schur blocks) shard across devices; the reduced camera system is
accumulated with `psum` over the interconnect and solved replicated — the
SLAM analogue of data-parallel gradient accumulation with a replicated
optimizer step.
"""

from .dist_ba import distributed_bundle_adjustment, make_slam_mesh  # noqa: F401
from .dist_pose_graph import distributed_pose_graph  # noqa: F401
from .dist_vi_ba import distributed_visual_inertial_ba  # noqa: F401
from .dist_track import (  # noqa: F401
    DistFrameResult, distributed_frame_update, pad_map_for_mesh)
