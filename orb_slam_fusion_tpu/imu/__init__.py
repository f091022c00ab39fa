"""IMU: on-manifold preintegration, inertial factors, initialization.

Replaces the reference's IMU layer (src/imu/imu_types.cc — the Forster-style
`Preintegrated` class) and the inertial g2o factors
(src/solver/g2o_solver/g2o_types.cc EdgeInertial/EdgeInertialGS). The
preintegration loop is a `lax.scan` over padded measurement batches (dt=0
padding is algebraically inert), so whole inter-frame windows integrate as
one fused program and `vmap` batches across frames.

Also provides **bidirectional preintegration** (forward + backward deltas) —
the feature the reference README promises but never implements
(SURVEY.md §0): the backward factor constrains state i from state j,
symmetrizing the information flow after bias updates.
"""

from .preintegration import (  # noqa: F401
    ImuCalib, ImuBias, Preintegrated, preintegrate, bias_corrected_delta,
    GRAVITY,
)
from .factors import inertial_residual, inertial_residual_backward  # noqa: F401
