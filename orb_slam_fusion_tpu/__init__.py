"""orb_slam_fusion_tpu — a TPU-native visual-inertial SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capability set of the
`orb_slam_fusion` reference (an ORB-SLAM3 fork): multi-map visual /
visual-inertial SLAM with ORB features, bundle adjustment, IMU
preintegration, place recognition, loop closing and map merging — built
batch-first for TPU hardware (MXU-friendly dense linear algebra, masked
static-shape kernels, shard_map/pjit scale-out) instead of the reference's
pointer-graph + pthread architecture.

Subpackages
-----------
- ``lie``       : batched SO3/SE3/Sim3 (replaces Sophus)
- ``cameras``   : pinhole / Kannala-Brandt8 models (replaces src/cam/camera_models)
- ``solver``    : Levenberg-Marquardt factor-graph engine (replaces g2o)
- ``frontend``  : ORB pyramid/FAST/descriptor/matching kernels (replaces
                  src/cam/orb_feature + OpenCV)
- ``imu``       : on-manifold preintegration + inertial factors (replaces src/imu)
- ``map``       : SoA keyframe/map-point tables, covisibility (replaces src/map)
- ``place``     : TPU-resident binary-descriptor vocabulary + scoring
                  (replaces DBoW2)
- ``engine``    : tracking / local mapping / loop closing orchestration
                  (replaces src/{tracking,localmapping,loopclosing}.cc)
- ``parallel``  : mesh sharding + distributed bundle adjustment
- ``config``    : typed settings (replaces src/config)
- ``io``        : trajectory writers, atlas serialization (replaces
                  boost::serialization paths in src/system.cc)
"""

__version__ = "0.1.0"

from . import lie, cameras  # noqa: F401
