"""Settings loader tests against the reference YAML schema.

The fixture below reproduces the structure of the reference's shipped
EuRoC config (reference: settings/EuRoC.yaml) — OpenCV %YAML directive,
!!opencv-matrix nodes, File.version — so load_settings is exercised on
exactly the format the reference's Settings class reads
(src/config/settings.cc).
"""

import numpy as np
import pytest

from orb_slam_fusion_tpu.config import load_settings

EUROC_YAML = """\
%YAML:1.0
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: 458.654
Camera1.fy: 457.296
Camera1.cx: 367.215
Camera1.cy: 248.375
Camera1.k1: -0.28340811
Camera1.k2: 0.07395907
Camera1.p1: 0.00019359
Camera1.p2: 1.76187114e-05
Camera.width: 752
Camera.height: 480
Camera.fps: 20
Camera.RGB: 1
Stereo.ThDepth: 60.0
Stereo.T_c1_c2: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [0.999997256477797,-0.002317135723275,-0.000343393120620,0.110074137800478,
         0.002312067192432,0.999898048507103,-0.014090668452683,-0.000156612054392,
         0.000376008102320,0.014089835846691,0.999900662638081,0.000889382785432,
         0,0,0,1.000000000000000]
IMU.T_b_c1: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975,
         0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768,
         -0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949,
         0.0, 0.0, 0.0, 1.0]
IMU.NoiseGyro: 1.7e-04
IMU.NoiseAcc: 2.0e-03
IMU.GyroWalk: 1.9393e-05
IMU.AccWalk: 3.e-03
IMU.Frequency: 200.0
ORBextractor.nFeatures: 1200
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


@pytest.fixture
def yaml_path(tmp_path):
    p = tmp_path / "euroc.yaml"
    p.write_text(EUROC_YAML)
    return str(p)


def test_mono_keeps_distortion(yaml_path):
    s = load_settings(yaml_path, "mono")
    assert s.slam.cam_model == "pinhole"
    assert s.slam.cam_params == (458.654, 457.296, 367.215, 248.375)
    # mono pinhole feeds raw images -> tracker must undistort keypoints
    np.testing.assert_allclose(
        s.slam.distortion,
        (-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05))
    assert s.baseline == 0.0
    assert s.calib is None
    assert s.slam.orb.n_features == 1200


def test_stereo_imu_rectified_no_distortion(yaml_path):
    s = load_settings(yaml_path, "stereo-imu")
    # rectified stereo consumes rectified pixels: no per-frame undistortion
    assert s.slam.distortion == ()
    assert abs(s.baseline - 0.110074) < 1e-4
    assert s.calib is not None
    assert s.fps == 20.0
    # Tbc rotation must be orthonormal
    R = np.asarray(s.calib.Tbc_R)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_version_guard(tmp_path):
    # unknown explicit version -> rejected
    p = tmp_path / "future.yaml"
    p.write_text('File.version: "2.0"\nCamera.type: "PinHole"\n')
    with pytest.raises(ValueError):
        load_settings(str(p), "mono")
    # no version -> legacy path, which demands the legacy required keys
    p2 = tmp_path / "old.yaml"
    p2.write_text('Camera.type: "PinHole"\n')
    with pytest.raises(KeyError):
        load_settings(str(p2), "mono")


CAMERA2_BLOCK = """\
Camera2.fx: 457.587
Camera2.fy: 456.134
Camera2.cx: 379.999
Camera2.cy: 255.238
Camera2.k1: -0.28368365
Camera2.k2: 0.07451284
Camera2.p1: -0.00010473
Camera2.p2: -3.55590700e-05
"""


def test_unrectified_stereo_precomputes_rectification(tmp_path):
    p = tmp_path / "euroc2.yaml"
    p.write_text(EUROC_YAML + CAMERA2_BLOCK)
    s = load_settings(str(p), "stereo-imu")
    assert s.rect_maps is not None
    mL, mR = s.rect_maps
    assert mL.shape == (480, 752, 2) and mR.shape == (480, 752, 2)
    # intrinsics replaced by the ideal rectified camera: common focal
    fx, fy, cx, cy = s.slam.cam_params
    assert fx == fy
    assert abs(fx - 456.715) < 0.5
    assert not any(s.slam.distortion)  # tracker sees a distortion-free rig
    # Tbc rotated by R1 stays orthonormal
    R = np.asarray(s.calib.Tbc_R)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    # vision-only stereo keeps no distortion in the tracker either
    s2 = load_settings(str(p), "stereo")
    assert s2.calib is None and s2.rect_maps is not None


def test_rectified_stereo_has_no_maps(yaml_path):
    # no Camera2 block -> input treated as already rectified
    s = load_settings(yaml_path, "stereo")
    assert s.rect_maps is None


def test_resize_scales_intrinsics(tmp_path):
    p = tmp_path / "resized.yaml"
    p.write_text(EUROC_YAML + "Camera.newWidth: 376\nCamera.newHeight: 240\n"
                 "System.thFarPoints: 20.0\n")
    s = load_settings(str(p), "mono")
    fx, fy, cx, cy = s.slam.cam_params
    assert abs(fx - 458.654 * 0.5) < 1e-6
    assert abs(cy - 248.375 * 0.5) < 1e-6
    assert s.resize_to == (240, 376)
    assert s.slam.image_size == (240, 376)
    assert s.slam.th_far_points == 20.0


def test_resize_with_rectification_keeps_map_route(tmp_path):
    # rectifying rigs resize THROUGH the maps (reference system.cc:271-285:
    # remap only, no separate cv::resize)
    p = tmp_path / "rect_resized.yaml"
    p.write_text(EUROC_YAML + CAMERA2_BLOCK
                 + "Camera.newWidth: 376\nCamera.newHeight: 240\n")
    s = load_settings(str(p), "stereo")
    assert s.resize_to is None
    assert s.rect_maps[0].shape == (240, 376, 2)
    assert s.slam.image_size == (240, 376)
    # maps are finite and address raw-image coordinates (the reference
    # passes newImSize as BOTH imageSize and newImageSize to
    # cv::stereoRectify — settings.cc:538-544 — which this reproduces)
    m = s.rect_maps[0]
    assert np.isfinite(m).all()
    assert m[..., 0].min() > -200 and m[..., 0].max() < 900
    assert m[..., 1].min() > -200 and m[..., 1].max() < 700


def test_preprocess_color_and_resize(tmp_path):
    import jax.numpy as jnp
    from orb_slam_fusion_tpu.system import Sensor, System

    p = tmp_path / "resized.yaml"
    p.write_text(EUROC_YAML + "Camera.newWidth: 376\nCamera.newHeight: 240\n")
    s = load_settings(str(p), "mono")
    sys_ = System(settings=s, sensor=Sensor.MONOCULAR)
    rgb = jnp.ones((480, 752, 3), jnp.float32) * jnp.array([100., 50., 10.])
    out = sys_._preprocess(rgb)
    assert out.shape == (240, 376)
    # Camera.RGB: 1 -> luma weights applied in RGB order
    expected = 0.299 * 100 + 0.587 * 50 + 0.114 * 10
    np.testing.assert_allclose(float(out[50, 50]), expected, rtol=1e-5)


def test_triangulation_far_gate():
    import jax.numpy as jnp
    from orb_slam_fusion_tpu import lie
    from orb_slam_fusion_tpu.engine.mapping import _triangulate_pair

    # two cameras 0.2 m apart, one near point (z=5) one far (z=60)
    pose_a = lie.se3_identity()
    pose_b = lie.SE3(jnp.eye(3), jnp.array([-0.2, 0.0, 0.0]))
    pts = jnp.array([[0.1, 0.05, 5.0], [0.3, -0.2, 60.0]])
    rays_a = pts / pts[:, 2:3]
    pb = pts + jnp.array([-0.2, 0.0, 0.0])
    rays_b = pb / pb[:, 2:3]
    valid = jnp.ones(2, bool)
    _, good_all = _triangulate_pair(pose_a, pose_b, rays_a, rays_b, valid,
                                    min_parallax_cos=1.0)
    _, good_far = _triangulate_pair(pose_a, pose_b, rays_a, rays_b, valid,
                                    min_parallax_cos=1.0, far_threshold=20.0)
    assert bool(good_all[0]) and bool(good_all[1])
    assert bool(good_far[0]) and not bool(good_far[1])


def test_atlas_autosave_autoload(tmp_path):
    """System.SaveAtlasToFile / LoadAtlasFromFile round trip through the
    System lifecycle (reference system.cc:141-190, 543-550)."""
    from orb_slam_fusion_tpu.system import Sensor, System

    atlas = str(tmp_path / "session.npz")
    p = tmp_path / "cfg.yaml"
    p.write_text(EUROC_YAML + f'System.SaveAtlasToFile: "{atlas}"\n')
    s = load_settings(str(p), "mono")
    sys_ = System(settings=s, sensor=Sensor.MONOCULAR)
    sys_.shutdown()
    import os
    assert os.path.exists(atlas)

    p2 = tmp_path / "cfg2.yaml"
    p2.write_text(EUROC_YAML + f'System.LoadAtlasFromFile: "{atlas}"\n')
    s2 = load_settings(str(p2), "mono")
    sys2 = System(settings=s2, sensor=Sensor.MONOCULAR)  # must not raise
    assert sys2.tracker is not None
    # missing file -> fresh session, no crash
    p3 = tmp_path / "cfg3.yaml"
    p3.write_text(EUROC_YAML + 'System.LoadAtlasFromFile: "/nope/missing"\n')
    System(settings=load_settings(str(p3), "mono"), sensor=Sensor.MONOCULAR)


TUMVI_YAML = """\
%YAML:1.0
File.version: "1.0"
Camera.type: "KannalaBrandt8"
Camera1.fx: 190.97847715128717
Camera1.fy: 190.9733070521226
Camera1.cx: 254.93170605935475
Camera1.cy: 256.8974428996504
Camera1.k1: 0.0034823894022493434
Camera1.k2: 0.0007150348452162257
Camera1.k3: -0.0020532361418706202
Camera1.k4: 0.00020293673591811182
Camera1.overlappingBegin: 0
Camera1.overlappingEnd: 511
Camera2.fx: 190.44236969414825
Camera2.fy: 190.4344384721956
Camera2.cx: 252.59949716835982
Camera2.cy: 254.91723064636983
Camera2.k1: 0.0034003170790442797
Camera2.k2: 0.001766278153469831
Camera2.k3: -0.00266312569781606
Camera2.k4: 0.0003299517423931039
Camera2.overlappingBegin: 0
Camera2.overlappingEnd: 511
Camera.width: 512
Camera.height: 512
Camera.fps: 20
Camera.RGB: 1
Stereo.ThDepth: 40.0
Stereo.T_c1_c2: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [0.999994, -0.002184, 0.002668, 0.101063,
         0.002191, 0.999994, -0.002628, -0.001946,
         -0.002662, 0.002634, 0.999993, 0.000925,
         0.0, 0.0, 0.0, 1.0]
IMU.T_b_c1: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [-0.99952504, 0.00750192, -0.02989013, 0.04557484,
         0.02961534, -0.03439736, -0.99896935, -0.07116180,
         -0.00852233, -0.99938008, 0.03415885, -0.04468125,
         0.0, 0.0, 0.0, 1.0]
IMU.NoiseGyro: 0.00016
IMU.NoiseAcc: 0.0028
IMU.GyroWalk: 0.000022
IMU.AccWalk: 0.00086
IMU.Frequency: 200.0
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


def test_tumvi_fisheye_stereo_settings(tmp_path):
    """KB8 stereo rig (TUM-VI schema): cam2 + lapping areas parsed, System
    builds the fisheye stereo tracker (reference settings.cc:276-348)."""
    from orb_slam_fusion_tpu.engine.stereo_tracker import FisheyeStereoTracker
    from orb_slam_fusion_tpu.system import Sensor, System

    p = tmp_path / "tumvi.yaml"
    p.write_text(TUMVI_YAML)
    s = load_settings(str(p), "stereo-imu")
    assert s.slam.cam_model == "kannala_brandt8"
    assert len(s.cam2_params) == 8
    assert s.lapping == ((0.0, 511.0), (0.0, 511.0))
    assert abs(s.baseline - 0.10108) < 1e-3
    assert s.rect_maps is None          # fisheye rigs never rectify
    assert s.calib is not None

    sys_ = System(settings=load_settings(str(p), "stereo"),
                  sensor=Sensor.STEREO)
    assert isinstance(sys_.tracker, FisheyeStereoTracker)

    from orb_slam_fusion_tpu.engine.vio_tracker import FisheyeStereoVioTracker
    sys2 = System(settings=s, sensor=Sensor.IMU_STEREO)
    assert isinstance(sys2.tracker, FisheyeStereoVioTracker)


LEGACY_EUROC_YAML = """\
%YAML:1.0
Camera.type: "PinHole"
Camera.fx: 435.2046959714599
Camera.fy: 435.2046959714599
Camera.cx: 367.4517211914062
Camera.cy: 252.2008514404297
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.width: 752
Camera.height: 480
Camera.fps: 20.0
Camera.bf: 47.90639384423901
Camera.RGB: 1
ThDepth: 35.0
Tbc: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975,
         0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768,
         -0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949,
         0.0, 0.0, 0.0, 1.0]
IMU.NoiseGyro: 1.7e-4
IMU.NoiseAcc: 2.0e-3
IMU.GyroWalk: 1.9393e-05
IMU.AccWalk: 3.0000e-03
IMU.Frequency: 200
ORBextractor.nFeatures: 1200
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""

LEGACY_TUM_RGBD_YAML = """\
%YAML:1.0
Camera.type: "PinHole"
Camera.fx: 517.306408
Camera.fy: 516.469215
Camera.cx: 318.643040
Camera.cy: 255.313989
Camera.k1: 0.262383
Camera.k2: -0.953104
Camera.p1: -0.005358
Camera.p2: 0.002628
Camera.k3: 1.163314
Camera.width: 640
Camera.height: 480
Camera.fps: 30.0
Camera.bf: 40.0
Camera.RGB: 1
ThDepth: 40.0
DepthMapFactor: 5000.0
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


def test_legacy_euroc_stereo_imu(tmp_path):
    """Legacy (no File.version) ORB-SLAM3 schema: Camera.fx / Camera.bf /
    Tbc keys (reference Tracking::Parse*ParamFile, tracking.cc:224-933)."""
    p = tmp_path / "legacy.yaml"
    p.write_text(LEGACY_EUROC_YAML)
    s = load_settings(str(p), "stereo-imu")
    assert s.slam.cam_model == "pinhole"
    assert abs(s.slam.cam_params[0] - 435.2047) < 1e-3
    # baseline recovered from bf
    assert abs(s.baseline - 47.90639384423901 / 435.2046959714599) < 1e-6
    assert s.calib is not None
    assert s.th_depth == 35.0
    assert s.slam.orb.n_features == 1200
    assert s.slam.distortion == ()   # pre-rectified legacy stereo


def test_legacy_tum_rgbd(tmp_path):
    """TUM RGB-D legacy config: 5-coefficient distortion (k3) and
    DepthMapFactor."""
    p = tmp_path / "tum1.yaml"
    p.write_text(LEGACY_TUM_RGBD_YAML)
    s = load_settings(str(p), "rgbd")
    assert len(s.slam.distortion) == 5
    assert abs(s.slam.distortion[4] - 1.163314) < 1e-6
    assert s.depth_map_factor == 5000.0
    assert abs(s.baseline - 40.0 / 517.306408) < 1e-9

    # the 5-coefficient undistortion matches OpenCV
    import cv2
    import jax.numpy as jnp
    from orb_slam_fusion_tpu import cameras

    K = np.array([[517.306408, 0, 318.643040],
                  [0, 516.469215, 255.313989], [0, 0, 1]])
    D = np.array(s.slam.distortion)
    rng = np.random.RandomState(2)
    uv_d = rng.uniform([100, 100], [540, 380], (100, 2))
    ours = np.asarray(cameras.undistort_points(
        jnp.asarray(s.slam.cam_params), jnp.asarray(D),
        jnp.asarray(uv_d, jnp.float32), iters=20))
    ref = cv2.undistortPoints(uv_d.reshape(-1, 1, 2), K, D,
                              P=K).reshape(-1, 2)
    np.testing.assert_allclose(ours, ref, atol=0.1)


def test_legacy_image_scale(tmp_path):
    p = tmp_path / "scaled.yaml"
    p.write_text(LEGACY_EUROC_YAML + "Camera.imageScale: 0.5\n")
    s = load_settings(str(p), "stereo")
    assert abs(s.slam.cam_params[0] - 435.2046959714599 * 0.5) < 1e-6
    assert s.slam.image_size == (240, 376)
    assert s.resize_to == (240, 376)
    # bf scales with fx so the metric baseline is unchanged
    assert abs(s.baseline - 47.90639384423901 / 435.2046959714599) < 1e-6
