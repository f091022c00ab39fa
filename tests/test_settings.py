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
    p = tmp_path / "old.yaml"
    p.write_text("Camera.type: \"PinHole\"\n")
    with pytest.raises(ValueError):
        load_settings(str(p), "mono")


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
