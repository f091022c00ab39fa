"""EuRoC MAV dataset driver.

Replaces the reference's EuRoC runner (tests/slam_euroc_si.cc: LoadImages,
LoadIMU, the real-time-paced feeding loop). CSV parsing and timestamp
association run through the native C++ library (native_bridge); images are
decoded with OpenCV when present. The driver degrades gracefully when the
dataset is absent (this environment has no EuRoC imagery — the synthetic
harness in sim.py is the stand-in oracle; this module is the path a user
runs on real data).
"""

from __future__ import annotations

import os
from typing import Iterator, List, NamedTuple, Optional, Tuple

import numpy as np

from .. import native_bridge as nb


class EurocFrame(NamedTuple):
    timestamp: float
    img_left_path: str
    img_right_path: Optional[str]
    imu_acc: np.ndarray     # (N,3) measurements since previous frame
    imu_gyro: np.ndarray    # (N,3)
    imu_t: np.ndarray       # (N,)


class EurocSequence:
    """Lazy EuRoC sequence reader (mav0 layout)."""

    def __init__(self, root: str, stereo: bool = True,
                 timestamps_file: Optional[str] = None):
        mav = os.path.join(root, "mav0")
        if not os.path.isdir(mav):
            mav = root
        self.cam0_t, self.cam0_files = nb.parse_euroc_cam(
            os.path.join(mav, "cam0", "data.csv"))
        self.cam0_dir = os.path.join(mav, "cam0", "data")
        self.stereo = stereo
        if stereo:
            self.cam1_t, self.cam1_files = nb.parse_euroc_cam(
                os.path.join(mav, "cam1", "data.csv"))
            self.cam1_dir = os.path.join(mav, "cam1", "data")
            self.right_of = nb.associate(self.cam0_t, self.cam1_t, 0.005)
        self.imu_t, self.imu_gyro, self.imu_acc = nb.parse_euroc_imu(
            os.path.join(mav, "imu0", "data.csv"))
        # optional per-sequence timestamp list (reference
        # settings/EuRoC_TimeStamps) restricting the evaluated frames
        if timestamps_file:
            want = np.loadtxt(timestamps_file, dtype=np.int64) * 1e-9
            sel = nb.associate(want, self.cam0_t, 0.005)
            keep = sel[sel >= 0]
            self.cam0_t = self.cam0_t[keep]
            self.cam0_files = [self.cam0_files[i] for i in keep]
            if stereo:
                self.right_of = self.right_of[keep]

    def __len__(self) -> int:
        return len(self.cam0_t)

    def frames(self) -> Iterator[EurocFrame]:
        prev_t = None
        for i, t in enumerate(self.cam0_t):
            if prev_t is None:
                lo = 0
            else:
                lo = int(np.searchsorted(self.imu_t, prev_t, side="right"))
            hi = int(np.searchsorted(self.imu_t, t, side="right"))
            right = None
            if self.stereo and self.right_of[i] >= 0:
                right = os.path.join(self.cam1_dir,
                                     self.cam1_files[self.right_of[i]])
            yield EurocFrame(
                timestamp=float(t),
                img_left_path=os.path.join(self.cam0_dir,
                                           self.cam0_files[i]),
                img_right_path=right,
                imu_acc=self.imu_acc[lo:hi],
                imu_gyro=self.imu_gyro[lo:hi],
                imu_t=self.imu_t[lo:hi],
            )
            prev_t = t


def load_gray(path: str) -> np.ndarray:
    """Load an image as float32 grayscale (0..255)."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    return img.astype(np.float32)
