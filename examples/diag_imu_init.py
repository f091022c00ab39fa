"""Minimal repro: what happens to the stereo-inertial session at IMU init.

Runs the eval protocol to just past the IMU-init keyframe, dumping the
gravity estimate, the gauge transform, VI-BA cost traces, and the
matching health of the first post-init frames.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from orb_slam_fusion_tpu import sim, lie  # noqa: E402
from orb_slam_fusion_tpu.engine import SlamConfig  # noqa: E402
from orb_slam_fusion_tpu.engine.vio_tracker import StereoVioTracker  # noqa: E402
from orb_slam_fusion_tpu.frontend.extractor import OrbParams  # noqa: E402
from orb_slam_fusion_tpu.imu.preintegration import make_calib  # noqa: E402

from run_euroc_synthetic import density_points, load_euroc_gt  # noqa: E402


def main():
    seq, n_frames = "MH01", 70
    positions, t, quats = load_euroc_gt(seq, stride=1, max_frames=10 ** 9,
                                        with_quats=True)
    moved = np.linalg.norm(positions - positions[0], axis=1) > 0.5
    first = int(np.argmax(moved)) if moved.any() else 0
    positions = positions[first:first + n_frames]
    quats = quats[first:first + n_frames]
    t = t[first:first + n_frames]
    vio = sim.vio_from_gt_trajectory(positions, quats, t,
                                     n_points=density_points(positions),
                                     seed=1, gyro_noise=1.7e-4,
                                     acc_noise=2e-3, gyro_bias=0.002,
                                     acc_bias=0.02)
    world = vio.world
    baseline = 0.11
    cfg = SlamConfig(
        cam_params=(400.0, 400.0, 376.0, 240.0),
        image_size=(480, 752),
        orb=OrbParams(n_features=640),
        max_keyframes=256, max_map_points=16384,
        ba_window=6, loop_closing=False,
    )
    tracker = StereoVioTracker(cfg, baseline, make_calib())
    cam = jnp.asarray(cfg.cam_params)

    # instrument the init
    orig_apply = tracker._apply_scaled_rotation
    orig_fullba = tracker._full_vi_ba

    def apply_hook(s, R_wg):
        print(f"  _apply_scaled_rotation: s={s:.4f} "
              f"R_wg angle={np.degrees(np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(np.asarray(R_wg)))))):.2f} deg")
        # gravity direction implied in old world
        g = np.asarray(R_wg) @ np.array([0, 0, -9.81])
        print(f"  estimated g in map world: {g}")
        # true gravity in map world: map world = cam0 frame of the session
        return orig_apply(s, R_wg)

    def fullba_hook():
        n_kf = int(tracker.map.n_kf)
        pos_before = np.asarray(tracker.map.kf_pose.t[:n_kf]).copy()
        orig_fullba()
        pos_after = np.asarray(tracker.map.kf_pose.t[:n_kf])
        d = np.linalg.norm(pos_after - pos_before, axis=1)
        print(f"  full VI-BA moved kf t by: max={d.max():.4f} "
              f"mean={d.mean():.4f}")
        print(f"  finite: {np.all(np.isfinite(pos_after))}")

    tracker._apply_scaled_rotation = apply_hook
    tracker._full_vi_ba = fullba_hook

    for k in range(n_frames):
        fL, fR = sim.render_stereo_frame(
            world, k, cam, cfg.image_size, cfg.orb.n_features, baseline,
            seed=17, pixel_noise=0.4, desc_bit_flips=4, dropout=0.1)
        if k == 0:
            acc = np.zeros((0, 3), np.float32)
            gyro = np.zeros((0, 3), np.float32)
            tm = np.zeros(0)
        else:
            acc, gyro, tm = vio.frame_imu[k - 1]
        was_init = tracker.imu_initialized
        rec = tracker.process_stereo_imu(
            fL, fR, float(world.timestamps[k]), acc, gyro, tm)
        if tracker.imu_initialized != was_init:
            print(f"[{k}] IMU INITIALIZED  bias_g={np.asarray(tracker.bias.gyro)}"
                  f" bias_a={np.asarray(tracker.bias.acc)}")
            print(f"  true biases: g={vio.gyro_bias_true} a={vio.acc_bias_true}")
            print(f"  cur_vel={np.asarray(tracker.cur_vel)}")
            print(f"  |GT vel[{k}]|={np.linalg.norm(vio.vel[k]):.3f}")
        if k >= 50:
            print(f"[{k}] state={rec.state} tracked={rec.tracked} "
                  f"vel={np.round(np.asarray(tracker.cur_vel), 2)} "
                  f"finite_pose={bool(np.all(np.isfinite(np.asarray(tracker.cur_pose.t))))}")
        if rec.state == "lost" and k > 56:
            break


if __name__ == "__main__":
    main()
