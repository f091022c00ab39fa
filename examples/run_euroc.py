"""EuRoC stereo-inertial runner on real dataset imagery.

The counterpart of the reference's `slam_euroc_si` executable
(tests/slam_euroc_si.cc): load a EuRoC MAV sequence (mav0 layout), build a
stereo-inertial System from a reference-format YAML settings file, feed
every frame with its inter-frame IMU batch, then save the TUM-format
trajectory. Pacing statistics (per-frame track time vs the camera period)
are reported like the reference's ttrack vector (slam_euroc_si.cc:190-203).

Usage:
    python examples/run_euroc.py SETTINGS.yaml DATASET_DIR OUT_TRAJ.txt \
        [--timestamps FILE] [--frames N] [--mono] [--no-imu] [--tpu]

This environment ships no EuRoC imagery; on a machine with the dataset this
is the production entry point. `examples/run_euroc_synthetic.py` is the
in-repo stand-in oracle.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("dataset")
    ap.add_argument("out")
    ap.add_argument("--timestamps", default=None,
                    help="per-sequence timestamp list "
                         "(settings/EuRoC_TimeStamps/*.txt)")
    ap.add_argument("--frames", type=int, default=0, help="0 = all")
    ap.add_argument("--mono", action="store_true")
    ap.add_argument("--no-imu", action="store_true")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the attached TPU instead of host CPU")
    args = ap.parse_args()

    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from orb_slam_fusion_tpu.io.euroc import EurocSequence, load_gray
    from orb_slam_fusion_tpu.system import Sensor, System

    stereo = not args.mono
    if args.mono:
        sensor = Sensor.MONOCULAR if args.no_imu else Sensor.IMU_MONOCULAR
    else:
        sensor = Sensor.STEREO if args.no_imu else Sensor.IMU_STEREO

    seq = EurocSequence(args.dataset, stereo=stereo,
                        timestamps_file=args.timestamps)
    print(f"sequence: {len(seq)} frames, sensor={sensor.value}")
    system = System(settings_path=args.settings, sensor=sensor)

    track_times = []
    n = 0
    for fr in seq.frames():
        imgL = load_gray(fr.img_left_path)
        t0 = time.perf_counter()
        if stereo:
            imgR = load_gray(fr.img_right_path)
            if args.no_imu:
                rec = system.track_stereo(imgL, imgR, fr.timestamp)
            else:
                rec = system.track_stereo_imu(
                    imgL, imgR, fr.timestamp,
                    fr.imu_acc, fr.imu_gyro, fr.imu_t)
        else:
            if args.no_imu:
                rec = system.track_monocular(imgL, fr.timestamp)
            else:
                # raw image: System extracts AND undistorts keypoints
                # (EuRoC mono imagery carries radtan distortion)
                rec = system.track_monocular_imu(
                    imgL, fr.timestamp, fr.imu_acc, fr.imu_gyro, fr.imu_t)
        track_times.append(time.perf_counter() - t0)
        n += 1
        if n % 50 == 0:
            print(f"  frame {n}: state={rec.state} tracked={rec.tracked} "
                  f"median track {1e3 * sorted(track_times)[n // 2]:.1f} ms")
        if args.frames and n >= args.frames:
            break

    system.shutdown()
    system.save_trajectory_tum(args.out)
    tt = sorted(track_times)
    period = 1.0 / system.tracker.cfg.fps
    print(f"saved {args.out}; frames={n} "
          f"median={1e3 * tt[len(tt) // 2]:.1f}ms mean={1e3 * sum(tt) / n:.1f}ms "
          f"realtime-budget={1e3 * period:.0f}ms "
          f"({100.0 * sum(1 for x in tt if x <= period) / n:.0f}% in budget)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
