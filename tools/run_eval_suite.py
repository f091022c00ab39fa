"""Full evaluation sweep -> eval_results.jsonl (the EVAL.md source data).

Runs examples/run_euroc_synthetic.py protocols at the operating points the
round-3 verdict demanded (#2/#3/#7):

  * all 11 EuRoC sequences, monocular, stride 10 (the survey table);
  * V101 + V201 monocular at CAMERA RATE (stride 1), full length;
  * MH01 + V102 + V103 stereo-inertial at camera rate, FULL length
    (noisy biased IMU protocol).

Every row is appended as one JSON line with its exact reproduction
command. Run:  python tools/run_eval_suite.py [--out eval_results.jsonl]
                [--quick]  (quick = short frames for smoke-testing)
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNNER = os.path.join(REPO, "examples", "run_euroc_synthetic.py")

ALL_SEQS = ["MH01", "MH02", "MH03", "MH04", "MH05",
            "V101", "V102", "V103", "V201", "V202", "V203"]


def run_one(seq, mode, frames, stride, out_path):
    cmd = [sys.executable, RUNNER, seq, "--mode", mode,
           "--frames", str(frames), "--out", out_path]
    if mode == "mono":
        cmd += ["--stride", str(stride)]
    print(f"[eval] {' '.join(cmd[1:])}", flush=True)
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO)
    print(f"[eval] {seq} {mode} rc={r.returncode} "
          f"({time.time() - t0:.0f}s)", flush=True)
    return r.returncode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "eval_results.jsonl"))
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--phase", default="all",
                    choices=["all", "mono10", "mono1", "stereo"])
    args = ap.parse_args()

    frames_full = 200 if args.quick else 10 ** 6
    if args.phase in ("all", "mono10"):
        # phase 1: 11-sequence mono survey at stride 10
        for seq in ALL_SEQS:
            run_one(seq, "mono", 150 if args.quick else 400, 10, args.out)
    if args.phase in ("all", "mono1"):
        # phase 2: camera-rate mono, full length (the regression benchmark)
        for seq in ["V101", "V201"]:
            run_one(seq, "mono", frames_full, 1, args.out)
    if args.phase in ("all", "stereo"):
        # phase 3: stereo-inertial camera-rate, full length (headline)
        for seq in ["MH01", "V102", "V103"]:
            run_one(seq, "stereo-imu", frames_full, 1, args.out)


if __name__ == "__main__":
    main()
