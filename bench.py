"""Benchmark: per-frame tracking throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: frames/s through the fused tracking step (predict -> project 8192
map points -> two-stage masked Hamming matching -> two pose-LM solves), the
reference's per-frame hot path (Tracking::TrackWithMotionModel +
TrackLocalMap). Baseline = 20 fps: the reference's real-time pacing target
on EuRoC (settings/EuRoC.yaml Camera.fps=20, tests/slam_euroc_si.cc sleeps
to hold it) — the published operating point of the original system on a
desktop CPU.
"""

import json
import time

import numpy as np


def main():
    import jax

    from __graft_entry__ import entry

    fn, args = entry()
    jfn = jax.jit(fn)

    # compile + warmup
    out = jfn(*args)
    jax.block_until_ready(out)

    # steady-state timing
    n_iters = 50
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = jfn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = n_iters / dt
    print(json.dumps({
        "metric": "tracking_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 20.0, 3),
    }))


if __name__ == "__main__":
    main()
