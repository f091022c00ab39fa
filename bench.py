"""Benchmark: per-frame tracking throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: frames/s through the production fused tracking step
(engine/step.py::fused_frame_update — predict -> project 8192 map points ->
coarse/widened/fine masked Hamming matching via the Pallas kernel -> two
pose-LM solves -> observation/statistics bookkeeping), the reference's
per-frame hot path (Tracking::TrackWithMotionModel + TrackLocalMap) as one
device program. Pipelined dispatch (async, one final sync) — the operating
mode of a locally-attached chip. Baseline = 20 fps: the reference's
real-time pacing target on EuRoC (settings/EuRoC.yaml Camera.fps=20,
tests/slam_euroc_si.cc sleeps to hold it) — the published operating point
of the original system on a desktop CPU.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from orb_slam_fusion_tpu import lie
    from orb_slam_fusion_tpu.engine.step import fused_frame_update

    M, F = 8192, 1024
    rng = np.random.RandomState(0)
    use_pallas = jax.default_backend() not in ("cpu",)

    args = dict(
        mp_pos=jnp.asarray(rng.uniform(-4, 4, (M, 3)), jnp.float32)
        + jnp.array([0.0, 0.0, 6.0]),
        mp_desc=jnp.asarray(
            rng.randint(0, 2 ** 32, (M, 8),
                        dtype=np.uint64).astype(np.uint32)),
        mp_valid=jnp.ones(M, bool),
        mp_visible=jnp.zeros(M, jnp.int32),
        mp_found=jnp.zeros(M, jnp.int32),
        prev_pose=lie.se3_identity(),
        pred_pose=lie.se3_identity(),
        kp_uv=jnp.asarray(rng.uniform(0, 470, (F, 2)), jnp.float32),
        kp_desc=jnp.asarray(
            rng.randint(0, 2 ** 32, (F, 8),
                        dtype=np.uint64).astype(np.uint32)),
        kp_valid=jnp.ones(F, bool),
        kp_octave=jnp.zeros(F, jnp.int32),
        inv_sigma2_table=jnp.ones(8, jnp.float32),
        cam_params=jnp.array([458.654, 457.296, 367.215, 248.375],
                             jnp.float32),
    )

    # compile + warmup
    out = fused_frame_update(**args, use_pallas=use_pallas)
    jax.block_until_ready(out.counts)

    # steady-state timing: pipelined dispatch, counters chained through
    # donation like the real tracker does
    n_iters = 50
    t0 = time.perf_counter()
    for _ in range(n_iters):
        args["mp_visible"] = out.mp_visible
        args["mp_found"] = out.mp_found
        out = fused_frame_update(**args, use_pallas=use_pallas)
    jax.block_until_ready(out.counts)
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
