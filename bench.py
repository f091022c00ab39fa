"""Benchmark: full per-frame pipeline throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: frames/s through the complete per-frame visual pipeline as it runs
in production — ORB extraction (pyramid -> FAST -> per-cell selection ->
IC angle -> steered BRIEF, frontend/extractor.py) followed by the fused
tracking step (predict -> project 8192 map points -> coarse/widened/fine
masked Hamming matching -> two pose-LM solves -> bookkeeping,
engine/step.py). This is the reference's whole per-frame hot path
(Frame::ExtractORB + Tracking::TrackWithMotionModel + TrackLocalMap).

Timing methodology: the frame loop runs ON DEVICE via lax.scan (state
chained frame to frame so no work can be elided), one dispatch per
measurement, result fetched to host to force completion. Per-frame time is
the SLOPE between a short and a long scan, cancelling dispatch/fetch
latency — the only honest measurement through a remotely-attached chip,
and the fair one for a locally-attached chip too.

Baseline = 20 fps: the reference's real-time pacing target on EuRoC
(settings/EuRoC.yaml Camera.fps=20; tests/slam_euroc_si.cc sleeps to hold
it) — the published operating point of the original system on a desktop
CPU.
"""

import functools
import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from orb_slam_fusion_tpu import lie
    from orb_slam_fusion_tpu.engine.step import fused_frame_update
    from orb_slam_fusion_tpu.frontend.extractor import (
        OrbParams, extract_features, inv_scale_sigma2)

    M, F = 8192, 1024
    H, W = 480, 752
    rng = np.random.RandomState(0)
    use_pallas = jax.default_backend() not in ("cpu",) \
        and os.environ.get("OSF_BENCH_NO_PALLAS") != "1"
    params = OrbParams(n_features=F)

    # synthetic scene: textured image (rectangles on noise -> real FAST
    # corners on every octave) + map-point table
    img_np = rng.rand(H, W).astype(np.float32) * 20
    for _ in range(120):
        y, x = rng.randint(20, H - 40), rng.randint(20, W - 40)
        h, w = rng.randint(8, 40), rng.randint(8, 40)
        img_np[y:y + h, x:x + w] += rng.uniform(60, 200)
    img = jnp.asarray(np.clip(img_np, 0, 255))

    mp_pos = jnp.asarray(rng.uniform(-4, 4, (M, 3)), jnp.float32) \
        + jnp.array([0.0, 0.0, 6.0])
    mp_desc = jnp.asarray(
        rng.randint(0, 2 ** 32, (M, 8), dtype=np.uint64).astype(np.uint32))
    cam = jnp.array([458.654, 457.296, 367.215, 248.375], jnp.float32)
    inv_s2 = inv_scale_sigma2(params)

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_frames(mp_visible, mp_found, R, t, k):
        """k production frames back to back on device: extract + track.

        The carry (counters + pose) chains every frame to the next, so the
        whole scan must execute before the fetched result is available."""
        def body(carry, _):
            mp_vis, mp_fnd, R, t, ext_c = carry
            prev = lie.SE3(R, t)
            # tie extraction to ITS OWN carry so it re-runs every frame but
            # does NOT wait on the previous frame's tracking — production
            # has the same dependency shape (extraction is independent of
            # tracking), which lets XLA overlap frame n+1's extraction with
            # frame n's tracking stages
            feats = extract_features(img + ext_c * 1e-20, params)
            out = fused_frame_update(
                mp_pos=mp_pos, mp_desc=mp_desc,
                mp_valid=jnp.ones(M, bool),
                mp_visible=mp_vis, mp_found=mp_fnd,
                prev_pose=prev, pred_pose=prev,
                kp_uv=feats.uv, kp_desc=feats.desc, kp_valid=feats.valid,
                kp_octave=feats.octave, inv_sigma2_table=inv_s2,
                cam_params=cam, img_h=H, img_w=W, use_pallas=use_pallas)
            ext_c = jnp.sum(feats.uv[0]) * 1e-20
            return ((out.mp_visible, out.mp_found, out.pose.R, out.pose.t,
                     ext_c), out.counts)
        carry, counts = jax.lax.scan(
            body, (mp_visible, mp_found, R, t, jnp.float32(0)), None,
            length=k)
        return carry, counts

    z = jnp.zeros(M, jnp.int32)
    ident = lie.se3_identity()

    def run(k):
        _, counts = run_frames(z, z, ident.R, ident.t, k)
        np.asarray(counts[-1])  # D2H fetch forces completion

    k_short, k_long = 10, 60
    for k in (k_short, k_long):       # compile both lengths
        run(k)
    t = {}
    for k in (k_short, k_long):       # best of 3 to shed scheduling noise
        t[k] = min(
            (lambda t0: (run(k), time.perf_counter() - t0)[1])(
                time.perf_counter())
            for _ in range(3))
    per_frame = (t[k_long] - t[k_short]) / (k_long - k_short)

    fps = 1.0 / per_frame
    print(json.dumps({
        "metric": "frame_pipeline_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 20.0, 3),
    }))


if __name__ == "__main__":
    main()
