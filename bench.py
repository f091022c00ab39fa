"""Benchmark: production per-frame pipeline throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "note"}.

Metric: frames/s through the KEYFRAME-INCLUSIVE production pipeline — every
frame runs ORB extraction (pyramid -> FAST -> per-cell selection -> IC angle
-> steered BRIEF, frontend/extractor.py) plus the fused tracking step
(predict -> project 8192 map points with scale gates -> coarse/widened/fine
masked Hamming matching -> two pose-LM solves, engine/step.py), and every
8th frame ADDITIONALLY pays the keyframe-rate work the round-1 bench
excluded: the fused mapping step (triangulation vs 3 keyframes, fusion,
culling, normal refresh — engine/mapping.py) and the windowed local bundle
adjustment (solver/local_ba.py). That is the reference's whole loop:
Frame::ExtractORB + TrackWithMotionModel + TrackLocalMap every frame,
ProcessNewKeyFrame/CreateNewMapPoints/SearchInNeighbors + LocalBA at
keyframe rate (1-in-8 matches the observed production keyframe cadence).

Timing methodology: the frame loop runs ON DEVICE via lax.scan (map state
chained frame to frame so no work can be elided; the keyframe branch is a
lax.cond inside the scan), one dispatch per measurement, result fetched to
host to force completion. Per-frame time is the SLOPE between a short and a
long scan, cancelling dispatch/fetch latency — the only honest measurement
through a remotely-attached chip.

A second, host-driven segment measures per-frame LATENCY spread (median /
p99) and the tracking-only fps; those go to stderr so stdout stays one
JSON line.

Baseline = 20 fps: the reference's real-time pacing TARGET on EuRoC
(settings/EuRoC.yaml Camera.fps=20; tests/slam_euroc_si.cc sleeps to hold
it) — vs_baseline is against that target, not a measured reference
throughput.
"""

import functools
import json
import os
import sys
import time

import numpy as np


def _build_world(rng, M, K0, F, H, W, cam_np):
    """Synthetic consistent map: K0 keyframes on a line, each observing a
    subset of the M points with exact projections (a real BA problem)."""
    import jax.numpy as jnp

    from orb_slam_fusion_tpu import lie
    from orb_slam_fusion_tpu.map import map_state as ms

    mp_pos = rng.uniform(-4, 4, (M, 3)).astype(np.float32) \
        + np.array([0, 0, 8], np.float32)
    mp_desc = rng.randint(0, 2 ** 32, (M, 8),
                          dtype=np.uint64).astype(np.uint32)
    m = ms.make_empty_map(256, M, F)
    dist0 = np.linalg.norm(mp_pos, axis=1)
    mn, mx = ms.scale_invariance_band(
        jnp.asarray(dist0), jnp.zeros(M, jnp.int32), 8)
    m, _ = ms.add_map_points(
        m, jnp.asarray(mp_pos), jnp.asarray(mp_desc),
        jnp.asarray(mp_pos / dist0[:, None]),
        jnp.int32(0), jnp.int32(0), jnp.ones(M, bool),
        min_dist=mn, max_dist=mx)

    fx, fy, cx, cy = cam_np
    for k in range(K0):
        C = np.array([0.05 * k, 0.0, 0.06 * k], np.float32)
        t = -C
        pose = lie.SE3(jnp.eye(3), jnp.asarray(t))
        pc = mp_pos + t
        uv = np.stack([fx * pc[:, 0] / pc[:, 2] + cx,
                       fy * pc[:, 1] / pc[:, 2] + cy], axis=1)
        vis = (pc[:, 2] > 0.2) & (uv[:, 0] > 0) & (uv[:, 0] < W) \
            & (uv[:, 1] > 0) & (uv[:, 1] < H)
        rows = np.nonzero(vis)[0]
        rng.shuffle(rows)
        rows = rows[:F]
        n = len(rows)
        f_uv = np.zeros((F, 2), np.float32)
        f_desc = np.zeros((F, 8), np.uint32)
        f_val = np.zeros(F, bool)
        obs = np.full(F, -1, np.int32)
        f_uv[:n] = uv[rows]
        f_desc[:n] = mp_desc[rows]
        f_val[:n] = True
        obs[:n] = rows
        m, _ = ms.add_keyframe(
            m, pose, 0.05 * k, jnp.asarray(f_uv), jnp.asarray(f_desc),
            jnp.zeros(F, jnp.int32), jnp.asarray(f_val), jnp.asarray(obs))
    return m


def _probe_backend(attempts: int = 3, probe_timeout: int = 60) -> str:
    """Probe the (remotely tunneled) accelerator backend in a SUBPROCESS
    with a hard timeout, retrying with backoff.

    Round-2 postmortem: the axon TPU tunnel was down for the whole judging
    session and bench.py died at backend init, so the round recorded no
    number at all. A subprocess probe can neither hang the bench nor poison
    the parent's backend state; on persistent failure we fall back to CPU
    and SAY SO in the emitted JSON instead of recording nothing.
    Returns "" (default backend looks healthy) or an error string.
    """
    import subprocess
    last_err = "unknown"
    for attempt in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices(); "
                 "print(d[0].platform, len(d))"],
                capture_output=True, text=True, timeout=probe_timeout)
            if r.returncode == 0 and r.stdout.strip():
                print(f"backend probe ok: {r.stdout.strip()}",
                      file=sys.stderr)
                return ""
            last_err = (r.stderr.strip().splitlines() or ["rc=%d" % r.returncode])[-1][:300]
        except subprocess.TimeoutExpired:
            last_err = f"probe timed out after {probe_timeout}s"
        print(f"backend probe attempt {attempt + 1}/{attempts} failed: "
              f"{last_err}", file=sys.stderr)
        if attempt + 1 < attempts:
            time.sleep(15 * (attempt + 1))
    return last_err


def main():
    import jax
    probe_err = ""
    if os.environ.get("OSF_BENCH_CPU") == "1":   # smoke-test path
        jax.config.update("jax_platforms", "cpu")
    else:
        probe_err = _probe_backend()
        if probe_err:
            jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: the three scan programs (k_short/k_long/1)
    # embed the whole mapping+local-BA pipeline and take minutes to compile
    # through the remote-chip tunnel on a cold start; cached, a re-run (the
    # driver's end-of-round invocation) skips straight to measurement
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from orb_slam_fusion_tpu import lie
    from orb_slam_fusion_tpu.engine.mapping import mapping_step
    from orb_slam_fusion_tpu.engine.step import fused_frame_update
    from orb_slam_fusion_tpu.frontend.extractor import (
        OrbParams, extract_features, inv_scale_sigma2)
    from orb_slam_fusion_tpu.solver.local_ba import local_ba_step

    M, F = 8192, 1024
    H, W = 480, 752
    KF_EVERY = 8
    BA_W = 12          # ba_window + fixed ring at production config
    rng = np.random.RandomState(0)
    use_pallas = jax.default_backend() not in ("cpu",) \
        and os.environ.get("OSF_BENCH_NO_PALLAS") != "1"
    params = OrbParams(n_features=F)

    # synthetic scene: textured image (rectangles on noise -> real FAST
    # corners on every octave) + consistent multi-KF map
    img_np = rng.rand(H, W).astype(np.float32) * 20
    for _ in range(120):
        y, x = rng.randint(20, H - 40), rng.randint(20, W - 40)
        h, w = rng.randint(8, 40), rng.randint(8, 40)
        img_np[y:y + h, x:x + w] += rng.uniform(60, 200)
    img = jnp.asarray(np.clip(img_np, 0, 255))
    cam = jnp.array([458.654, 457.296, 367.215, 248.375], jnp.float32)
    cam_np = np.array([458.654, 457.296, 367.215, 248.375])
    inv_s2 = inv_scale_sigma2(params)

    m0 = _build_world(rng, M, 24, F, H, W, cam_np)

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_frames(m, R, t, k):
        """k production frames back to back on device."""
        def track(m, prev, feats):
            return fused_frame_update(
                m.mp_pos, m.mp_desc, m.mp_valid,
                m.mp_visible, m.mp_found,
                prev, prev,
                feats.uv, feats.desc, feats.valid, feats.octave,
                inv_s2, cam,
                mp_normal=m.mp_normal, mp_min_dist=m.mp_min_dist,
                mp_max_dist=m.mp_max_dist,
                img_h=H, img_w=W, use_pallas=use_pallas)

        def kf_work(m, pose, feats, obs):
            prev_ids = jnp.stack([m.n_kf - 1, m.n_kf - 2, m.n_kf - 3])
            res = mapping_step(
                m, pose, 0.0, feats.uv, feats.desc, feats.octave,
                feats.valid, obs, prev_ids.astype(jnp.int32), cam,
                img_h=H, img_w=W)
            m2 = res.map
            window = m2.n_kf - BA_W + jnp.arange(BA_W, dtype=jnp.int32)
            window = jnp.where(window >= 0, window, -1)
            fixed = jnp.arange(BA_W) < 2
            fixed = fixed | (window < 0)
            m3, costs, n_edges = local_ba_step(
                m2, window, fixed, inv_s2, cam,
                iters_first=5, iters_second=10)
            return m3

        def body(carry, i):
            m, R, t, ext_c = carry
            prev = lie.SE3(R, t)
            # extraction ties to its own carry so it re-runs every frame
            # but does not wait on the previous frame's tracking (the
            # production dependency shape — XLA overlaps them)
            feats = extract_features(img + ext_c * 1e-20, params)
            upd = track(m, prev, feats)
            m = m._replace(mp_visible=upd.mp_visible, mp_found=upd.mp_found)
            m = jax.lax.cond(
                i % KF_EVERY == KF_EVERY - 1,
                lambda mm: kf_work(mm, upd.pose, feats, upd.obs),
                lambda mm: mm, m)
            ext_c = jnp.sum(feats.uv[0]) * 1e-20
            return (m, upd.pose.R, upd.pose.t, ext_c), upd.counts

        carry, counts = jax.lax.scan(
            body, (m, R, t, jnp.float32(0)),
            jnp.arange(k, dtype=jnp.int32))
        return carry, counts

    ident = lie.se3_identity()

    def run(k):
        _, counts = run_frames(m0, ident.R, ident.t, k)
        return np.asarray(counts[-1])  # D2H fetch forces completion

    k_short, k_long = 16, 64
    for k in (k_short, k_long):       # compile both lengths
        t0 = time.perf_counter()
        c = run(k)
        print(f"compile+first-run k={k}: {time.perf_counter() - t0:.1f} s",
              file=sys.stderr)
    t = {}
    for k in (k_short, k_long):       # best of 3 to shed scheduling noise
        t[k] = min(
            (lambda t0: (run(k), time.perf_counter() - t0)[1])(
                time.perf_counter())
            for _ in range(3))
    per_frame = (t[k_long] - t[k_short]) / (k_long - k_short)
    fps = 1.0 / per_frame

    # ---- secondary: host-driven per-frame latency spread (stderr) -------
    lat = []
    state = (m0, ident.R, ident.t)
    run_frames(state[0], state[1], state[2], 1)  # compile k=1
    for i in range(40):
        t0 = time.perf_counter()
        carry, counts = run_frames(state[0], state[1], state[2], 1)
        np.asarray(counts[-1])
        lat.append(time.perf_counter() - t0)
    lat = np.sort(np.asarray(lat[8:]))  # drop warm-up
    med = float(np.median(lat))
    p99 = float(lat[int(0.99 * (len(lat) - 1))])
    print(f"host-driven single-frame latency: median {med*1e3:.2f} ms, "
          f"p99 {p99*1e3:.2f} ms (p99/median {p99/max(med,1e-9):.2f}; "
          f"includes tunnel dispatch+fetch)", file=sys.stderr)

    # ---- kernel cost statement: the three dominant device programs -----
    # DEVICE time per dispatch via the scan-slope method (time a k-short
    # and a k-long on-device loop of the kernel, report the slope): a
    # single timed dispatch through the remotely-tunneled chip measures
    # mostly the ~30 ms host<->device round trip, overstating every kernel
    # (round-4 table: local_ba "119 ms" vs 29 ms true device time). XLA's
    # cost-analysis FLOP/byte counts -> rough utilization; denominator is
    # the chip's peak (v5e: ~197 TFLOP/s bf16 / ~98 fp32, ~819 GB/s HBM).
    # These programs are fp32 and matching/gather-heavy, so the honest
    # statement for most of them is HBM-bound utilization, not MXU MFU.
    kernels = {}
    try:
        PEAK_FLOPS = 98e12 if jax.default_backend() != "cpu" else 1e11
        PEAK_BYTES = 819e9 if jax.default_backend() != "cpu" else 5e10

        feats0 = extract_features(img, params)

        def time_call(fn, *a, k_short=2, k_long=8, reps=3, **kw):
            """Per-dispatch device time: slope between a k_short- and a
            k_long-iteration on-device scan of the kernel. `fn(jitter,
            *a)` must mix the scalar `jitter` into an input (so the scan
            body is data-chained and XLA cannot hoist it), and the result
            is FETCHED, not just block_until_ready'd — the remote
            backend's ready signal returns before execution completes."""
            out0 = fn(jnp.float32(0), *a, **kw)   # output template

            @functools.partial(jax.jit, static_argnames=("k",))
            def jloop(k):
                def body(c, _):
                    out = fn(c, *a, **kw)
                    # chain EVERY output leaf into the carry — probing one
                    # leaf lets XLA dead-code-eliminate the rest of the
                    # kernel (measured: mapping_step "0.0 ms")
                    probe = sum(jnp.sum(leaf.astype(jnp.float32))
                                for leaf in jax.tree_util.tree_leaves(out)
                                ) * 1e-20
                    return probe, probe
                return jax.lax.scan(body, jnp.float32(0),
                                    None, length=k)[0]

            def timed(k):
                np.asarray(jloop(k))    # warm/compile
                best = 1e9
                for _ in range(reps):
                    t0 = time.perf_counter()
                    np.asarray(jloop(k))
                    best = min(best, time.perf_counter() - t0)
                return best

            slope = (timed(k_long) - timed(k_short)) / (k_long - k_short)
            return max(slope, 1e-6), out0

        def cost_of(fn, *a, **kw):
            try:
                an = jax.jit(fn).lower(*a, **kw).compile().cost_analysis()
                if isinstance(an, (list, tuple)):
                    an = an[0]
                return float(an.get("flops", 0.0)), \
                    float(an.get("bytes accessed", 0.0))
            except Exception:
                return 0.0, 0.0

        def ext_fn(j):
            return extract_features(img + j, params)

        def track_fn(j, m, R, t, feats):
            # +0: the fused step donates the counter buffers
            return fused_frame_update(
                m.mp_pos + j, m.mp_desc, m.mp_valid,
                m.mp_visible + 0, m.mp_found + 0,
                lie.SE3(R, t), lie.SE3(R, t),
                feats.uv, feats.desc, feats.valid, feats.octave,
                inv_s2, cam, mp_normal=m.mp_normal,
                mp_min_dist=m.mp_min_dist, mp_max_dist=m.mp_max_dist,
                img_h=H, img_w=W, use_pallas=use_pallas)

        def map_fn(j, m, R, t, feats, obs):
            prev_ids = jnp.stack([m.n_kf - 1, m.n_kf - 2, m.n_kf - 3])
            return mapping_step(
                m._replace(mp_pos=m.mp_pos + j), lie.SE3(R, t), 0.0,
                feats.uv, feats.desc, feats.octave,
                feats.valid, obs, prev_ids.astype(jnp.int32), cam,
                img_h=H, img_w=W).map

        def ba_fn(j, m):
            window = m.n_kf - BA_W + jnp.arange(BA_W, dtype=jnp.int32)
            fixed = (jnp.arange(BA_W) < 2) | (window < 0)
            return local_ba_step(m._replace(mp_pos=m.mp_pos + j),
                                 jnp.where(window >= 0, window, -1),
                                 fixed, inv_s2, cam,
                                 iters_first=5, iters_second=10)[0]

        t_ext, _ = time_call(ext_fn)
        t_trk, upd0 = time_call(track_fn, m0, ident.R, ident.t, feats0)
        t_map, _ = time_call(map_fn, m0, ident.R, ident.t, feats0,
                             upd0.obs)
        t_ba, _ = time_call(ba_fn, m0)
        z = jnp.float32(0)
        for name, tt, (fl, by) in (
                ("orb_extract", t_ext, cost_of(ext_fn, z)),
                ("frame_update", t_trk, cost_of(
                    track_fn, z, m0, ident.R, ident.t, feats0)),
                ("mapping_step", t_map, cost_of(
                    map_fn, z, m0, ident.R, ident.t, feats0, upd0.obs)),
                ("local_ba_15it", t_ba, cost_of(ba_fn, z, m0))):
            kernels[name] = {
                "ms": round(tt * 1e3, 2),
                "gflops": round(fl / 1e9, 2),
                "flops_util_pct": round(100 * fl / tt / PEAK_FLOPS, 2),
                "hbm_util_pct": round(100 * by / tt / PEAK_BYTES, 1),
            }
        print("kernel costs (per dispatch, XLA cost analysis): "
              + json.dumps(kernels), file=sys.stderr)
    except Exception as e:  # cost statement must never kill the bench
        print(f"kernel cost section failed: {e}", file=sys.stderr)

    note = ("keyframe-inclusive: extraction+tracking every frame, "
            "mapping+local-BA every 8th (measured production cadence: "
            "7.7 frames/KF on MH01 stereo-imu at camera rate — see "
            "EVAL.md per-sequence kf rates); vs_baseline is against the "
            "reference's 20 fps real-time pacing target")
    if probe_err:
        note = (f"TPU TUNNEL UNREACHABLE ({probe_err}); CPU-fallback "
                f"number, NOT a chip measurement. " + note)
    print(json.dumps({
        "metric": "production_pipeline_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 20.0, 3),
        "backend": jax.default_backend(),
        "latency_ms": {"median": round(med * 1e3, 2),
                       "p99": round(p99 * 1e3, 2)},
        "kernels": kernels,
        "note": note,
    }))


if __name__ == "__main__":
    main()
