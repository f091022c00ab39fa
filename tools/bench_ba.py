"""Bundle-adjustment rate benchmark (BASELINE.md metric (c)).

Measures LM iterations/s through the Schur-complement BA engine at
reference-like local-BA shapes (window of keyframes + their landmarks,
reference Optimizer::LocalBundleAdjustment / LocalInertialBA windows), and
the distributed landmark-sharded variant over a device mesh. Reported as
"BA rate = LM iterations x window size / second" per the measurement
protocol in BASELINE.md.

Run on the real TPU:        python tools/bench_ba.py
Virtual 8-device CPU mesh:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
                            python tools/bench_ba.py --dist
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_problem(n_kf, n_pts, obs_per_pt, seed=0):
    import jax.numpy as jnp

    from orb_slam_fusion_tpu import lie
    from orb_slam_fusion_tpu.solver import ba

    rng = np.random.RandomState(seed)
    cam = jnp.array([458.654, 457.296, 367.215, 248.375], jnp.float32)
    pts = rng.uniform(-4, 4, (n_pts, 3)).astype(np.float32)
    pts[:, 2] += 8.0
    Rs, ts = [], []
    for k in range(n_kf):
        w = 0.02 * rng.randn(3)
        R = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
        t = np.array([0.15 * k, 0.0, 0.0]) + 0.01 * rng.randn(3)
        Rs.append(R)
        ts.append(-R @ t)
    poses = lie.SE3(jnp.asarray(np.stack(Rs), jnp.float32),
                    jnp.asarray(np.stack(ts), jnp.float32))
    kf_idx = np.repeat(np.arange(n_pts) % n_kf, obs_per_pt)
    kf_idx = (kf_idx + np.tile(np.arange(obs_per_pt), n_pts)) % n_kf
    mp_idx = np.repeat(np.arange(n_pts), obs_per_pt)
    pc = np.einsum("kij,nj->kni", np.stack(Rs), pts) + np.stack(ts)[:, None]
    pcs = pc[kf_idx, mp_idx]
    uv = pcs[:, :2] / pcs[:, 2:3] * [458.654, 457.296] + [367.215, 248.375]
    uv += 0.4 * rng.randn(*uv.shape)
    import jax.numpy as jnp
    F = len(mp_idx)
    fixed = np.zeros(n_kf, bool)
    fixed[:2] = True
    prob = ba.make_problem(
        poses, jnp.asarray(pts + 0.05 * rng.randn(n_pts, 3).astype(
            np.float32)),
        jnp.asarray(kf_idx, jnp.int32), jnp.asarray(mp_idx, jnp.int32),
        jnp.asarray(uv, jnp.float32), jnp.ones(F, jnp.float32),
        jnp.ones(F, bool), jnp.asarray(fixed), cam)
    return prob


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kf", type=int, default=16,
                    help="window size (reference bLarge window: 25)")
    ap.add_argument("--pts", type=int, default=4096)
    ap.add_argument("--obs", type=int, default=4, help="observations/point")
    ap.add_argument("--dist", action="store_true",
                    help="also run the landmark-sharded distributed BA")
    ap.add_argument("--devices", type=int, default=0,
                    help="mesh size for --dist (0 = all devices); use with "
                         "xla_force_host_platform_device_count to sweep the "
                         "1/2/4/8 scaling table")
    args = ap.parse_args()

    import jax
    # the environment's sitecustomize pins jax_platforms to the remote-TPU
    # backend regardless of JAX_PLATFORMS; honor an explicit cpu request
    # with the config override that actually works (see tests/conftest.py)
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from orb_slam_fusion_tpu.solver import ba

    prob = make_problem(args.kf, args.pts, args.obs)
    n_factors = int(prob.valid.shape[0])

    @functools.partial(jax.jit, static_argnames=("reps",))
    def run(reps):
        def body(c, _):
            p2 = prob._replace(poses=c[0], points=c[1])
            poses, points, _, costs = ba.bundle_adjustment(
                p2, iters_first=5, iters_second=10)
            return (poses, points), costs[-1]
        (poses, points), costs = jax.lax.scan(
            body, (prob.poses, prob.points), None, length=reps)
        return costs

    iters_per_call = 15

    def timed(reps):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(reps))
            best = min(best, time.perf_counter() - t0)
        return best

    run(1); run(5)
    per_call = (timed(5) - timed(1)) / 4
    iters_s = iters_per_call / per_call
    rate = iters_s * args.kf
    print(json.dumps({
        "metric": "local_ba_rate",
        "backend": jax.default_backend(),
        "window_kf": args.kf, "points": args.pts, "factors": n_factors,
        "lm_iters_per_s": round(iters_s, 1),
        "ba_rate_iters_x_window_per_s": round(rate, 1),
    }))

    if args.dist:
        import jax.numpy as jnp

        from orb_slam_fusion_tpu.parallel import (
            distributed_bundle_adjustment, make_slam_mesh)
        mesh = make_slam_mesh(args.devices or None)
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))

        @functools.partial(jax.jit, static_argnames=("reps",))
        def run_d(reps):
            def body(c, _):
                p2 = prob._replace(poses=c[0], points=c[1])
                poses, points, costs = distributed_bundle_adjustment(
                    p2, mesh, iters=15)
                return (poses, points), costs[-1]
            (poses, points), costs = jax.lax.scan(
                body, (prob.poses, prob.points), None, length=reps)
            return costs

        def timed_d(reps):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(run_d(reps))
                best = min(best, time.perf_counter() - t0)
            return best

        run_d(1); run_d(5)
        per_call = (timed_d(5) - timed_d(1)) / 4
        iters_s = iters_per_call / per_call
        print(json.dumps({
            "metric": "distributed_ba_rate",
            "devices": n_dev,
            "lm_iters_per_s": round(iters_s, 1),
            "ba_rate_iters_x_window_per_s": round(iters_s * args.kf, 1),
        }))


if __name__ == "__main__":
    main()
