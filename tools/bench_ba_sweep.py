"""Distributed-BA scaling sweep -> ba_scaling.json (the EVAL.md table).

Runs tools/bench_ba.py at 1/2/4/8 virtual CPU devices (each sweep point is
a fresh process so xla_force_host_platform_device_count takes effect) and
records LM iters/s for the single-device Schur engine and the
landmark-sharded distributed engine at each mesh size.

This is the measurement the round-3 verdict asked for (#5). Caveats are
recorded in the output: a virtual CPU mesh time-slices N devices onto this
host's physical cores, so *absolute* distributed numbers are pessimistic
lower bounds (devices beyond the core count add pure overhead and no real
parallel compute); the quantity that transfers to a real ICI-connected TPU
mesh is the per-device work reduction, which is reported as
``factor_eval_share`` (fraction of factor-evaluation work each device
does). Run:

    python tools/bench_ba_sweep.py [--out ba_scaling.json]
        [--kf 16] [--pts 4096] [--obs 4] [--devices 1 2 4 8]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "tools", "bench_ba.py")


def run_point(n_dev, kf, pts, obs):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_dev} "
        + env.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", ""))
    cmd = [sys.executable, BENCH, "--kf", str(kf), "--pts", str(pts),
           "--obs", str(obs), "--dist", "--devices", str(n_dev)]
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                       text=True)
    rows = [json.loads(l) for l in r.stdout.splitlines()
            if l.startswith("{")]
    print(f"[sweep] devices={n_dev} rc={r.returncode} "
          f"({time.time() - t0:.0f}s): "
          + "; ".join(f"{x['metric']}={x['lm_iters_per_s']}"
                      for x in rows), flush=True)
    if r.returncode != 0:
        print(r.stderr[-2000:], flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "ba_scaling.json"))
    ap.add_argument("--kf", type=int, default=16)
    ap.add_argument("--pts", type=int, default=4096)
    ap.add_argument("--obs", type=int, default=4)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    args = ap.parse_args()

    table = []
    single = None
    for n in args.devices:
        rows = run_point(n, args.kf, args.pts, args.obs)
        loc = next((x for x in rows if x["metric"] == "local_ba_rate"),
                   None)
        dist = next((x for x in rows
                     if x["metric"] == "distributed_ba_rate"), None)
        if loc and single is None:
            single = loc["lm_iters_per_s"]
        if dist:
            table.append({
                "devices": n,
                "dist_lm_iters_per_s": dist["lm_iters_per_s"],
                "factor_eval_share": round(1.0 / n, 3),
            })
    out = {
        "protocol": {
            "window_kf": args.kf, "points": args.pts,
            "obs_per_point": args.obs,
            "note": ("virtual CPU mesh on this host (2 physical cores): "
                     "N virtual devices time-slice the cores, so "
                     "distributed rates at N>cores are pessimistic lower "
                     "bounds; per-device factor work is the quantity that "
                     "transfers to a real ICI mesh"),
        },
        "single_device_lm_iters_per_s": single,
        "distributed": table,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
