"""Trajectory-level accuracy of the TPU-default NN backends.

The headline bench (bench.py) runs with the APPROXIMATE defaults —
block-sparse Pallas 1-NN correspondences + lane-class approximate k-NN
covariances — while every accuracy test (golden, f64 oracle parity) runs
on CPU where the dispatch falls back to the EXACT sweeps. This tool ties
the two together: it replays the shared steady-state sequence
(io/dataset.steady_state_sequence — the exact bench.py configuration,
including exact host hull masks via runner.replay) three times,

  tpu_default : TPU, sparse 1-NN + lane-class k-NN  (the bench config)
  tpu_exact   : TPU, DDLO_NN_IMPL=exact + DDLO_KNN_IMPL=exact
  cpu_exact   : CPU, exact sweeps (the config all accuracy tests run in)

plus a fourth leg (tpu_exact_hulls: default NN backends, EXACT host
hulls) that isolates the device hull approximation — the bench default
since round 4 — and reports pairwise trajectory ATE plus ATE vs the
synthetic ground truth. Targets: ATE(default vs exact NN) < 1 cm,
ATE(device vs exact hulls) < 1 cm, and everything far under the 5 cm
BASELINE.md bar. The reference's own accuracy story is exactly its
trajectory dumps (odom.cc:704-709); the hulls mode defaults to "device"
so the certified configuration IS the bench.py configuration.

Each variant runs in a subprocess because the backend env vars are read
at trace time; the parent is relay-hardened like bench.py (probe with
backoff, killable children). Writes ACCURACY_r03.json at the repo root.

    python tools/accuracy_tpu.py [--scans 64] [--out ACCURACY_r03.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VARIANTS = {
    "tpu_default": {"platform": "tpu", "env": {}},
    "tpu_exact": {
        "platform": "tpu",
        "env": {"DDLO_NN_IMPL": "exact", "DDLO_KNN_IMPL": "exact"},
    },
    "cpu_exact": {
        "platform": "cpu",
        "env": {"DDLO_NN_IMPL": "exact", "DDLO_KNN_IMPL": "exact"},
    },
    # default TPU backends but EXACT host hulls: paired with tpu_default
    # (device hulls) this isolates the hull approximation's trajectory
    # effect — the one knob that changed between BENCH_r03 and BENCH_r04
    "tpu_exact_hulls": {"platform": "tpu", "env": {}, "hulls": "exact"},
}


def run_child(name: str, n_scans: int, out_npz: str, timeout_s: float,
              hulls: str = "device"):
    spec = VARIANTS[name]
    hulls = spec.get("hulls", hulls)
    env = dict(os.environ)
    env.update(spec["env"])
    if spec["platform"] == "cpu":
        # PYTHONPATH=/root/.axon_site dials the TPU relay at interpreter
        # start; the CPU leg must not touch it
        env["PYTHONPATH"] = ""
        env["JAX_PLATFORMS"] = "cpu"
    cmd = [
        sys.executable, os.path.abspath(__file__),
        "--child", "--scans", str(n_scans), "--npz", out_npz,
        "--require-platform", spec["platform"], "--hulls", hulls,
    ]
    r = subprocess.run(
        cmd, cwd=REPO, env=env, timeout=timeout_s,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    if r.returncode != 0:
        raise RuntimeError(
            f"{name} child failed:\n{(r.stderr or r.stdout)[-1200:]}"
        )
    return r.stdout


def child_main(n_scans: int, npz_path: str, require_platform: str,
               hulls: str = "device"):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ddlo_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import numpy as np

    if jax.default_backend() != require_platform:
        raise RuntimeError(
            f"wanted {require_platform}, got {jax.default_backend()}"
        )

    from dynamic_direct_lidar_odometry_tpu import config as cfg_lib
    from dynamic_direct_lidar_odometry_tpu import runner
    from dynamic_direct_lidar_odometry_tpu.io import dataset

    cfg = cfg_lib.bench_config()
    seq = dataset.steady_state_sequence(n_scans=n_scans)
    res = runner.replay(cfg, seq, hulls=hulls)
    ate_gt = runner.ate_rmse(res.poses, seq.gt_poses, res.stamps, seq.stamps)
    np.savez(
        npz_path,
        poses=res.poses,
        stamps=res.stamps,
        ate_gt=ate_gt,
        n_keyframes=res.num_keyframes,
        dropped=res.dropped_scans,
    )
    print(f"ate_vs_gt={ate_gt:.4f} m  keyframes={res.num_keyframes}")


def pairwise_ate(a, b):
    """RMSE between two variants' trajectories, aligned by scan STAMP
    (not raw index): if either variant dropped scans mid-run, index
    alignment would silently compare mismatched scans."""
    import numpy as np

    for v in (a, b):
        if int(v.get("dropped", 0)) != 0:
            raise RuntimeError(
                f"variant dropped {int(v['dropped'])} scans; pairwise ATE "
                "would compare misaligned trajectories"
            )
    sa, sb = np.asarray(a["stamps"]), np.asarray(b["stamps"])
    common, ia, ib = np.intersect1d(sa, sb, return_indices=True)
    if len(common) == 0:
        return float("nan")
    d = a["poses"][ia] - b["poses"][ib]
    return float(np.sqrt(np.mean(np.sum(d * d, axis=1))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=64)
    ap.add_argument("--out", default=os.path.join(REPO, "ACCURACY_r05.json"))
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--reuse", action="store_true",
                    help="skip variants whose .accuracy_runs npz already "
                         "exists (same code/sequence)")
    ap.add_argument("--npz", default="")
    ap.add_argument("--hulls", default="device", choices=("exact", "device"),
                    help="keyframe hull source: host-exact qhull or the "
                         "fully on-device approximations (the bench.py "
                         "default)")
    ap.add_argument("--require-platform", default="tpu")
    args = ap.parse_args()

    if args.child:
        child_main(args.scans, args.npz, args.require_platform,
                   hulls=args.hulls)
        return 0

    import numpy as np
    import time

    import bench  # repo-root bench.py: relay probe/backoff helpers

    results = {}
    tmpdir = os.path.join(REPO, ".accuracy_runs")
    os.makedirs(tmpdir, exist_ok=True)

    # CPU leg first: no relay needed
    for name in ("cpu_exact",):
        npz = os.path.join(tmpdir, f"{name}.npz")
        if args.reuse and os.path.exists(npz):
            print(f"[accuracy] reusing {npz}", flush=True)
            continue
        print(f"[accuracy] running {name} ...", flush=True)
        out = run_child(name, args.scans, npz, timeout_s=3600,
                        hulls=args.hulls)
        print(f"[accuracy] {name}: {out.strip()}", flush=True)

    # TPU legs behind the relay probe
    relay_up = False
    for i, d in enumerate([0, 10, 20, 30, 60, 120]):
        if d:
            print(f"[accuracy] relay down, retry in {d}s", flush=True)
            time.sleep(d)
        ok, info = bench.probe_relay(timeout_s=60.0)
        print(f"[accuracy] probe: {info}", flush=True)
        if ok:
            relay_up = True
            break
    if not relay_up:
        print("[accuracy] relay unavailable; aborting TPU legs")
        return 1

    for name in ("tpu_default", "tpu_exact", "tpu_exact_hulls"):
        npz = os.path.join(tmpdir, f"{name}.npz")
        if args.reuse and os.path.exists(npz):
            print(f"[accuracy] reusing {npz}", flush=True)
            continue
        print(f"[accuracy] running {name} ...", flush=True)
        out = run_child(name, args.scans, npz, timeout_s=2400,
                        hulls=args.hulls)
        print(f"[accuracy] {name}: {out.strip()}", flush=True)

    for name in VARIANTS:
        d = np.load(os.path.join(tmpdir, f"{name}.npz"))
        results[name] = {k: d[k] for k in d.files}

    report = {
        "sequence": f"steady_state_sequence(n_scans={args.scans}), 64x2048, "
                    f"bench_config ({args.hulls} hulls via runner.replay)",
        "n_scans": args.scans,
        "n_keyframes": int(results["tpu_default"]["n_keyframes"]),
        "ate_vs_gt_m": {
            k: round(float(v["ate_gt"]), 5) for k, v in results.items()
        },
        "ate_default_vs_exact_tpu_m": round(
            pairwise_ate(results["tpu_default"], results["tpu_exact"]), 5
        ),
        "ate_default_tpu_vs_cpu_exact_m": round(
            pairwise_ate(results["tpu_default"], results["cpu_exact"]), 5
        ),
        "ate_exact_tpu_vs_cpu_exact_m": round(
            pairwise_ate(results["tpu_exact"], results["cpu_exact"]), 5
        ),
        "ate_device_vs_exact_hulls_m": round(
            pairwise_ate(results["tpu_default"], results["tpu_exact_hulls"]),
            5,
        ),
        "bars": {
            "default_vs_exact_lt_m": 0.01,
            "device_vs_exact_hulls_lt_m": 0.01,
            "vs_gt_lt_m": 0.05,
        },
    }
    report["pass"] = bool(
        report["ate_default_vs_exact_tpu_m"] < 0.01
        and report["ate_device_vs_exact_hulls_m"] < 0.01
        and all(v < 0.05 for v in report["ate_vs_gt_m"].values())
    )
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
