"""One-shot TPU measurement sweep: pipeline rate per NN backend.

Run when the relay is up to settle every pending perf question at once
(CLAUDE.md "Perf state"): times the FULL pipeline step at bench scale
(64x2048, 16k points, 64k submap) for each correspondence backend —
"auto" (exact Pallas sweep), "sparse"
(AABB-pruned sweep) — plus per-stage timings for the winner.

    python tools/tpu_sweep.py [--scans 20] [--impls auto,sparse]

Prints a table + one JSON line with every measurement. The winner
should become the default (flip DDLO_NN_IMPL mapping / GICPSettings
default) and bench.py re-run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ddlo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np


def bench_scale_setup():
    from dynamic_direct_lidar_odometry_tpu import config as cfg_lib
    from dynamic_direct_lidar_odometry_tpu.io import dataset

    cfg = cfg_lib.bench_config()
    seq = dataset.steady_state_sequence(n_scans=40)
    scans = [
        (jnp.asarray(seq.points[i]), jnp.asarray(seq.mask[i]))
        for i in range(len(seq))
    ]
    return cfg, scans


def time_pipeline(cfg, scans, n_timed: int):
    from dynamic_direct_lidar_odometry_tpu import pipeline

    state = pipeline.init_state(cfg, scans[0][0], scans[0][1], 0.0)
    state, _ = pipeline.step(
        cfg, state, scans[1][0], scans[1][1], jnp.float32(0.1)
    )
    # relay-honest sync: block_until_ready returns at enqueue (devtime.py)
    from dynamic_direct_lidar_odometry_tpu.utils import devtime

    devtime.sync(state)
    fetch_ov = devtime.fetch_overhead(state)
    t0 = time.perf_counter()
    for i in range(n_timed):
        pts, mask = scans[2 + (i % (len(scans) - 2))]
        state, out = pipeline.step(
            cfg, state, pts, mask, jnp.float32(0.2 + 0.1 * i)
        )
    devtime.sync(state)
    dt = max(time.perf_counter() - t0 - fetch_ov, 1e-9) / n_timed
    return dt * 1e3  # ms per scan


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=20)
    ap.add_argument("--impls", default="auto,sparse")
    args = ap.parse_args()

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    cfg, scans = bench_scale_setup()

    results = {}
    for impl in args.impls.split(","):
        os.environ["DDLO_NN_IMPL"] = impl
        # DDLO_NN_IMPL is read at TRACE time (odometry._settings); with a
        # warm jit cache the env change would never retrace and every
        # impl would silently time the first one's executable — clear the
        # in-memory caches so each impl compiles its own pipeline (the
        # persistent compile cache keeps repeat sweeps fast)
        jax.clear_caches()
        try:
            ms = time_pipeline(cfg, scans, args.scans)
            results[impl] = round(ms, 2)
            print(f"pipeline.step [{impl:7s}] {ms:8.2f} ms  "
                  f"({1e3 / ms:.1f} Hz)")
        except Exception as e:  # Mosaic lowering / VMEM failures
            results[impl] = f"FAILED: {type(e).__name__}: {str(e)[:200]}"
            print(f"pipeline.step [{impl:7s}] FAILED: {str(e)[:200]}")
    os.environ.pop("DDLO_NN_IMPL", None)

    numeric = {k: v for k, v in results.items() if isinstance(v, float)}
    winner = min(numeric, key=numeric.get) if numeric else None
    print(json.dumps({
        "metric": "pipeline_step_ms_by_nn_impl",
        "results": results,
        "winner": winner,
        "winner_hz": round(1e3 / numeric[winner], 2) if winner else None,
    }))


if __name__ == "__main__":
    main()
