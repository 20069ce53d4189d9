"""Scaling bench: batched GICP registrations/s across the device mesh.

The BASELINE.json north-star unit: independent scan-pair registrations
sharded over ``dp`` with psum-reduced Gauss-Newton blocks over ``pt``.
Runs on whatever devices exist (the real chip, or a CPU mesh via
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu).

    python tools/bench_registrations.py [--batch 32] [--n 4096] [--pt 1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n", type=int, default=4096, help="points per cloud")
    ap.add_argument("--pt", type=int, default=1, help="point-shard group")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from dynamic_direct_lidar_odometry_tpu.ops import covariance, gicp
    from dynamic_direct_lidar_odometry_tpu.parallel import sharding

    ndev = len(jax.devices())
    mesh = sharding.make_mesh(ndev, pt=args.pt)
    print(f"devices={ndev} mesh=(dp={ndev // args.pt}, pt={args.pt}) "
          f"batch={args.batch} n={args.n}")

    rng = np.random.default_rng(0)
    B, N = args.batch, args.n
    src = rng.uniform(-20, 20, (B, N, 3)).astype(np.float32)
    dT = rng.uniform(-0.1, 0.1, (B, 1, 3)).astype(np.float32)
    tgt = src + dT
    mask = np.ones((B, N), bool)

    covs = jax.jit(jax.vmap(
        lambda p, m: covariance.plane_covariances(p, m, k=10)
    ))(jnp.asarray(src), jnp.asarray(mask))
    tcovs = jax.jit(jax.vmap(
        lambda p, m: covariance.plane_covariances(p, m, k=10)
    ))(jnp.asarray(tgt), jnp.asarray(mask))

    settings = gicp.GICPSettings(max_iterations=16, compute_residuals=False)
    align = sharding.batched_align(mesh, settings, point_sharded=args.pt > 1)

    guess = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    arrs = (jnp.asarray(src), jnp.asarray(mask), covs,
            jnp.asarray(tgt), jnp.asarray(mask), tcovs, guess)
    arrs = tuple(sharding.shard_batch(mesh, a) for a in arrs)

    out = align(*arrs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = align(*arrs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.iters
    rps = B / dt
    print(f"converged: {int(jnp.sum(out.converged))}/{B}")
    print(f"registrations/s: {rps:.1f}  ({rps / ndev:.1f} per device, "
          f"{dt * 1e3:.1f} ms per batch)")


if __name__ == "__main__":
    main()
