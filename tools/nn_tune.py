"""Tune the block-sparse NN kernel: AABB mask density + time vs tile sizes.

The sparse kernel's win is entirely set by how many (query-tile, target-
chunk) pairs the AABB overlap mask prunes, which in turn depends on the
spatial ordering of the clouds (filters.voxel_downsample sorts by Morton
key exactly so these chunks are tight). This sweep reports, at bench
scale (16k scan vs 64k submap), the mask density and kernel time for a
grid of (q_tile, t_chunk), plus the resulting S2M align time.

    python tools/nn_tune.py
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ddlo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np


def mask_density(q, t, radius, q_tile, t_chunk):
    qn = np.asarray(q)
    tn = np.asarray(t)
    pad_q = (-len(qn)) % q_tile
    pad_t = (-len(tn)) % t_chunk
    qn = np.pad(qn, ((0, pad_q), (0, 0)))
    tn = np.pad(tn, ((0, pad_t), (0, 0)), constant_values=1.0e6)
    qb = qn.reshape(-1, q_tile, 3)
    tb = tn.reshape(-1, t_chunk, 3)
    q_lo, q_hi = qb.min(axis=1), qb.max(axis=1)
    t_lo, t_hi = tb.min(axis=1), tb.max(axis=1)
    overlap = np.all(
        (q_lo[:, None] - radius <= t_hi[None])
        & (q_hi[:, None] + radius >= t_lo[None]),
        axis=-1,
    )
    return float(overlap.mean())


def main():
    from dynamic_direct_lidar_odometry_tpu import config as cfg_lib
    from dynamic_direct_lidar_odometry_tpu import pipeline
    from dynamic_direct_lidar_odometry_tpu.io import synthetic
    from dynamic_direct_lidar_odometry_tpu.odometry import (
        keyframes as kfmod,
        preprocess as prep,
    )
    from dynamic_direct_lidar_odometry_tpu.ops import covariance, gicp, nn_pallas
    from dynamic_direct_lidar_odometry_tpu.utils import devtime

    cfg = cfg_lib.doals_config()
    cfg = dataclasses.replace(
        cfg,
        capacity=dataclasses.replace(
            cfg.capacity,
            max_points=16384,
            max_submap_points=65536,
            max_keyframes=64,
            max_keyframe_points=8192,
            nn_chunk=2048,
        ),
    )
    H, W = cfg.detection.rows, cfg.detection.columns
    print(f"devices: {jax.devices()}")

    world = synthetic.World.town(seed=3, n_static=10)
    rng = np.random.default_rng(0)
    poses = synthetic.circular_trajectory(4, radius=8.0, angle_span=0.2)
    scans = [
        tuple(map(jnp.asarray, synthetic.render_scan(
            world, T, H=H, W=W, t=0.1 * i, rng=rng
        )))
        for i, T in enumerate(poses)
    ]
    state = pipeline.init_state(cfg, scans[0][0], scans[0][1], 0.0)
    for i in (1, 2):
        state, _ = pipeline.step(
            cfg, state, scans[i][0], scans[i][1], jnp.float32(0.1 * i)
        )
    pts, mask = scans[3]
    p = prep.preprocess(cfg, pts, mask)
    covs = covariance.plane_covariances(
        p.points, p.mask, k=cfg.gicp.s2s.k_correspondences
    )
    sel = kfmod.select_submap(
        state.odom.store, state.odom.T[:3, 3],
        state.odom.keyframe_thresh_dist,
        cfg.submap.knn, cfg.submap.kcv, cfg.submap.kcc,
    )
    max_slots = min(
        cfg.submap.knn + cfg.submap.kcv + cfg.submap.kcc,
        cfg.capacity.max_keyframes,
    )
    sub_pts, sub_mask, sub_covs = kfmod.gather_submap(
        state.odom.store, sel, max_slots,
        capacity=cfg.capacity.max_submap_points,
    )
    jax.block_until_ready((p, covs, sub_pts))
    r = cfg.gicp.s2m.max_correspondence_distance
    nq = int(jnp.sum(p.mask))
    nt = int(jnp.sum(sub_mask))
    print(f"valid: {nq} queries / {nt} targets, radius {r}")

    # reference exact kernel
    ms, _ = devtime.timeit(
        nn_pallas.nn1_pallas, p.points, sub_pts, n=10, label="nn1_pallas"
    )

    for q_tile in (512, 1024):
        for t_chunk in (256, 512, 1024):
            dens = mask_density(
                np.where(np.asarray(p.mask)[:, None], np.asarray(p.points), 0.0),
                np.asarray(sub_pts), r, q_tile, t_chunk,
            )
            try:
                ms, _ = devtime.timeit(
                    nn_pallas.nn1_sparse_pallas, p.points, sub_pts,
                    radius=r, q_tile=q_tile, t_chunk=t_chunk, n=10,
                    label=f"sparse q{q_tile} t{t_chunk} dens={dens:.2f}",
                )
            except Exception as e:
                print(f"sparse q{q_tile} t{t_chunk}: FAILED {str(e)[-120:]}")

    def s2m_settings():
        return gicp.GICPSettings(
            max_correspondence_distance=r,
            max_iterations=cfg.gicp.s2m.max_iterations,
            lm_max_iterations=cfg.gicp.s2m.lm_max_iterations,
            nn_impl="sparse",
        )

    res = None

    def run_s2m():
        return gicp.align(
            p.points, p.mask, covs, sub_pts, sub_mask, sub_covs,
            jnp.eye(4), s2m_settings(),
        )

    ms, res = devtime.timeit(run_s2m, n=5, label="gicp.align S2M sparse")
    print(f"  s2m iterations: {int(res.iterations)}")


if __name__ == "__main__":
    main()
