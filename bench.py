"""Headline bench: single-stream full-DDLO pipeline rate (Hz).

The reference's implicit real-time budget is ~10 Hz scan rate on CPU
(rosbag replay at rate 1.0, launch/play_DOALS_data.launch:5-6,
README.md:17); BASELINE.json's target is >= 10 Hz single stream. This
bench runs the complete jitted transition (preprocess -> S2S GICP ->
submap -> S2M GICP -> residuals -> range-image segmentation -> tracking
-> keyframe update) on DOALS-scale 64x2048 organized scans and reports
steps/second, vs_baseline = value / 10.

Prints exactly one JSON line.
"""

import dataclasses
import json
import time

import numpy as np


def main():
    import jax

    # persistent compile cache: repeat bench runs skip the ~1-2 min
    # pipeline compile (cache key covers jaxlib + flags, so it is safe)
    jax.config.update("jax_compilation_cache_dir", "/tmp/ddlo_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from dynamic_direct_lidar_odometry_tpu import config as cfg_lib
    from dynamic_direct_lidar_odometry_tpu import pipeline
    from dynamic_direct_lidar_odometry_tpu.io import synthetic

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

    # synthetic town replay with two moving objects
    world = synthetic.World.town(seed=3, n_static=10)
    movers = [
        synthetic.Box(
            np.array([6.0, -3.0, 0.9]), np.array([0.8, 0.8, 1.8]),
            np.array([1.2, 0.4, 0.0]),
        ),
        synthetic.Box(
            np.array([-4.0, 5.0, 0.9]), np.array([0.8, 0.8, 1.8]),
            np.array([-0.5, -1.0, 0.0]),
        ),
    ]
    n_scans = 12
    poses = synthetic.circular_trajectory(n_scans, radius=8.0, angle_span=0.6)
    rng = np.random.default_rng(0)
    scans = []
    for i, T in enumerate(poses):
        pts, mask = synthetic.render_scan(
            world, T, H=H, W=W, t=0.1 * i, extra_boxes=movers, rng=rng
        )
        scans.append((jnp.asarray(pts), jnp.asarray(mask)))

    state = pipeline.init_state(cfg, scans[0][0], scans[0][1], 0.0)

    # warm up: compile + one pass so keyframe/submap branches are realistic
    state, _ = pipeline.step(cfg, state, scans[1][0], scans[1][1],
                             jnp.float32(0.1))
    jax.block_until_ready(state)

    n_timed = 30
    t0 = time.perf_counter()
    for i in range(n_timed):
        pts, mask = scans[2 + (i % (n_scans - 2))]
        state, out = pipeline.step(
            cfg, state, pts, mask, jnp.float32(0.2 + 0.1 * i)
        )
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    hz = n_timed / dt
    print(json.dumps({
        "metric": "ddlo_pipeline_rate",
        "value": round(hz, 3),
        "unit": "Hz (64x2048 scans/s, full dynamic pipeline, 1 chip)",
        "vs_baseline": round(hz / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
