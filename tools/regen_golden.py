"""Regenerate the golden regression trajectories (tests/golden/).

Run after an INTENTIONAL behavioral change:

    env PYTHONPATH=. JAX_PLATFORMS=cpu python tools/regen_golden.py
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp


def main():
    from dynamic_direct_lidar_odometry_tpu import config as cfg_lib, pipeline
    from dynamic_direct_lidar_odometry_tpu.io import synthetic

    cfg = cfg_lib.doals_config()
    cfg = dataclasses.replace(
        cfg,
        detection=dataclasses.replace(
            cfg.detection, rows=32, columns=512, ground_rows=10
        ),
        capacity=cfg_lib.CapacityConfig(
            max_points=2048, max_submap_points=8192, max_keyframes=16,
            max_keyframe_points=2048, max_objects=8, max_tracks=8,
            nn_chunk=256,
        ),
    )
    world = synthetic.World.town(seed=7, n_static=10)
    mov = [
        synthetic.Box(
            np.array([4.0, -2.0, 0.9]),
            np.array([0.8, 0.8, 1.8]),
            np.array([1.0, 0.3, 0.0]),
        )
    ]
    rng = np.random.default_rng(0)
    T = np.eye(4)
    pts, mask = synthetic.render_scan(
        world, T, H=32, W=512, t=0.0, extra_boxes=mov, rng=rng
    )
    st = pipeline.init_state(cfg, jnp.asarray(pts), jnp.asarray(mask), 0.0)
    poses = []
    for i in range(1, 10):
        th = 0.02 * i
        T = np.eye(4)
        T[:3, 3] = [0.1 * i, 0.03 * i, 0.0]
        T[0, 0] = T[1, 1] = np.cos(th)
        T[0, 1] = -np.sin(th)
        T[1, 0] = np.sin(th)
        pts, mask = synthetic.render_scan(
            world, T, H=32, W=512, t=0.1 * i, extra_boxes=mov, rng=rng
        )
        st, out = pipeline.step(
            cfg, st, jnp.asarray(pts), jnp.asarray(mask), jnp.float32(0.1 * i)
        )
        poses.append(np.asarray(out.odom.pose))

    out_path = os.path.join(
        os.path.dirname(__file__), "..", "tests", "golden",
        "linear_32x512_seed7.npz",
    )
    np.savez(out_path, poses=np.array(poses))
    print("wrote", os.path.abspath(out_path))


if __name__ == "__main__":
    main()
