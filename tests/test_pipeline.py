import dataclasses

import numpy as np

import jax.numpy as jnp

from dynamic_direct_lidar_odometry_tpu import config as cfg_lib
from dynamic_direct_lidar_odometry_tpu import pipeline
from dynamic_direct_lidar_odometry_tpu.io import synthetic
from dynamic_direct_lidar_odometry_tpu.tracking.tracker import DYNAMIC


def ddlo_cfg():
    cfg = cfg_lib.doals_config()
    cap = dataclasses.replace(
        cfg.capacity,
        max_points=4096,
        max_keyframe_points=4096,
        max_keyframes=32,
        max_objects=16,
        max_tracks=16,
    )
    det = dataclasses.replace(
        cfg.detection,
        rows=32,
        columns=512,
        ground_rows=20,
        min_delta_z=0.3,
        max_delta_z=3.0,
        max_distance=20.0,
        valid_point_num=8,
        valid_line_num=3,
        min_line_num=3,
        residuum_height_ratio=0.05,
    )
    trk = dataclasses.replace(
        cfg.tracking,
        min_dynamic_hits=3,
        max_undefined_hits=6,
        min_dist_from_origin=0.5,
        residuum_height_ratio=0.05,
    )
    pre = dataclasses.replace(
        cfg.preprocessing,
        voxel_scan=dataclasses.replace(cfg.preprocessing.voxel_scan, res=0.4),
        voxel_submap=dataclasses.replace(cfg.preprocessing.voxel_submap, res=0.5),
    )
    return dataclasses.replace(
        cfg, capacity=cap, detection=det, tracking=trk, preprocessing=pre
    )


def test_ddlo_pipeline_detects_and_removes_moving_object():
    cfg = ddlo_cfg()
    H, W = cfg.detection.rows, cfg.detection.columns
    world = synthetic.World.town(seed=5, n_static=6)
    # a person-sized box crossing in front of a stationary sensor
    mover = synthetic.Box(
        np.array([6.0, -4.0, 0.9]),
        np.array([0.8, 0.8, 1.8]),
        velocity=np.array([0.0, 1.2, 0.0]),
    )

    T = np.eye(4)
    T[:3, 3] = [0, 0, 1.5]
    n_frames = 12
    scans = []
    for i in range(n_frames):
        t = i * 0.1
        pts, mask = synthetic.render_scan(
            world, T, H=H, W=W, t=t, extra_boxes=[mover], noise=0.004
        )
        scans.append((pts, mask, t))

    pts0, m0, t0 = scans[0]
    state = pipeline.init_state(
        cfg, jnp.asarray(np.nan_to_num(pts0)), jnp.asarray(m0), t0, jnp.asarray(T)
    )

    saw_dynamic = False
    for pts, mask, t in scans[1:]:
        state, out = pipeline.step(
            cfg, state, jnp.asarray(np.nan_to_num(pts)), jnp.asarray(mask),
            jnp.float32(t),
        )
        trk = state.tracks
        dyn = np.asarray(trk.active) & (np.asarray(trk.status) == DYNAMIC)
        if dyn.any():
            saw_dynamic = True
            # the dynamic track sits near the mover's current position
            box_now = mover.at(t)
            pos = np.asarray(trk.x)[dyn][:, :2]
            d = np.linalg.norm(pos - box_now.center[:2], axis=1)
            assert d.min() < 1.0, (pos, box_now.center)
            # its pixels are flagged and excluded from the keyframe cloud
            dyn_mask = np.asarray(out.dynamic_mask)
            assert dyn_mask.sum() > 0
            kf_pts = np.asarray(out.new_keyframe_points)
            kf_m = np.asarray(out.new_keyframe_mask)
            # off-ground points near the box (ground under the mover is
            # legitimately static and stays). A few unlabeled box-edge
            # pixels can survive — the reference's BFS has the same
            # angle-predicate envelope — so require >=85% suppression
            # relative to the raw pixel count on the box.
            segw = np.asarray(out.static_points)
            raw_on_box = (
                (np.linalg.norm(segw[:, :2] - box_now.center[:2], axis=1) < 0.6)
                & (segw[:, 2] > 0.3)
                & np.asarray(out.static_mask)
            )
            kp = kf_pts[kf_m]
            near = (
                np.linalg.norm(kp[:, :2] - box_now.center[:2], axis=1) < 0.6
            ) & (kp[:, 2] > 0.3)
            n_dyn_px = int(np.asarray(out.dynamic_mask).sum())
            assert near.sum() <= max(3, 0.15 * n_dyn_px), (
                f"{near.sum()} dynamic pts leaked into keyframe "
                f"({n_dyn_px} removed)"
            )

    assert saw_dynamic, "mover never classified DYNAMIC"
    # pose stayed put (stationary sensor)
    drift = np.linalg.norm(np.asarray(state.odom.pose) - T[:3, 3])
    assert drift < 0.05, drift


def test_pipeline_static_only_keyframes_keep_world():
    """Static structure must survive into keyframe clouds."""
    cfg = ddlo_cfg()
    H, W = cfg.detection.rows, cfg.detection.columns
    world = synthetic.World.town(seed=6, n_static=4)
    T = np.eye(4)
    T[:3, 3] = [0, 0, 1.5]
    pts, mask = synthetic.render_scan(world, T, H=H, W=W, noise=0.004)
    state = pipeline.init_state(
        cfg, jnp.asarray(np.nan_to_num(pts)), jnp.asarray(mask), 0.0, jnp.asarray(T)
    )
    pts, mask = synthetic.render_scan(world, T, H=H, W=W, noise=0.004)
    state, out = pipeline.step(
        cfg, state, jnp.asarray(np.nan_to_num(pts)), jnp.asarray(mask),
        jnp.float32(0.1),
    )
    # most of the scan survives dynamic filtering
    n_static = int(np.asarray(out.static_mask).sum())
    n_raw = int(np.asarray(mask).sum())
    assert n_static > 0.5 * n_raw
    # ground was identified somewhere
    assert int(np.asarray(out.ground_mask).sum()) > 100


def test_spherical_projection_mode_runs():
    """organized=false (the upstream LiDAR path, detection.cpp:330-367):
    the pipeline maps per-pixel object slots back to source points through
    the projection's point_index instead of assuming pixel==point."""
    cfg = ddlo_cfg()
    cfg = dataclasses.replace(
        cfg, detection=dataclasses.replace(cfg.detection, organized=False)
    )
    H, W = cfg.detection.rows, cfg.detection.columns
    world = synthetic.World.town(seed=5, n_static=8)
    rng = np.random.default_rng(0)
    T = np.eye(4)
    pts, mask = synthetic.render_scan(world, T, H=H, W=W, t=0.0, rng=rng)
    state = pipeline.init_state(cfg, jnp.asarray(pts), jnp.asarray(mask), 0.0)
    T[:3, 3] = [0.1, 0.0, 0.0]
    pts, mask = synthetic.render_scan(world, T, H=H, W=W, t=0.1, rng=rng)
    state, out = pipeline.step(
        cfg, state, jnp.asarray(pts), jnp.asarray(mask), jnp.float32(0.1)
    )
    assert np.all(np.isfinite(np.asarray(out.odom.pose)))
    assert abs(float(out.odom.pose[0]) - 0.1) < 0.05
    # per-point masks have source-point shape
    assert out.non_static_mask.shape == (H * W,)
    assert bool(jnp.any(out.detections.point_index >= 0))


def test_step_chunk_matches_sequential_steps():
    """pipeline.step_chunk (K steps per dispatch via lax.scan) is exactly
    the sequential composition of pipeline.step — same hulls, same
    stacked outputs, same final state."""
    cfg = ddlo_cfg()
    H, W = cfg.detection.rows, cfg.detection.columns
    world = synthetic.World.town(seed=4, n_static=8)
    rng = np.random.default_rng(0)
    scans = []
    for i in range(5):
        T = np.eye(4)
        T[:3, 3] = [0.15 * i, 0.02 * i, 0.0]
        pts, mask = synthetic.render_scan(
            world, T, H=H, W=W, t=0.1 * i, rng=rng
        )
        scans.append((pts, mask))

    st0 = pipeline.init_state(
        cfg, jnp.asarray(scans[0][0]), jnp.asarray(scans[0][1]), 0.0
    )

    st_seq = st0
    poses_seq = []
    for i in range(1, 5):
        st_seq, out = pipeline.step(
            cfg, st_seq, jnp.asarray(scans[i][0]), jnp.asarray(scans[i][1]),
            jnp.float32(0.1 * i),
        )
        poses_seq.append(np.asarray(out.odom.pose))

    pts_stack = jnp.asarray(np.stack([s[0] for s in scans[1:]]))
    mask_stack = jnp.asarray(np.stack([s[1] for s in scans[1:]]))
    ts_stack = jnp.asarray(np.arange(1, 5, dtype=np.float32) * 0.1)
    st_chunk, outs = pipeline.step_chunk(
        cfg, st0, pts_stack, mask_stack, ts_stack
    )

    np.testing.assert_allclose(
        np.asarray(outs.odom.pose), np.stack(poses_seq), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(st_chunk.odom.T), np.asarray(st_seq.odom.T), atol=1e-5
    )
    assert int(np.asarray(st_chunk.odom.store.count)) == int(
        np.asarray(st_seq.odom.store.count)
    )


def test_device_hull_cache_invariant():
    """OdomState's device-hull cache (odometry.step) must stay EXACT:
    after any sequence of steps, the cached masks equal a fresh sweep of
    the current store whenever the cached alpha matches — the cache only
    ever skips recomputation when its inputs (store, alpha) are
    unchanged, so staleness is impossible by construction; this pins the
    dirty-flag wiring (update_keyframes must mark inserts)."""
    from dynamic_direct_lidar_odometry_tpu.io import synthetic
    from dynamic_direct_lidar_odometry_tpu.odometry import keyframes as kf

    cfg = ddlo_cfg()
    # tiny keyframe distance so inserts fire mid-sequence
    cfg = dataclasses.replace(
        cfg, keyframe=dataclasses.replace(cfg.keyframe, thresh_dist=0.5)
    )
    H, W = cfg.detection.rows, cfg.detection.columns
    world = synthetic.World.town(seed=2, n_static=8)
    rng = np.random.default_rng(0)
    T = np.eye(4)
    pts, mask = synthetic.render_scan(world, T, H=H, W=W, t=0.0, rng=rng)
    st = pipeline.init_state(cfg, jnp.asarray(pts), jnp.asarray(mask), 0.0)
    n_adds = 0
    for i in range(1, 8):
        T = np.eye(4)
        # large steps: the ADAPTIVE threshold (spaciousness-driven, not
        # cfg.keyframe.thresh_dist) decides inserts; outrun it
        T[:3, 3] = [2.5 * i, 0.6 * i, 0.0]
        pts, mask = synthetic.render_scan(
            world, T, H=H, W=W, t=0.1 * i, rng=rng
        )
        st, out = pipeline.step(
            cfg, st, jnp.asarray(pts), jnp.asarray(mask),
            jnp.float32(0.1 * i),
        )
        n_adds += int(np.asarray(out.keyframe_added))
        odo = st.odom
        if bool(np.asarray(out.keyframe_added)):
            # a fresh insert leaves the cache dirty until the NEXT step
            assert bool(np.asarray(odo.hull_dirty))
            continue
        fresh_cv = kf.convex_hull_mask(odo.store.positions, odo.store.valid)
        fresh_cc = kf.concave_hull_mask(
            odo.store.positions, odo.store.valid, odo.hull_alpha
        )
        np.testing.assert_array_equal(
            np.asarray(odo.hull_cv), np.asarray(fresh_cv)
        )
        np.testing.assert_array_equal(
            np.asarray(odo.hull_cc), np.asarray(fresh_cc)
        )
    # >= 1 insert mid-sequence: the following non-add step's fresh==
    # cached check then covers the dirty -> rebuild transition
    assert n_adds >= 1, "scenario must exercise cache invalidation"
