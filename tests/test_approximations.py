"""Quantified error bounds for the documented TPU-native deviations.

These tests measure every on-device stand-in for a host/reference
computation against its exact oracle and pin the bounds:

1. convex_hull_mask (brute-force facet test, exact in exact arithmetic)
   vs scipy.spatial.ConvexHull — qhull, what pcl::ConvexHull computes
   (odom.cc:993-1028). Floors: recall 1.0, precision >= 0.97 (f32 plane
   tolerance over-marks the odd near-degenerate point).
2. concave_hull_mask (brute-force alpha-complex test) vs the Delaunay
   alpha-shape oracle (the pcl::ConcaveHull model, odom.cc:1030-1065).
   Same exactness story, same floors.
3. Submap membership (select_submap with the device hulls — the
   bench.py default since round 4) vs the exact-hull union rule: the
   device path must match the host-exact path (Jaccard >= 0.98; a
   regression back to approximate-quality hulls fails here).
4. knn_approx_pallas neighborhoods vs exact k-NN at 16k-point scale,
   measured where it matters: drift of the PLANE-regularized covariance
   (equivalently the surface normal) that feeds GICP.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import ConvexHull, Delaunay

from dynamic_direct_lidar_odometry_tpu.odometry import keyframes as kf
from dynamic_direct_lidar_odometry_tpu.ops import covariance
from dynamic_direct_lidar_odometry_tpu.ops import knn as knn_ops


def random_trajectory_positions(K, seed, scale=25.0):
    """Keyframe positions along a smooth random walk — the distribution
    select_submap actually sees (keyframes are ~threshD apart)."""
    rng = np.random.default_rng(seed)
    steps = rng.normal(0, 1.0, (K, 3))
    steps[:, 2] *= 0.1  # mostly-planar like a ground robot
    heading = np.cumsum(rng.normal(0, 0.3, K))
    steps[:, 0] += 2.0 * np.cos(heading)
    steps[:, 1] += 2.0 * np.sin(heading)
    pos = np.cumsum(steps, axis=0)
    return (scale * pos / (np.abs(pos).max() + 1e-9)).astype(np.float32)


# ---------------------------------------------------------------------------
# 1. convex hull approximation vs qhull
# ---------------------------------------------------------------------------


def test_exact_hull_masks_vs_oracles():
    """The host-exact path (keyframes.exact_hull_masks) must agree with
    the independent scipy oracles here (qhull vertices; Delaunay alpha
    shape)."""
    for seed in range(10):
        K = 40
        pos = random_trajectory_positions(K, seed)
        valid = np.ones(K, bool)
        cv, cc = kf.exact_hull_masks(pos, valid, alpha=5.0)
        tv = np.zeros(K, bool)
        tv[ConvexHull(pos.astype(np.float64)).vertices] = True
        np.testing.assert_array_equal(cv, tv)
        np.testing.assert_array_equal(
            cc, _alpha_shape_boundary(pos[:, :2], 5.0)
        )
    # reference early-return sizes: empty below 4 / 5 keyframes
    cv, cc = kf.exact_hull_masks(pos[:3], np.ones(3, bool), alpha=5.0)
    assert not cv.any() and not cc.any()
    cv, cc = kf.exact_hull_masks(pos[:4], np.ones(4, bool), alpha=5.0)
    assert cv.any() and not cc.any()


def test_convex_hull_mask_exact_bounds():
    """The on-device facet-test hull (the bench default's hull source):
    finds EVERY true qhull vertex (recall 1.0 — the facet test is exact
    in exact arithmetic) and over-marks at most a few near-degenerate
    points via the f32 plane tolerance (precision >= 0.97 mean,
    measured 0.989)."""
    precisions, recalls = [], []
    for seed in range(20):
        pos = random_trajectory_positions(40, seed)
        valid = np.ones(40, bool)
        ours = np.asarray(
            kf.convex_hull_mask(jnp.asarray(pos), jnp.asarray(valid))
        )
        true_vertices = np.zeros(40, bool)
        true_vertices[ConvexHull(pos.astype(np.float64)).vertices] = True
        tp = np.sum(ours & true_vertices)
        precisions.append(tp / max(ours.sum(), 1))
        recalls.append(tp / max(true_vertices.sum(), 1))
    assert np.mean(precisions) > 0.97, np.mean(precisions)
    assert np.min(recalls) >= 0.999, np.min(recalls)


def test_concave_hull_mask_vs_alpha_shape_oracle():
    """The on-device alpha-complex test vs the exact Delaunay alpha-shape
    boundary (the host oracle's rule): recall 1.0, precision >= 0.97
    mean (measured 0.995; f32 circumcircle tolerance on near-cocircular
    quadruples)."""
    precisions, recalls = [], []
    for seed in range(20):
        pos = random_trajectory_positions(40, seed)
        valid = np.ones(40, bool)
        ours = np.asarray(
            kf.concave_hull_mask(
                jnp.asarray(pos), jnp.asarray(valid), jnp.float32(5.0)
            )
        )
        true_bnd = _alpha_shape_boundary(pos[:, :2], 5.0)
        tp = np.sum(ours & true_bnd)
        precisions.append(tp / max(ours.sum(), 1))
        recalls.append(tp / max(true_bnd.sum(), 1))
    assert np.mean(precisions) > 0.97, np.mean(precisions)
    assert np.min(recalls) >= 0.999, np.min(recalls)


# ---------------------------------------------------------------------------
# 2. submap membership agreement vs exact hulls
# ---------------------------------------------------------------------------


def _alpha_shape_boundary(pos_xy: np.ndarray, alpha: float) -> np.ndarray:
    """Exact 2D alpha-shape boundary points (the pcl::ConcaveHull model,
    odom.cc:1030-1065): Delaunay triangles with circumradius <= alpha are
    kept; boundary = endpoints of edges on exactly one kept triangle;
    points in no kept triangle are isolated boundary points."""
    K = len(pos_xy)
    out = np.zeros(K, bool)
    if K < 4:
        out[:] = True
        return out
    tri = Delaunay(pos_xy.astype(np.float64))
    kept = []
    for simplex in tri.simplices:
        a, b, c = pos_xy[simplex]
        la, lb, lc = (
            np.linalg.norm(b - c), np.linalg.norm(a - c),
            np.linalg.norm(a - b),
        )
        ab, ac = b - a, c - a
        area = abs(ab[0] * ac[1] - ab[1] * ac[0]) / 2.0
        R = (la * lb * lc) / (4.0 * area) if area > 1e-12 else np.inf
        if R <= alpha:
            kept.append(simplex)
    edge_count = {}
    in_kept = np.zeros(K, bool)
    for s in kept:
        in_kept[s] = True
        for e in [(s[0], s[1]), (s[1], s[2]), (s[0], s[2])]:
            e = tuple(sorted(e))
            edge_count[e] = edge_count.get(e, 0) + 1
    for e, c in edge_count.items():
        if c == 1:
            out[e[0]] = out[e[1]] = True
    out |= ~in_kept  # isolated points are their own boundary
    return out


def _top_k_ties_np(ds, eligible, k):
    d = np.where(eligible, ds, np.inf)
    if eligible.sum() == 0:
        return np.zeros_like(eligible)
    kth = np.sort(d)[min(k, len(d)) - 1]
    return eligible & (d <= kth)


def test_submap_member_agreement():
    """Submap membership vs the exact union rule over random
    trajectories. The host-exact path must hit 100%; the device-hull
    path (the bench default) must match it to >= 0.98 Jaccard
    (measured 1.0 on all 25 trajectories)."""
    knn, kcv, kcc = 10, 10, 10
    alpha = 5.0
    j_exact, j_fallback = [], []
    for seed in range(25):
        K = 48
        pos = random_trajectory_positions(K, 100 + seed)
        valid = np.ones(K, bool)
        store = kf.empty_store(K, 4)._replace(
            positions=jnp.asarray(pos), valid=jnp.asarray(valid),
            count=jnp.int32(K),
        )
        cur = pos[-1] + np.array([1.0, 0.5, 0.0], np.float32)

        ds = np.linalg.norm(pos - cur, axis=1)
        cv = np.zeros(K, bool)
        cv[ConvexHull(pos.astype(np.float64)).vertices] = True
        cc = _alpha_shape_boundary(pos[:, :2], alpha)
        exact = (
            _top_k_ties_np(ds, valid, knn)
            | _top_k_ties_np(ds, cv, kcv)
            | _top_k_ties_np(ds, cc, kcc)
        )

        cv_m, cc_m = kf.exact_hull_masks(pos, valid, alpha)
        ours_exact = np.asarray(kf.select_submap(
            store, jnp.asarray(cur), jnp.float32(alpha), knn, kcv, kcc,
            cv_mask=jnp.asarray(cv_m), cc_mask=jnp.asarray(cc_m),
        ))
        ours_fb = np.asarray(kf.select_submap(
            store, jnp.asarray(cur), jnp.float32(alpha), knn, kcv, kcc
        ))

        def jacc(a, b):
            return np.sum(a & b) / max(np.sum(a | b), 1)

        j_exact.append(jacc(ours_exact, exact))
        j_fallback.append(jacc(ours_fb, exact))
    # host-exact path: exact by construction
    assert np.mean(j_exact) >= 0.999, np.mean(j_exact)
    # device hulls (the bench default): must MATCH the exact rule — a
    # regression to approximate-quality hulls fails CI here
    assert np.mean(j_fallback) >= 0.98, np.mean(j_fallback)
    assert np.min(j_fallback) >= 0.9, np.min(j_fallback)


# ---------------------------------------------------------------------------
# 3. knn_approx_pallas covariance drift at 16k scale
# ---------------------------------------------------------------------------


def _covs_from_idx(pts: jnp.ndarray, idx: jnp.ndarray) -> np.ndarray:
    neigh = pts[idx]
    centered = neigh - neigh.mean(axis=1, keepdims=True)
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / idx.shape[1]
    return np.asarray(covariance.regularize_plane(cov))


@pytest.mark.slow
def test_knn_approx_covariance_drift_16k():
    """Statistical bound on the PLANE-covariance drift when neighborhoods
    come from the 128-class approximate k-NN instead of exact k-NN, at
    the scan scale the covariance estimator actually runs at."""
    from jax.experimental.pallas import tpu as pltpu

    from dynamic_direct_lidar_odometry_tpu.ops import nn_pallas

    # structured surfaces (the regime the covariances model): two planes
    # + a curved sheet, 16k points
    rng = np.random.default_rng(0)
    n = 16384 // 4
    g = np.stack([rng.uniform(-20, 20, 2 * n), rng.uniform(-20, 20, 2 * n),
                  0.03 * rng.standard_normal(2 * n)], 1)
    w = np.stack([np.full(n, 8.0) + 0.03 * rng.standard_normal(n),
                  rng.uniform(-20, 20, n), rng.uniform(0, 4, n)], 1)
    xs = rng.uniform(-20, 20, n)
    s = np.stack([xs, rng.uniform(-20, 20, n),
                  2.0 + 0.8 * np.sin(0.4 * xs)], 1)
    pts = jnp.asarray(np.concatenate([g, w, s]).astype(np.float32))
    k = 20

    idx_exact, _ = knn_ops.knn_best(pts, pts, k)
    with pltpu.force_tpu_interpret_mode():
        idx_apx, _ = nn_pallas.knn_approx_pallas(pts, pts, k)

    # neighborhood overlap: how many of the true k neighbors survive.
    # Measured at this scale/geometry: mean 0.93, 1st percentile 0.80.
    overlap = np.array([
        len(np.intersect1d(a, b)) for a, b in
        zip(np.asarray(idx_exact), np.asarray(idx_apx))
    ]) / k
    assert overlap.mean() > 0.90, overlap.mean()
    assert np.quantile(overlap, 0.01) >= 0.7, np.quantile(overlap, 0.01)

    cov_e = _covs_from_idx(pts, idx_exact)
    cov_a = _covs_from_idx(pts, jnp.asarray(idx_apx))
    frob = np.linalg.norm(cov_e - cov_a, axis=(1, 2))
    # PLANE covs are I - 0.999 n n^T, so ||dC||_F ~ sqrt(2)*sin(normal
    # drift). Measured: median 0.011 (0.44 deg), mean 0.057 (2.5 deg),
    # with a ~1% tail near surface intersections where the plane fit
    # legitimately flips between the two adjacent sheets.
    assert np.median(frob) < 0.02, np.median(frob)
    assert frob.mean() < 0.1, frob.mean()
    assert np.quantile(frob, 0.95) < 0.5, np.quantile(frob, 0.95)

    # AABB pruning (prune_radius) must not change the neighborhoods when
    # every true k-th neighbor is within the radius
    with pltpu.force_tpu_interpret_mode():
        idx_pruned, _ = nn_pallas.knn_approx_pallas(
            pts, pts, k, prune_radius=5.0
        )
    same = np.array([
        len(np.intersect1d(a, b)) for a, b in
        zip(np.asarray(idx_apx), np.asarray(idx_pruned))
    ]) / k
    assert same.mean() > 0.999, same.mean()


def test_hull_dense_blocked_equivalence():
    """convex/concave_hull_mask dispatch to a dense (K,K,K) form at
    K <= 64 and a memory-bounded blocked sweep above; both must compute
    the same masks (same tolerances, same degenerate fallbacks)."""
    for seed in range(8):
        rng = np.random.default_rng(seed)
        K = 48
        pos = jnp.asarray(rng.uniform(-20, 20, (K, 3)).astype(np.float32))
        nv = int(rng.integers(6, K + 1))
        v = jnp.asarray(np.arange(K) < nv)
        al = jnp.float32(rng.uniform(3, 12))
        np.testing.assert_array_equal(
            np.asarray(kf._convex_hull_mask_dense(pos, v)),
            np.asarray(kf._convex_hull_mask_blocked(pos, v)),
        )
        np.testing.assert_array_equal(
            np.asarray(kf._concave_hull_mask_dense(pos, v, al)),
            np.asarray(kf._concave_hull_mask_blocked(pos, v, al)),
        )
    # coplanar (square + interior) and collinear degenerate fallbacks
    sq = jnp.asarray(np.array(
        [[0, 0, 0], [4, 0, 0], [4, 4, 0], [0, 4, 0], [2, 2, 0]], np.float32
    ))
    v5 = jnp.ones(5, bool)
    np.testing.assert_array_equal(
        np.asarray(kf._convex_hull_mask_dense(sq, v5)),
        np.asarray(kf._convex_hull_mask_blocked(sq, v5)),
    )
    line = jnp.asarray(
        np.stack([np.arange(6), np.zeros(6), np.zeros(6)], 1).astype(np.float32)
    )
    v6 = jnp.ones(6, bool)
    np.testing.assert_array_equal(
        np.asarray(kf._convex_hull_mask_dense(line, v6)),
        np.asarray(kf._convex_hull_mask_blocked(line, v6)),
    )
