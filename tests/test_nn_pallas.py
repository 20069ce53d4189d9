"""Pallas NN kernels vs the exact XLA sweep (interpret mode on CPU).

The TPU kernels (ops/nn_pallas.py) replace the GICP correspondence and
covariance-neighborhood searches; on the CPU test mesh they run in the
Pallas interpreter, so these tests check kernel *semantics* — the real
chip path shares every line of kernel code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_direct_lidar_odometry_tpu.ops import knn as knn_ops
from dynamic_direct_lidar_odometry_tpu.ops import nn_pallas


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def _clouds(Q=700, T=900, seed=0, sentinel_every=0):
    rng = np.random.default_rng(seed)
    q = rng.uniform(-20, 20, (Q, 3)).astype(np.float32)
    t = rng.uniform(-20, 20, (T, 3)).astype(np.float32)
    if sentinel_every:
        q[::sentinel_every] = 1.0e6
        t[:: sentinel_every + 1] = 1.0e6
    return jnp.asarray(q), jnp.asarray(t)


def test_nn1_pallas_matches_exact():
    q, t = _clouds()
    i0, d0 = knn_ops.nn1(q, t)
    i1, d1 = nn_pallas.nn1_pallas(q, t, q_tile=128, t_chunk=128)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-4)


def test_nn1_pallas_with_sentinels():
    q, t = _clouds(sentinel_every=13)
    i0, _ = knn_ops.nn1(q, t)
    i1, _ = nn_pallas.nn1_pallas(q, t, q_tile=128, t_chunk=128)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_nn1_pallas_nonmultiple_sizes():
    # shapes not divisible by the tile/chunk exercise the padding path
    q, t = _clouds(Q=301, T=517)
    i0, _ = knn_ops.nn1(q, t)
    i1, _ = nn_pallas.nn1_pallas(q, t, q_tile=128, t_chunk=256)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_nn1_sparse_matches_exact_within_radius():
    """Block-sparse 1-NN: exact wherever the true NN is within the
    pruning radius; gated-out queries report a saturated distance."""
    q, t = _clouds(Q=700, T=900, seed=2)
    r = 5.0
    i0, d0 = knn_ops.nn1(q, t)
    i1, d1 = nn_pallas.nn1_sparse_pallas(q, t, radius=r, q_tile=128,
                                         t_chunk=128)
    in_range = np.asarray(d0) < r * r
    assert in_range.sum() > 100  # the scene actually exercises both sides
    np.testing.assert_array_equal(
        np.asarray(i0)[in_range], np.asarray(i1)[in_range]
    )
    np.testing.assert_allclose(
        np.asarray(d0)[in_range], np.asarray(d1)[in_range], atol=1e-4
    )
    # gated-out queries never sneak IN-range results
    assert np.all(np.asarray(d1)[~in_range] >= r * r)


def test_nn1_sparse_spatially_sorted_prunes_and_stays_exact():
    """With voxel-hash-ordered (spatially coherent) clouds — the layout
    the pipeline feeds — the mask prunes most chunks; results stay exact
    within the radius."""
    rng = np.random.default_rng(5)
    t = rng.uniform(-30, 30, (4096, 3)).astype(np.float32)
    t = t[np.argsort((t[:, 0] // 2.0) * 1000 + t[:, 1] // 2.0)]  # voxel-ish
    q = (t[::3] + rng.normal(0, 0.2, (len(t[::3]), 3))).astype(np.float32)
    r = 1.0
    i0, d0 = knn_ops.nn1(jnp.asarray(q), jnp.asarray(t))
    i1, d1 = nn_pallas.nn1_sparse_pallas(
        jnp.asarray(q), jnp.asarray(t), radius=r, q_tile=256, t_chunk=256
    )
    in_range = np.asarray(d0) < r * r
    assert in_range.mean() > 0.9
    np.testing.assert_array_equal(
        np.asarray(i0)[in_range], np.asarray(i1)[in_range]
    )


def test_nn1_sparse_with_sentinels_and_padding():
    q, t = _clouds(Q=301, T=517, seed=3, sentinel_every=11)
    r = 8.0
    i0, d0 = knn_ops.nn1(q, t)
    i1, d1 = nn_pallas.nn1_sparse_pallas(q, t, radius=r, q_tile=128,
                                         t_chunk=256)
    in_range = np.asarray(d0) < r * r
    np.testing.assert_array_equal(
        np.asarray(i0)[in_range], np.asarray(i1)[in_range]
    )
    assert np.all(np.asarray(d1)[~in_range] >= r * r)


def test_knn_approx_includes_self_and_overlaps_exact():
    q, _ = _clouds(Q=512)
    k = 10
    ie, de = knn_ops.knn(q, q, k)
    ia, da = nn_pallas.knn_approx_pallas(q, q, k, q_tile=128, t_chunk=128)
    ia_np, ie_np = np.asarray(ia), np.asarray(ie)
    # each point is its own 0-distance neighbor (kd-tree semantics)
    assert np.all(ia_np[:, 0] == np.arange(512))
    # distances ascending
    da_np = np.asarray(da)
    assert np.all(np.diff(da_np, axis=1) >= -1e-5)
    # lane-class approximation: the neighbor-set overlap with exact k-NN
    # must be high (collisions replace a rare neighbor with the (k+1)-th)
    overlap = np.mean(
        [len(set(ia_np[r]) & set(ie_np[r])) / k for r in range(0, 512, 7)]
    )
    assert overlap > 0.9


def test_knn_approx_distances_not_worse_than_kplus_exact():
    # every approx distance is <= the exact (2k)-th neighbor distance:
    # the class-minima pool loses at most collided duplicates
    q, _ = _clouds(Q=384, seed=3)
    k = 8
    _, de = knn_ops.knn(q, q, 2 * k)
    _, da = nn_pallas.knn_approx_pallas(q, q, k, q_tile=128, t_chunk=128)
    assert np.all(np.asarray(da) <= np.asarray(de[:, -1])[:, None] + 1e-4)


def test_sparse_nn_env_flag_gicp_parity(monkeypatch):
    """DDLO_SPARSE_NN path: identical linearization — the pruned pairs
    are exactly the ones the max_corr_dist gate discards."""
    from dynamic_direct_lidar_odometry_tpu.ops import gicp

    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.uniform(-10, 10, (256, 3)).astype(np.float32))
    tgt = src + jnp.asarray([0.05, 0.0, 0.0])
    mask = jnp.ones((256,), bool)
    covs = jnp.broadcast_to(jnp.eye(3), (256, 3, 3))
    T = jnp.eye(4)

    y_ref, H_ref, b_ref, aux_ref = gicp._linearize(
        T, src, mask, covs, tgt, mask, covs, 1.0
    )

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    y_s, H_s, b_s, aux_s = gicp._linearize(
        T, src, mask, covs, tgt, mask, covs, 1.0, nn_impl="sparse"
    )
    np.testing.assert_allclose(float(y_s), float(y_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(H_s), np.asarray(H_ref), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(b_s), np.asarray(b_ref), rtol=1e-4, atol=1e-3
    )
    # the valid (gated-in) correspondence sets agree exactly
    np.testing.assert_array_equal(
        np.asarray(aux_s[1]), np.asarray(aux_ref[1])
    )
