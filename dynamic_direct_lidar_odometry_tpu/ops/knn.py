"""Nearest-neighbor search as tiled matmuls (the TPU answer to nanoflann).

The reference builds a kd-tree per cloud and runs per-point 1-NN / k-NN
queries (``include/nano_gicp/impl/nanoflann_impl.hpp:1265-1540``,
used from ``nano_gicp_impl.hpp:235-275,375-441``). Tree recursion is a
terrible fit for the MXU, so here NN search is a *brute-force tiled sweep*:

    ||q - t||^2 = ||q||^2 + ||t||^2 - 2 q.t

The cross term is a (Q_chunk x 3) @ (3 x T_chunk) matmul, which XLA tiles
onto the MXU, and the running min/top-k reduction never materializes the
full Q x T distance matrix (chunked ``lax.scan`` over both sides).

Numerics: the expansion cancels catastrophically in low precision (and
TPU f32 matmuls default to bf16 passes), so candidate *selection* runs the
cross matmul at ``Precision.HIGHEST`` and the returned squared distances
are re-computed exactly as ``||q - t[idx]||^2`` on the selected pairs —
selection tolerates ~1e-4 ties, residuals must not.

At DDLO scales (Q ~ 1e4 voxelized points, T ~ 1e5 submap points) a full
sweep is ~1e10 FLOP-cheap on a TPU chip and, unlike a kd-tree, is exactly
batchable with ``vmap`` over registration batches.

Invalid points must be pre-masked to the far-away :data:`cloud.SENTINEL`
(see :meth:`Cloud.sanitized`) so they lose every min-reduction naturally.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# NumPy scalar (a jnp literal here would initialize the XLA backend at
# import, breaking jax.distributed.initialize ordering)
_BIG = np.float32(3.0e12)  # > (2 * SENTINEL)^2 is not needed; per-chunk guard


def nn1_best(query: jnp.ndarray, target: jnp.ndarray):
    """1-NN via the Pallas kernel on TPU, the XLA sweep elsewhere.

    The dispatch is a trace-time backend check, so CPU test meshes
    (JAX_PLATFORMS=cpu) and the TPU path share every caller."""
    if jax.default_backend() == "tpu":
        from dynamic_direct_lidar_odometry_tpu.ops import nn_pallas

        return nn_pallas.nn1_pallas(query, target)
    return nn1(query, target)


def knn_best(query: jnp.ndarray, target: jnp.ndarray, k: int):
    """k-NN for covariance neighborhoods: lane-class-approximate Pallas
    kernel on TPU (see :func:`nn_pallas.knn_approx_pallas` for the error
    model — benign for PLANE-regularized covariances), exact XLA sweep
    elsewhere (including the CPU test meshes).

    ``DDLO_KNN_IMPL=exact`` (trace-time env) forces the exact sweep on
    TPU too — tools/accuracy_tpu.py uses it to measure the end-to-end
    ATE cost of the approximate default."""
    import os

    if (
        jax.default_backend() == "tpu"
        and k <= 128
        and os.environ.get("DDLO_KNN_IMPL", "auto") != "exact"
    ):
        from dynamic_direct_lidar_odometry_tpu.ops import nn_pallas

        return nn_pallas.knn_approx_pallas(query, target, k)
    return knn(query, target, k)


def _pad_to_multiple(x: jnp.ndarray, m: int, fill) -> jnp.ndarray:
    n = x.shape[0]
    pad = (-n) % m
    if pad == 0:
        return x
    width = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
    return jnp.pad(x, width, constant_values=fill)


@partial(jax.jit, static_argnames=("query_chunk", "target_chunk"))
def nn1(
    query: jnp.ndarray,
    target: jnp.ndarray,
    query_chunk: int = 1024,
    target_chunk: int = 8192,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Brute-force 1-NN: for each query point the index + squared distance
    of its nearest target point.

    Replaces ``KdTreeFLANN::nearestKSearch(pt, 1, ...)`` inside the GICP
    correspondence update (nano_gicp_impl.hpp:249-258).

    Args:
      query: (Q, 3) float32, invalid rows at SENTINEL.
      target: (T, 3) float32, invalid rows at SENTINEL.

    Returns:
      (idx (Q,) int32, sqdist (Q,) float32)
    """
    Q = query.shape[0]
    q = _pad_to_multiple(query, query_chunk, 0.0)
    t = _pad_to_multiple(target, target_chunk, 1.0e6)
    Tn = t.shape[0]

    q_chunks = q.reshape(-1, query_chunk, 3)
    t_chunks = t.reshape(-1, target_chunk, 3)
    t_sq = jnp.sum(t_chunks * t_chunks, axis=-1)  # (nt, C_t)

    def per_query_chunk(qc):
        q_sq = jnp.sum(qc * qc, axis=-1)  # (C_q,)

        def scan_target(carry, xs):
            best_d, best_i, base = carry
            tc, tc_sq = xs
            # (C_q, C_t) squared distances via one MXU matmul
            cross = jnp.dot(qc, tc.T, precision=jax.lax.Precision.HIGHEST)
            d = q_sq[:, None] + tc_sq[None, :] - 2.0 * cross
            cd = jnp.min(d, axis=1)
            ci = jnp.argmin(d, axis=1).astype(jnp.int32) + base
            take = cd < best_d
            return (
                jnp.where(take, cd, best_d),
                jnp.where(take, ci, best_i),
                base + tc.shape[0],
            ), None

        init = (
            jnp.full((query_chunk,), _BIG, jnp.float32),
            jnp.zeros((query_chunk,), jnp.int32),
            jnp.int32(0),
        )
        (best_d, best_i, _), _ = jax.lax.scan(scan_target, init, (t_chunks, t_sq))
        return best_i, best_d

    idx, _ = jax.lax.map(per_query_chunk, q_chunks)
    idx = idx.reshape(-1)[:Q]
    diff = query - t[idx]
    sqd = jnp.sum(diff * diff, axis=-1)
    return idx, sqd


@partial(jax.jit, static_argnames=("k", "query_chunk", "target_chunk"))
def knn(
    query: jnp.ndarray,
    target: jnp.ndarray,
    k: int,
    query_chunk: int = 1024,
    target_chunk: int = 8192,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Brute-force k-NN with a running top-k merge over target chunks.

    Replaces the k=10/20 neighborhood queries of the covariance estimator
    (nano_gicp_impl.hpp:385-396). Like the kd-tree version, a query point
    contained in the target set returns itself as its own 0-distance
    neighbor.

    Returns:
      (idx (Q, k) int32, sqdist (Q, k) float32), ascending by distance.
    """
    Q = query.shape[0]
    q = _pad_to_multiple(query, query_chunk, 0.0)
    t = _pad_to_multiple(target, target_chunk, 1.0e6)
    t_chunks = t.reshape(-1, target_chunk, 3)
    t_sq = jnp.sum(t_chunks * t_chunks, axis=-1)

    q_chunks = q.reshape(-1, query_chunk, 3)

    def per_query_chunk(qc):
        q_sq = jnp.sum(qc * qc, axis=-1)

        def scan_target(carry, xs):
            best_d, best_i, base = carry
            tc, tc_sq = xs
            cross = jnp.dot(qc, tc.T, precision=jax.lax.Precision.HIGHEST)
            d = q_sq[:, None] + tc_sq[None, :] - 2.0 * cross  # (C_q, C_t)
            cd, ci = jax.lax.top_k(-d, k)  # chunk-local k smallest
            cd = -cd
            ci = ci.astype(jnp.int32) + base
            # merge with carry: 2k candidates -> k best
            md = jnp.concatenate([best_d, cd], axis=1)
            mi = jnp.concatenate([best_i, ci], axis=1)
            sel_d, sel_pos = jax.lax.top_k(-md, k)
            sel_i = jnp.take_along_axis(mi, sel_pos, axis=1)
            return (-sel_d, sel_i, base + tc.shape[0]), None

        init = (
            jnp.full((query_chunk, k), _BIG, jnp.float32),
            jnp.zeros((query_chunk, k), jnp.int32),
            jnp.int32(0),
        )
        (best_d, best_i, _), _ = jax.lax.scan(scan_target, init, (t_chunks, t_sq))
        return best_i, best_d

    idx, _ = jax.lax.map(per_query_chunk, q_chunks)
    idx = idx.reshape(-1, k)[:Q]
    diff = query[:, None, :] - t[idx]  # (Q, k, 3)
    sqd = jnp.sum(diff * diff, axis=-1)
    # exact distances can reorder near-ties from the approximate merge
    order = jnp.argsort(sqd, axis=1)
    return (
        jnp.take_along_axis(idx, order, axis=1),
        jnp.take_along_axis(sqd, order, axis=1),
    )
