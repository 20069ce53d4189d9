"""Pallas TPU kernel for batched 1-NN search.

The GICP correspondence update needs, per outer iteration, the nearest
target point of every source point (``update_correspondences``,
nano_gicp_impl.hpp:235-275 — a kd-tree query per point in the
reference). The XLA fallback (:mod:`.knn`) expands ``||q-t||^2`` through
a matmul and runs ~30x off speed-of-light because every (q_chunk,
t_chunk) distance tile round-trips HBM and the running min is a separate
fused loop.

This kernel keeps the whole target cloud resident in VMEM (64k points x
3 x f32 = 768 KB), streams query tiles through the grid, and for each
target chunk updates an *elementwise* running (best_dist, best_index)
pair — no cross-lane reduction inside the chunk loop; a single argmin
per query tile happens at the end. Distances are computed by direct
differencing (exact in f32, no catastrophic ||q||^2+||t||^2-2qt
cancellation, no MXU pass needed — K=3 would waste 97 % of the systolic
array anyway; the VPU does 8 flops/element here).

Targets are handed over transposed as (3, N) — the target point axis
lives on the 128-wide lane dimension; queries stay row-major (N, 3)
(see :func:`_query_lanes` for why).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# distance placed on padded / invalid slots; anything >= this loses
_BIG = 3.0e12


def _chunk_min_sweep(qxyz, lane, tt_ref, base, t_chunk, best_d, best_i):
    """One target chunk's distance sweep merged into the (QT, 128)
    per-lane-class running (best_dist, best_index) carry — the shared
    core of every min-sweep kernel below. Strict ``<`` everywhere, so
    the earliest (lowest-index) target wins ties, matching a sequential
    min sweep (and the kd-tree's first-found semantics)."""
    qx, qy, qz = qxyz
    tx = tt_ref[0, pl.ds(base, t_chunk)].reshape(1, t_chunk)
    ty = tt_ref[1, pl.ds(base, t_chunk)].reshape(1, t_chunk)
    tz = tt_ref[2, pl.ds(base, t_chunk)].reshape(1, t_chunk)
    dx = qx - tx
    dy = qy - ty
    dz = qz - tz
    d = dx * dx + dy * dy + dz * dz  # (QT, t_chunk)
    # static 128-wide slices keep the carry (QT, 128) — 4-16x less VMEM
    # than carrying (QT, t_chunk) best/index pairs
    for f in range(t_chunk // 128):
        dd = d[:, f * 128 : (f + 1) * 128]
        tk = dd < best_d
        best_i = jnp.where(tk, lane + (base + f * 128), best_i)
        best_d = jnp.where(tk, dd, best_d)
    return best_d, best_i


def _query_lanes(q_ref):
    """q_ref: (QT, 3) ROW-major query tile. Queries stay row-major all the
    way into the kernel: the (N,3)->(3,N) relayout a transposed handover
    would need measured ~0.8 ms per call on v5e — paid once per LM
    iteration on the moving source cloud — while a sublane-aligned column
    read here is free."""
    QT = q_ref.shape[0]
    qxyz = (q_ref[:, 0:1], q_ref[:, 1:2], q_ref[:, 2:3])
    lane = jax.lax.broadcasted_iota(jnp.int32, (QT, 128), 1)
    init = (
        jnp.full((QT, 128), _BIG, jnp.float32),
        jnp.zeros((QT, 128), jnp.int32),
    )
    return qxyz, lane, init


def _argmin_epilogue(best_d, best_i, idx_ref, dist_ref):
    """One cross-lane reduction per tile: argmin over the class width,
    smallest target index among ties."""
    QT = best_d.shape[0]
    win = jnp.min(best_d, axis=1, keepdims=True)  # (QT, 1)
    idx_cand = jnp.where(best_d == win, best_i, jnp.int32(2**30))
    idx_ref[:, :] = jnp.min(idx_cand, axis=1).reshape(QT // 128, 128)
    dist_ref[:, :] = win[:, 0].reshape(QT // 128, 128)


def _nn1_kernel(qt_ref, tt_ref, idx_ref, dist_ref, *, t_chunk: int):
    """One query tile vs the full target cloud.

    qt_ref: (QT, 3) query tile       tt_ref: (3, T) full target
    idx_ref: (QT//128, 128) int32    dist_ref: (QT//128, 128) f32
    """
    n_chunks = tt_ref.shape[1] // t_chunk
    qxyz, lane, init = _query_lanes(qt_ref)

    def body(c, carry):
        return _chunk_min_sweep(
            qxyz, lane, tt_ref, c * t_chunk, t_chunk, *carry
        )

    best_d, best_i = jax.lax.fori_loop(0, n_chunks, body, init)
    _argmin_epilogue(best_d, best_i, idx_ref, dist_ref)


@partial(jax.jit, static_argnames=("q_tile", "t_chunk"))
def nn1_pallas(
    query: jnp.ndarray,
    target: jnp.ndarray,
    q_tile: int = 1024,
    t_chunk: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact brute-force 1-NN: (idx, sqdist) of the nearest target row for
    every query row. Same contract as :func:`knn.nn1`: invalid rows must
    be pre-masked to a far-away sentinel on BOTH sides.

    Args:
      query: (Q, 3) f32.  target: (T, 3) f32.
    """
    Q = query.shape[0]
    Tn = target.shape[0]

    def pad_to(x, m, fill):
        pad = (-x.shape[0]) % m
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)), constant_values=fill)
        return x

    q = pad_to(query, q_tile, 0.0)
    # padded target rows sit at +1e6 (like the SENTINEL), far from data
    t = pad_to(target, t_chunk, 1.0e6)
    Qp, Tp = q.shape[0], t.shape[0]

    tt = t.T  # (3, Tp); queries stay row-major (see _query_lanes)

    grid = (Qp // q_tile,)
    rows_per_tile = q_tile // 128  # (8, 128)-aligned output blocks
    idx, dist = pl.pallas_call(
        partial(_nn1_kernel, t_chunk=t_chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Tp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (rows_per_tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (rows_per_tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Qp // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((Qp // 128, 128), jnp.float32),
        ],
    )(q, tt)

    idx = idx.reshape(-1)[:Q]
    idx = jnp.minimum(idx, Tn - 1)  # padded winners can't happen, but clamp
    sqd = dist.reshape(-1)[:Q]
    return idx, sqd


def _sparse_chunk_lists(overlap: jnp.ndarray):
    """(n_tiles, n_chunks) bool overlap mask -> per-tile ASCENDING active
    chunk-id lists + counts (CSR-style, padded with n_chunks — never
    dereferenced because the kernels loop ``j < count``). Ascending order
    preserves the sequential-sweep tie semantics (earliest target index
    wins)."""
    n_chunks = overlap.shape[1]
    ids = jnp.broadcast_to(
        jnp.arange(n_chunks, dtype=jnp.int32), overlap.shape
    )
    lst = jnp.sort(jnp.where(overlap, ids, jnp.int32(n_chunks)), axis=1)
    counts = jnp.sum(overlap.astype(jnp.int32), axis=1)
    return counts, lst


def _nn1_sparse_kernel(
    cnt_ref, lst_ref, qt_ref, tt_ref, idx_ref, dist_ref, *, t_chunk: int
):
    """Block-sparse 1-NN: like :func:`_nn1_kernel` but the chunk loop runs
    ONLY over this query tile's active chunks (a host-precomputed
    ascending index list in SMEM with a dynamic trip count) — work is
    proportional to the AABB-overlap density instead of paying a
    ``lax.cond`` branch per pruned chunk, which measured nearly as
    expensive as the sweep it skipped (~6 vs 8 ms at 4-6 % density).

    cnt_ref: (n_tiles,) int32   lst_ref: (n_tiles, n_chunks) int32
    qt_ref: (QT, 3) row-major query tile (see :func:`_query_lanes`)
    tt_ref: (3, T) full target
    """
    i = pl.program_id(0)
    qxyz, lane, init = _query_lanes(qt_ref)

    def body(j, carry):
        base = lst_ref[i, j] * t_chunk
        return _chunk_min_sweep(qxyz, lane, tt_ref, base, t_chunk, *carry)

    best_d, best_i = jax.lax.fori_loop(0, cnt_ref[i], body, init)
    _argmin_epilogue(best_d, best_i, idx_ref, dist_ref)


class SparseTarget(NamedTuple):
    """Loop-invariant target-side preparation for the sparse 1-NN sweep:
    the transposed/padded target, its per-chunk AABBs, and the original
    row count. gicp.align prepares this ONCE per registration so the
    (M,3)->(3,M) relayout + chunk-box reduction are hoisted out of the
    LM while_loop instead of being re-emitted every iteration."""

    tt: jnp.ndarray  # (3, Tp) padded, transposed target
    t_lo: jnp.ndarray  # (n_chunks, 3) chunk AABB minima
    t_hi: jnp.ndarray  # (n_chunks, 3) chunk AABB maxima
    n: int  # original (unpadded) target row count — static


def _pad_rows(x: jnp.ndarray, m: int, fill) -> jnp.ndarray:
    pad = (-x.shape[0]) % m
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)), constant_values=fill)
    return x


def prepare_sparse_target(target: jnp.ndarray, t_chunk: int = 512) -> SparseTarget:
    """Pad/transpose the target and compute its chunk AABBs (see
    :class:`SparseTarget`). Invalid target rows must already sit at the
    far sentinel: their chunks' boxes then never overlap a real query
    tile and are pruned for free — which is also what makes a padded
    slot-major submap (keyframes.gather_submap capacity=None) sweep at
    the cost of its VALID points only."""
    t = _pad_rows(target, t_chunk, 1.0e6)
    tb = t.reshape(-1, t_chunk, 3)
    return SparseTarget(
        tt=t.T, t_lo=tb.min(axis=1), t_hi=tb.max(axis=1), n=target.shape[0]
    )


def nn1_sparse_prepared(
    query: jnp.ndarray,
    prep: SparseTarget,
    radius: float,
    q_tile: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sparse 1-NN against a :func:`prepare_sparse_target` result —
    traced inline (no jit wrapper) so callers inside scans/while loops
    keep the prep arrays as loop constants."""
    Q = query.shape[0]
    R, Tp = prep.tt.shape  # R = 3
    n_chunks = prep.t_lo.shape[0]
    t_chunk = Tp // n_chunks

    q = _pad_rows(query, q_tile, 1.0e6)
    Qp = q.shape[0]
    n_tiles = Qp // q_tile

    # tile/chunk AABBs + dilated overlap test (all-axes separation).
    # Sentinel rows (masked-out points and the tile padding, both at
    # +1e6) are excluded from the boxes so they never inflate a tile:
    # an all-sentinel tile gets an empty box and sweeps zero chunks.
    qb = q.reshape(n_tiles, q_tile, 3)
    q_real = jnp.all(qb < 5.0e5, axis=-1, keepdims=True)  # (n_tiles, q_tile, 1)
    q_lo = jnp.min(jnp.where(q_real, qb, jnp.inf), axis=1)  # (n_tiles, 3)
    q_hi = jnp.max(jnp.where(q_real, qb, -jnp.inf), axis=1)
    overlap = jnp.all(
        (q_lo[:, None, :] - radius <= prep.t_hi[None, :, :])
        & (q_hi[:, None, :] + radius >= prep.t_lo[None, :, :]),
        axis=-1,
    )
    counts, lst = _sparse_chunk_lists(overlap)

    grid = (n_tiles,)
    rows = q_tile // 128
    idx, dist = pl.pallas_call(
        partial(_nn1_sparse_kernel, t_chunk=t_chunk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            # index maps receive the scalar-prefetch refs as trailing args
            in_specs=[
                pl.BlockSpec(
                    (q_tile, 3), lambda i, c, l: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (R, Tp), lambda i, c, l: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (rows, 128), lambda i, c, l: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (rows, 128), lambda i, c, l: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Qp // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((Qp // 128, 128), jnp.float32),
        ],
    )(counts, lst, q, prep.tt)

    idx = jnp.minimum(idx.reshape(-1)[:Q], prep.n - 1)
    sqd = dist.reshape(-1)[:Q]
    return idx, sqd


@partial(jax.jit, static_argnames=("radius", "q_tile", "t_chunk"))
def nn1_sparse_pallas(
    query: jnp.ndarray,
    target: jnp.ndarray,
    radius: float,
    q_tile: int = 1024,
    t_chunk: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Radius-pruned 1-NN: exact for every query whose true nearest
    target lies within ``radius``; queries with no target inside
    ``radius`` report distance >= _BIG (their correspondence would be
    discarded by the GICP gate anyway, nano_gicp_impl.hpp:256-258).

    Pruning: per query-TILE and target-CHUNK axis-aligned bounding boxes
    (computed in XLA) are tested for overlap dilated by ``radius``; the
    kernel loops only over each tile's surviving chunk list. Point
    clouds arrive MORTON-ordered (filters.voxel_downsample's single
    z-order sort), so consecutive chunks are spatially compact and the
    boxes are tight. At DOALS submap scale the overlap density is
    ~4-10 %, turning the 1e9-element distance sweep (the pipeline's
    dominant cost) into a proportional sweep of the surviving blocks.
    """
    return nn1_sparse_prepared(
        query, prepare_sparse_target(target, t_chunk), radius, q_tile
    )


def _nn_classes_kernel(qt_ref, tt_ref, idx_ref, dist_ref, *, t_chunk: int):
    """Like :func:`_nn1_kernel` but emits the full per-lane-class running
    minima (class = target index mod 128) instead of the final argmin:
    (QT, 128) best distance + index per query tile."""
    n_chunks = tt_ref.shape[1] // t_chunk
    qxyz, lane, init = _query_lanes(qt_ref)

    def body(c, carry):
        return _chunk_min_sweep(
            qxyz, lane, tt_ref, c * t_chunk, t_chunk, *carry
        )

    best_d, best_i = jax.lax.fori_loop(0, n_chunks, body, init)
    idx_ref[:, :] = best_i
    dist_ref[:, :] = best_d


def _nn_classes_sparse_kernel(
    cnt_ref, lst_ref, qt_ref, tt_ref, idx_ref, dist_ref, *, t_chunk: int
):
    """AABB-pruned variant of :func:`_nn_classes_kernel` — the chunk loop
    runs only over this tile's active chunk list (same scalar-prefetch
    CSR scheme as :func:`_nn1_sparse_kernel`)."""
    i = pl.program_id(0)
    qxyz, lane, init = _query_lanes(qt_ref)

    def body(j, carry):
        base = lst_ref[i, j] * t_chunk
        return _chunk_min_sweep(qxyz, lane, tt_ref, base, t_chunk, *carry)

    best_d, best_i = jax.lax.fori_loop(0, cnt_ref[i], body, init)
    idx_ref[:, :] = best_i
    dist_ref[:, :] = best_d


@partial(jax.jit, static_argnames=("k", "q_tile", "t_chunk", "prune_radius"))
def knn_approx_pallas(
    query: jnp.ndarray,
    target: jnp.ndarray,
    k: int,
    q_tile: int = 1024,
    t_chunk: int = 512,
    prune_radius: float | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Approximate k-NN: per query, the k smallest of its 128 lane-class
    minima (class = target index mod 128; each class keeps only its best
    candidate per query).

    The error model: a true j-th neighbor (j <= k) is replaced by the
    (k+1)-th when two true top-k neighbors collide in one class — for the
    GICP covariance estimator (the only consumer) this perturbs a
    neighborhood whose spectrum gets PLANE-regularized to (1, 1, 1e-3)
    anyway, so only a tiny rotation of the plane normal can result. A
    query contained in the target set always keeps itself (it is the
    0-distance minimum of its own class), matching the kd-tree semantics
    of calculate_covariances (nano_gicp_impl.hpp:385-396).

    ``prune_radius``: optionally skip target chunks whose AABB is farther
    than this from the query tile's AABB (same scheme as
    :func:`nn1_sparse_pallas`). Correct as long as every true k-th
    neighbor lies within the radius — at voxel-filtered scan density
    (res 0.3-0.5 m, k <= 20) a few meters is ample; measured in
    tests/test_approximations.py.

    Returns (idx (Q, k) int32, sqdist (Q, k) f32), ascending.
    """
    if k > 128:
        raise ValueError("knn_approx_pallas supports k <= 128")
    Q = query.shape[0]
    Tn = target.shape[0]

    def pad_to(x, m, fill):
        pad = (-x.shape[0]) % m
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)), constant_values=fill)
        return x

    q = pad_to(query, q_tile, 0.0)
    t = pad_to(target, t_chunk, 1.0e6)
    Qp, Tp = q.shape[0], t.shape[0]

    grid = (Qp // q_tile,)
    out_specs_plain = [
        pl.BlockSpec((q_tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((q_tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Qp, 128), jnp.int32),
        jax.ShapeDtypeStruct((Qp, 128), jnp.float32),
    ]
    if prune_radius is None:
        idx, dist = pl.pallas_call(
            partial(_nn_classes_kernel, t_chunk=t_chunk),
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (q_tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((3, Tp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs_plain,
            out_shape=out_shape,
        )(q, t.T)
    else:
        n_tiles, n_chunks = Qp // q_tile, Tp // t_chunk
        qb = q.reshape(n_tiles, q_tile, 3)
        tb = t.reshape(n_chunks, t_chunk, 3)
        overlap = jnp.all(
            (qb.min(axis=1)[:, None, :] - prune_radius <= tb.max(axis=1)[None])
            & (qb.max(axis=1)[:, None, :] + prune_radius >= tb.min(axis=1)[None]),
            axis=-1,
        )
        counts, lst = _sparse_chunk_lists(overlap)
        idx, dist = pl.pallas_call(
            partial(_nn_classes_sparse_kernel, t_chunk=t_chunk),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=[
                    pl.BlockSpec(
                        (q_tile, 3), lambda i, c, l: (i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (3, Tp), lambda i, c, l: (0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=[
                    pl.BlockSpec(
                        (q_tile, 128), lambda i, c, l: (i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (q_tile, 128), lambda i, c, l: (i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
            ),
            out_shape=out_shape,
        )(counts, lst, q, t.T)

    nd, pos = jax.lax.top_k(-dist[:Q], k)  # ascending distances
    ki = jnp.take_along_axis(idx[:Q], pos, axis=1)
    ki = jnp.minimum(ki, Tn - 1)
    return ki, -nd
