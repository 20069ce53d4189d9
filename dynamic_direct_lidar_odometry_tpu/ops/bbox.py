"""Oriented bounding boxes: per-segment PCA fit + OBB IoU.

- :func:`pca_bboxes`: batched equivalent of ``DetectionModule::getObject``
  (detection.cpp:726-782): PCA in the XY plane (z flattened), min/max in
  the PCA frame, re-centered; state layout [cx, cy, cz, sin(yaw/2), l, w,
  h] (Object, include/tracking/object.h:9-26). All objects fit in one pass
  of segment reductions + a closed-form 2x2 eigendecomposition.
- :func:`obb_iou`: the Sutherland-Hodgman rectangle-intersection 3D IoU of
  ``include/util/bbox_iou.h:55-155``, vectorized with fixed-size polygon
  buffers. NOTE (faithful quirk): like the reference (bbox_iou.h:57-58,
  134-135), the state's ``sin(yaw/2)`` entry is used *directly* as the
  rectangle rotation angle in radians.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Objects(NamedTuple):
    """Fixed-slot detection list (the reference's detected_objects_)."""

    state: jnp.ndarray  # (S, 7) [cx, cy, cz, sin(yaw/2), l, w, h]
    num_points: jnp.ndarray  # (S,)
    density: jnp.ndarray  # (S,)
    avg_residuum: jnp.ndarray  # (S,)
    valid: jnp.ndarray  # (S,) bool


def _eigh2(a, b, c):
    """Eigendecomposition of symmetric [[a, b], [b, c]], ascending.

    Returns (w0, w1, v0, v1) with v0 the eigenvector of the smaller
    eigenvalue (matches Eigen::SelfAdjointEigenSolver's ordering used at
    detection.cpp:745-746)."""
    half_tr = 0.5 * (a + c)
    s = jnp.sqrt(jnp.maximum(0.25 * (a - c) ** 2 + b * b, 0.0))
    w0, w1 = half_tr - s, half_tr + s
    use_b = jnp.abs(b) > 1e-12
    v0 = jnp.stack(
        [
            jnp.where(use_b, b, jnp.where(a <= c, 1.0, 0.0)),
            jnp.where(use_b, w0 - a, jnp.where(a <= c, 0.0, 1.0)),
        ],
        axis=-1,
    )
    v0 = v0 / jnp.maximum(jnp.linalg.norm(v0, axis=-1, keepdims=True), 1e-12)
    v1 = jnp.stack([-v0[..., 1], v0[..., 0]], axis=-1)
    return w0, w1, v0, v1


@partial(jax.jit, static_argnames=("max_objects",))
def pca_bboxes(
    points: jnp.ndarray,  # (H, W, 3) world frame
    pixel_slot: jnp.ndarray,  # (H, W) int32 slot id, -1 = none
    slot_valid: jnp.ndarray,  # (S,)
    avg_residuum: jnp.ndarray,  # (S,)
    max_objects: int,
    max_dim_ratio: float,
) -> Objects:
    """Fit an oriented bbox per object slot (computeAllObjects +
    getObject, detection.cpp:726-818), including the dimension-ratio
    feasibility gate (largest/2nd-largest < max_dim_ratio,
    detection.cpp:800-804)."""
    S = max_objects
    p = points.reshape(-1, 3)
    seg = pixel_slot.reshape(-1)
    member = seg >= 0

    # slot count is tiny (<=30), so per-slot reductions run DENSE over an
    # (S, N) membership mask — one MXU matmul for all moment sums and
    # masked row-reductions for the extents. This replaces ~10 segment_*
    # scatters (~20 ms) with ~2 ms of fused VPU/MXU work.
    onehot = seg[None, :] == jnp.arange(S, dtype=seg.dtype)[:, None]  # (S, N)
    wm = onehot.astype(p.dtype)
    px, py, pz = p[:, 0], p[:, 1], p[:, 2]
    feats = jnp.stack(
        [jnp.ones_like(px), px, py, px * px, py * py, px * py], axis=-1
    )  # (N, 6)
    sums = jnp.matmul(wm, feats, precision=jax.lax.Precision.HIGHEST)  # (S, 6)

    cnt = sums[:, 0]
    safe_cnt = jnp.maximum(cnt, 1.0)
    mx, my = sums[:, 1] / safe_cnt, sums[:, 2] / safe_cnt
    # normalized XY covariance (computeCovarianceMatrixNormalized / N)
    sxx = sums[:, 3] / safe_cnt - mx * mx
    syy = sums[:, 4] / safe_cnt - my * my
    sxy = sums[:, 5] / safe_cnt - mx * my

    _, _, v0, v1 = _eigh2(sxx, sxy, syy)  # (S, 2) each
    E = jnp.stack([v0, v1], axis=-1)  # (S, 2, 2) columns = eigvecs

    # extents in each slot's PCA frame: q = E^T (p_xy - mu), dense (S, N)
    mu = jnp.stack([mx, my], axis=-1)  # (S, 2)
    dx = px[None, :] - mx[:, None]
    dy = py[None, :] - my[:, None]
    q0 = v0[:, 0:1] * dx + v0[:, 1:2] * dy  # (S, N)
    q1 = v1[:, 0:1] * dx + v1[:, 1:2] * dy

    big = jnp.float32(1e9)

    def smin(v):
        return jnp.min(jnp.where(onehot, v, big), axis=1)

    def smax(v):
        return jnp.max(jnp.where(onehot, v, -big), axis=1)

    qx_min, qx_max = smin(q0), smax(q0)
    qy_min, qy_max = smin(q1), smax(q1)
    z_min, z_max = smin(pz[None, :]), smax(pz[None, :])

    mean_q = 0.5 * jnp.stack([qx_max + qx_min, qy_max + qy_min], axis=-1)
    center_xy = jnp.einsum("sij,sj->si", E, mean_q, precision=jax.lax.Precision.HIGHEST) + mu
    center_z = 0.5 * (z_max + z_min)
    yaw = jnp.arctan2(v0[:, 1], v0[:, 0])  # detection.cpp:770
    dims = jnp.stack([qx_max - qx_min, qy_max - qy_min, z_max - z_min], axis=-1)

    state = jnp.concatenate(
        [
            center_xy,
            center_z[:, None],
            jnp.sin(yaw / 2.0)[:, None],
            dims,
        ],
        axis=-1,
    )

    volume = jnp.maximum(dims[:, 0] * dims[:, 1] * dims[:, 2], 1e-9)
    density = cnt / volume

    ds = jnp.sort(dims, axis=-1)  # ascending
    ratio_ok = ds[:, 2] / jnp.maximum(ds[:, 1], 1e-9) < max_dim_ratio
    valid = slot_valid & (cnt > 0) & ratio_ok

    zeros = jnp.zeros_like(cnt)
    return Objects(
        state=jnp.where(valid[:, None], state, 0.0),
        num_points=jnp.where(valid, cnt, zeros),
        density=jnp.where(valid, density, zeros),
        avg_residuum=jnp.where(valid, avg_residuum, zeros),
        valid=valid,
    )


# ---------------------------------------------------------------------------
# OBB IoU (bbox_iou.h)
# ---------------------------------------------------------------------------

_PMAX = 16  # intersection of two rectangles has <= 8 vertices


def _rect_vertices(cx, cy, w, h, r):
    """bbox_iou.h:55-71 (r used directly as radians, the reference quirk)."""
    dx, dy = w / 2.0, h / 2.0
    dxc, dxs = dx * jnp.cos(r), dx * jnp.sin(r)
    dyc, dys = dy * jnp.cos(r), dy * jnp.sin(r)
    vs = jnp.stack(
        [
            jnp.stack([-dxc + dys, -dxs - dyc]),
            jnp.stack([dxc + dys, dxs - dyc]),
            jnp.stack([dxc - dys, dxs + dyc]),
            jnp.stack([-dxc - dys, -dxs + dyc]),
        ]
    )
    return vs + jnp.stack([cx, cy])


def _intersection_area(r1, r2):
    """Sutherland-Hodgman clip of rect1 by rect2 (bbox_iou.h:73-127) with a
    fixed-size vertex buffer."""
    poly = jnp.zeros((_PMAX, 2))
    poly = poly.at[:4].set(_rect_vertices(*r1))
    n = jnp.int32(4)
    rect2 = _rect_vertices(*r2)

    def clip_edge(carry, i):
        poly, n = carry
        p = rect2[i]
        q = rect2[(i + 1) % 4]
        # line through p, q: a x + b y + c, inside where <= 0
        a = q[1] - p[1]
        b = p[0] - q[0]
        c = q[0] * p[1] - q[1] * p[0]  # cross(q, p)

        idx = jnp.arange(_PMAX)
        active = idx < n
        vals = a * poly[:, 0] + b * poly[:, 1] + c
        nxt_idx = jnp.where(idx + 1 < n, idx + 1, 0)
        nxt = poly[nxt_idx]
        nxt_vals = vals[nxt_idx]

        keep_s = active & (vals <= 0.0)
        crossing = active & (vals * nxt_vals < 0.0)
        # intersection point of the clip line with segment (s, nxt)
        denom = jnp.where(jnp.abs(vals - nxt_vals) < 1e-12, 1e-12, vals - nxt_vals)
        t = vals / denom
        ipt = poly + (nxt - poly) * t[:, None]

        # emit up to 2 points per input vertex: [s if keep] then [ipt if
        # cross]. Emission via one-hot matmuls (16x16) instead of
        # scatters — the whole pairwise IoU matrix vmaps into batched
        # VPU/MXU work with no scatter serialization.
        emit_cnt = keep_s.astype(jnp.int32) + crossing.astype(jnp.int32)
        offs = jnp.cumsum(emit_cnt) - emit_cnt
        new_n = jnp.sum(emit_cnt)

        slots = jnp.arange(_PMAX)
        pos_s = jnp.where(keep_s, offs, _PMAX)
        pos_i = jnp.where(crossing, offs + keep_s.astype(jnp.int32), _PMAX)
        oh_s = (pos_s[:, None] == slots[None, :]).astype(poly.dtype)
        oh_i = (pos_i[:, None] == slots[None, :]).astype(poly.dtype)
        out = jnp.matmul(
            oh_s.T, poly, precision=jax.lax.Precision.HIGHEST
        ) + jnp.matmul(oh_i.T, ipt, precision=jax.lax.Precision.HIGHEST)
        # degenerate (<=2 vertices): dead polygon (bbox_iou.h:82-83,112-115)
        new_n = jnp.where(n <= 2, 0, new_n)
        return (out, new_n), None

    (poly, n), _ = jax.lax.scan(clip_edge, (poly, n), jnp.arange(4))

    idx = jnp.arange(_PMAX)
    active = idx < n
    nxt = poly[jnp.where(idx + 1 < n, idx + 1, 0)]
    cross = poly[:, 0] * nxt[:, 1] - poly[:, 1] * nxt[:, 0]
    area = 0.5 * jnp.sum(jnp.where(active, cross, 0.0))
    return jnp.where(n > 2, area, 0.0)


@jax.jit
def obb_iou(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """3D IoU of two [cx,cy,cz,sin(yaw/2),l,w,h] boxes (bbox_iou.h:129-155)."""
    inter = _intersection_area(
        (b1[0], b1[1], b1[4], b1[5], b1[3]),
        (b2[0], b2[1], b2[4], b2[5], b2[3]),
    )
    min1, max1 = b1[2] - b1[6] / 2, b1[2] + b1[6] / 2
    min2, max2 = b2[2] - b2[6] / 2, b2[2] + b2[6] / 2
    h_overlap = jnp.maximum(jnp.minimum(max1, max2) - jnp.maximum(min1, min2), 0.0)
    inter_vol = h_overlap * inter
    total = b1[4] * b1[5] * b1[6] + b2[4] * b2[5] * b2[6] - inter_vol
    iou = jnp.maximum(inter_vol / jnp.where(jnp.abs(total) < 1e-12, 1e-12, total), 0.0)
    return jnp.minimum(iou, 1.0)


obb_iou_matrix = jax.jit(
    jax.vmap(jax.vmap(obb_iou, in_axes=(None, 0)), in_axes=(0, None))
)


@partial(jax.jit, static_argnames=("budget",))
def obb_iou_matrix_gated(
    det_state: jnp.ndarray,  # (D, 7)
    trk_state: jnp.ndarray,  # (T, 7)
    det_valid: jnp.ndarray,  # (D,)
    trk_valid: jnp.ndarray,  # (T,)
    budget: int = 256,
) -> jnp.ndarray:
    """(D, T) OBB IoU matrix, paying Sutherland-Hodgman only for pairs
    that can actually overlap.

    The dense matrix clips every (det, track) pair — 4096 tiny-matmul
    polygon clips at 64x64 slots, of which a real scene has well under a
    hundred with nonzero IoU (the reference computes the same matrix for
    ~5 objects, tracking.cpp:96-114). Here two exact necessary conditions
    gate the pairs first:

      * z-extents overlap: |cz_d - cz_t| < (h_d + h_t) / 2
      * XY centers within the sum of the rectangles' circumradii

    plus slot validity. Surviving pairs are compacted to a fixed
    ``budget`` via top_k (preferring the CLOSEST pairs by center
    distance), clipped, and scattered back; gated-out pairs are exactly
    IoU = 0. If more than ``budget`` pairs survive the gate (degenerate
    scenes), the farthest extras are approximated as 0 — the assignment
    cost then treats them as non-overlapping, which is where far pairs
    land anyway.
    """
    D, T = det_state.shape[0], trk_state.shape[0]
    P = D * T
    B = min(budget, P)

    dz = jnp.abs(det_state[:, None, 2] - trk_state[None, :, 2])
    z_ok = dz < 0.5 * (det_state[:, None, 6] + trk_state[None, :, 6])
    dxy = jnp.linalg.norm(
        det_state[:, None, :2] - trk_state[None, :, :2], axis=-1
    )
    rad_d = 0.5 * jnp.linalg.norm(det_state[:, 4:6], axis=-1)
    rad_t = 0.5 * jnp.linalg.norm(trk_state[:, 4:6], axis=-1)
    xy_ok = dxy <= rad_d[:, None] + rad_t[None, :]
    gate = det_valid[:, None] & trk_valid[None, :] & z_ok & xy_ok

    flat_gate = gate.reshape(-1)
    score = jnp.where(flat_gate, -dxy.reshape(-1), -jnp.inf)
    vals, sel = jax.lax.top_k(score, B)
    ok = vals > -jnp.inf
    di = jnp.clip(sel // T, 0, D - 1)
    ti = jnp.clip(sel % T, 0, T - 1)
    ious = jax.vmap(obb_iou)(det_state[di], trk_state[ti])
    iou_flat = jnp.zeros((P,), ious.dtype)
    iou_flat = iou_flat.at[jnp.where(ok, sel, P)].set(
        jnp.where(ok, ious, 0.0), mode="drop"
    )
    return iou_flat.reshape(D, T)
