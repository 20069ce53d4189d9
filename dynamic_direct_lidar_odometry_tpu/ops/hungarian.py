"""Optimal linear assignment inside ``jit`` (the Hungarian step).

Replaces the Munkres Matlab-port (``src/tracking/hungarian.cpp:51-436``)
with the Jonker-Volgenant successive-shortest-augmenting-path algorithm in
``lax`` loops over a fixed, padded N x N cost matrix. O(N^3) with N =
tracker slot capacity (tiny: <= 64), fully differentiable control flow is
not needed — only static shapes.

Rectangular problems are padded with a large constant: a row assigned to a
padded column is "unassigned" (the reference's -1 semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BIG = np.float32(1.0e6)
_INF = np.float32(3.0e12)


@jax.jit
def solve(
    cost: jnp.ndarray, row_valid: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Minimum-cost assignment on a square (N, N) matrix.

    Returns col_of_row (N,) int32 (-1 for skipped rows). Classic
    JV/e-maxx formulation with a virtual column 0; all buffers are (N+1,).

    ``row_valid`` bounds the sequential depth: the JV algorithm inserts
    rows one augmenting path at a time, so invalid rows (uniform padded
    cost; the reference's problems are 2-5 real objects inside a 64-slot
    capacity) are skipped entirely instead of burning a full path each —
    their result is -1, exactly what the caller masks to anyway.
    """
    N = cost.shape[0]
    C = jnp.pad(cost.astype(jnp.float32), ((1, 0), (1, 0)))  # 1-indexed

    def insert_row(i, carry):
        u, v, p, way = carry
        p = p.at[0].set(i)
        minv = jnp.full((N + 1,), _INF)
        used = jnp.zeros((N + 1,), bool)

        def cond(st):
            _, _, _, _, j0, done = st
            return ~done

        def body(st):
            minv, used, way, (u, v), j0, _ = st
            used = used.at[j0].set(True)
            i0 = p[j0]
            cols = jnp.arange(N + 1)
            cur = C[i0] - u[i0] - v
            better = (~used) & (cols >= 1) & (cur < minv)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            cand = jnp.where((~used) & (cols >= 1), minv, _INF)
            j1 = jnp.argmin(cand)
            delta = cand[j1]
            # potentials update: u[p[j]] += delta, v[j] -= delta for used j
            u = u.at[p].add(jnp.where(used, delta, 0.0))
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used, minv, minv - delta)
            done = p[j1] == 0
            return minv, used, way, (u, v), j1, done

        init = (minv, used, way, (u, v), jnp.int32(0), jnp.bool_(False))
        minv, used, way, (u, v), j0, _ = jax.lax.while_loop(cond, body, init)

        # augment along the alternating path
        def aug_cond(st):
            _, j0 = st
            return j0 != 0

        def aug_body(st):
            p, j0 = st
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return p, j1

        p, _ = jax.lax.while_loop(aug_cond, aug_body, (p, j0))
        return u, v, p, way

    def assign_row(i, carry):
        if row_valid is None:
            return insert_row(i, carry)
        return jax.lax.cond(
            row_valid[i - 1], lambda c: insert_row(i, c), lambda c: c, carry
        )

    u = jnp.zeros((N + 1,))
    v = jnp.zeros((N + 1,))
    p = jnp.zeros((N + 1,), jnp.int32)  # p[j] = row assigned to col j
    way = jnp.zeros((N + 1,), jnp.int32)
    u, v, p, way = jax.lax.fori_loop(1, N + 1, assign_row, (u, v, p, way))

    # invert: col_of_row[r] = c where p[c] == r+1 (convert back to 0-index)
    col_of_row = jnp.zeros((N,), jnp.int32)
    cols = jnp.arange(1, N + 1)
    col_of_row = col_of_row.at[p[1:] - 1].set(cols.astype(jnp.int32), mode="drop")
    return col_of_row - 1  # 0-indexed


@jax.jit
def assign(
    cost: jnp.ndarray,
    row_valid: jnp.ndarray,
    col_valid: jnp.ndarray,
) -> jnp.ndarray:
    """Rectangular masked assignment (the reference's
    ``HungarianAlgorithm::Solve`` semantics, tracking.cpp:118-127).

    Args:
      cost: (R, C) costs for valid pairs (anything elsewhere).
      row_valid/col_valid: validity masks.

    Returns:
      (R,) int32: assigned col per row, -1 if unassigned/invalid.
    """
    R, Ccols = cost.shape
    N = max(R, Ccols)
    pad = jnp.full((N, N), BIG)
    ok = row_valid[:, None] & col_valid[None, :]
    pad = pad.at[:R, :Ccols].set(jnp.where(ok, jnp.minimum(cost, BIG - 1), BIG))
    # bound the JV sequential depth by the number of VALID detections —
    # padded/invalid rows would otherwise each burn a full augmenting path
    rv = jnp.zeros((N,), bool).at[:R].set(row_valid)
    col = solve(pad, rv)[:R]
    matched = (col >= 0) & (col < Ccols)
    matched = matched & row_valid
    matched = matched & jnp.where(
        (col >= 0) & (col < Ccols), col_valid[jnp.clip(col, 0, Ccols - 1)], False
    )
    # a row assigned to a BIG (invalid) pair is unmatched
    pair_cost = pad[jnp.arange(R), jnp.clip(col, 0, N - 1)]
    matched = matched & (pair_cost < BIG - 0.5)
    return jnp.where(matched, col, -1)
