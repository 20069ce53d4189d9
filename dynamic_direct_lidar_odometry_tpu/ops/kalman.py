"""Linear Kalman filter, batched over tracker slots.

Equivalent of the generic Eigen KF (``src/tracking/kalman.cpp:69-92``) with
the 10-state constant-velocity model of BoundingBoxFilter
(``src/tracking/bounding_box_filter.cpp:21-41``):

state x = [cx, cy, cz, sin(yaw/2), l, w, h, vx, vy, vz]
meas  y = x[:7]

The reference runs one KF object per tracked box in a loop; here the whole
slot bank predicts/updates as one batched einsum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

N_STATE = 10
N_MEAS = 7


def transition_matrix(dt: jnp.ndarray) -> jnp.ndarray:
    """A(dt): constant-velocity coupling x,y,z <- vx,vy,vz
    (bounding_box_filter.cpp:55-58)."""
    A = jnp.eye(N_STATE, dtype=jnp.float32)
    A = A.at[0, 7].set(dt)
    A = A.at[1, 8].set(dt)
    A = A.at[2, 9].set(dt)
    return A


def measurement_matrix() -> jnp.ndarray:
    return jnp.eye(N_MEAS, N_STATE, dtype=jnp.float32)


def initial_covariance() -> jnp.ndarray:
    """P0 = diag(1000 x7, 10000 x3) (bounding_box_filter.cpp:28-30)."""
    return jnp.diag(
        jnp.array([1000.0] * 7 + [10000.0] * 3, dtype=jnp.float32)
    )


def process_noise() -> jnp.ndarray:
    """Q = diag(1 x7, 0.01 x3) (bounding_box_filter.cpp:35-37)."""
    return jnp.diag(jnp.array([1.0] * 7 + [0.01] * 3, dtype=jnp.float32))


def measurement_noise() -> jnp.ndarray:
    """R = I7 (bounding_box_filter.cpp:32-33)."""
    return jnp.eye(N_MEAS, dtype=jnp.float32)


@jax.jit
def predict(
    x: jnp.ndarray, P: jnp.ndarray, dt: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched predict: x = A x, P = A P A^T + Q (kalman.cpp:69-81).

    Args: x (T, 10), P (T, 10, 10), dt scalar.
    """
    A = transition_matrix(dt)
    Q = process_noise()
    x_new = jnp.matmul(x, A.T, precision=jax.lax.Precision.HIGHEST)
    P_new = jnp.einsum("ij,tjk,lk->til", A, P, A, precision=jax.lax.Precision.HIGHEST) + Q
    return x_new, P_new


@jax.jit
def update(
    x: jnp.ndarray, P: jnp.ndarray, y: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched measurement update (kalman.cpp:83-92):
    K = P C^T (C P C^T + R)^-1; x += K (y - C x); P = (I - K C) P.

    Args: x (T, 10), P (T, 10, 10), y (T, 7).
    """
    C = measurement_matrix()
    R = measurement_noise()
    S = jnp.einsum("ij,tjk,lk->til", C, P, C, precision=jax.lax.Precision.HIGHEST) + R  # (T, 7, 7)
    PCt = jnp.einsum("tij,kj->tik", P, C, precision=jax.lax.Precision.HIGHEST)  # (T, 10, 7)
    K = jnp.linalg.solve(S, PCt.swapaxes(-1, -2)).swapaxes(-1, -2)  # (T,10,7)
    innov = y - x[:, :N_MEAS]
    x_new = x + jnp.einsum("tij,tj->ti", K, innov, precision=jax.lax.Precision.HIGHEST)
    KC = jnp.einsum("tij,jk->tik", K, C, precision=jax.lax.Precision.HIGHEST)
    P_new = jnp.einsum(
        "tij,tjk->tik", jnp.eye(N_STATE) - KC, P,
        precision=jax.lax.Precision.HIGHEST,
    )
    return x_new, P_new
