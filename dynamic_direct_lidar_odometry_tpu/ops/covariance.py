"""Per-point GICP covariance estimation with PLANE regularization.

Functional equivalent of ``NanoGICP::calculate_covariances``
(nano_gicp_impl.hpp:375-441): for every point, take its k nearest
neighbors (including itself), form the neighborhood covariance, and
regularize its spectrum to (1, 1, 1e-3) — the "locally planar" GICP model.

TPU-native differences: the kd-tree k-NN is the matmul sweep from
:mod:`.knn`; the per-point 3x3 JacobiSVD becomes one batched
``jnp.linalg.eigh`` (the covariance is symmetric PSD, so its SVD *is* its
eigendecomposition with ascending/descending reorder), which XLA lowers to
a vectorized batched solver instead of 1e4 sequential host-loop SVDs.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from dynamic_direct_lidar_odometry_tpu.ops import knn as knn_ops


@partial(jax.jit, static_argnames=("k",))
def plane_covariances(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    k: int = 20,
) -> jnp.ndarray:
    """Compute regularized (N, 3, 3) covariances for a masked cloud.

    Args:
      points: (N, 3) float32; invalid rows already at the SENTINEL.
      mask: (N,) bool validity.
      k: neighborhood size (``kCorrespondences``; 10 for s2s, 20 for s2m in
         cfg/DOALS.yaml:44,54).

    Returns:
      (N, 3, 3) covariances; invalid points get identity (they are masked
      out of every downstream reduction anyway).
    """
    idx, _ = knn_ops.knn(points, points, k)
    neigh = points[idx]  # (N, k, 3)
    mean = jnp.mean(neigh, axis=1, keepdims=True)
    centered = neigh - mean
    # cov = X^T X / k, matching the reference's normalization
    # (nano_gicp_impl.hpp:398-399). HIGHEST: the default bf16 matmul pass
    # drowns the small eigenvalue that PLANE regularization keys on.
    cov = (
        jnp.einsum(
            "nki,nkj->nij", centered, centered,
            precision=jax.lax.Precision.HIGHEST,
        )
        / k
    )

    cov_reg = regularize_plane(cov)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=points.dtype), cov_reg.shape)
    return jnp.where(mask[:, None, None], cov_reg, eye)


@jax.jit
def regularize_plane(cov: jnp.ndarray) -> jnp.ndarray:
    """Spectrum-replace each (..., 3, 3) covariance with (1, 1, 1e-3).

    RegularizationMethod::PLANE (nano_gicp_impl.hpp:423-425,435-436):
    C_reg = U diag(1, 1, 1e-3) U^T with U the eigenvectors of C.
    ``eigh`` returns ascending eigenvalues, so the replacement spectrum is
    (1e-3, 1, 1) in eigh order.
    """
    # eigh on symmetric PSD is the SVD; jitter for degenerate neighborhoods
    w, v = jnp.linalg.eigh(cov + 1e-12 * jnp.eye(3, dtype=cov.dtype))
    del w
    values = jnp.array([1e-3, 1.0, 1.0], dtype=cov.dtype)
    return jnp.einsum(
        "...ij,j,...kj->...ik", v, values, v,
        precision=jax.lax.Precision.HIGHEST,
    )
