"""Fixed-capacity masked point-cloud containers.

The reference passes around dynamically-sized ``pcl::PointCloud<PointXYZI>``
(``include/odometry/ddlo.h:90-103``). Under XLA every shape is static, so a
cloud here is a pair of arrays ``(points (N,3), mask (N,))`` at a fixed
capacity N; invalid slots carry a sentinel position far away from the scene
so that distance-based ops naturally ignore them without branching.

The intensity channel (used by the reference to smuggle ICP residuals,
odom.cc:804-827) travels as a separate optional array.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

# Far-away sentinel for invalid points: keeps NN distances huge without NaNs.
SENTINEL = 1.0e6


class Cloud(NamedTuple):
    """A masked, fixed-capacity point cloud."""

    points: jnp.ndarray  # (N, 3) float
    mask: jnp.ndarray  # (N,) bool

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.mask)

    def sanitized(self) -> "Cloud":
        """Replace invalid slots by the far-away sentinel."""
        pts = jnp.where(self.mask[:, None], self.points, SENTINEL)
        return Cloud(pts, self.mask)


def from_array(
    points: jnp.ndarray, capacity: Optional[int] = None, mask: Optional[jnp.ndarray] = None
) -> Cloud:
    """Pack an (M,3) array (optionally masked) into a capacity-N Cloud."""
    m = points.shape[0]
    if mask is None:
        mask = jnp.isfinite(points).all(axis=-1)
    points = jnp.where(mask[:, None], points, 0.0)
    if capacity is None or capacity == m:
        return Cloud(points.astype(jnp.float32), mask)
    if m > capacity:
        raise ValueError(f"cloud of {m} points exceeds capacity {capacity}")
    pad = capacity - m
    return Cloud(
        jnp.pad(points.astype(jnp.float32), ((0, pad), (0, 0))),
        jnp.pad(mask, (0, pad)),
    )


def empty(capacity: int, dtype=jnp.float32) -> Cloud:
    return Cloud(
        jnp.zeros((capacity, 3), dtype=dtype), jnp.zeros((capacity,), dtype=bool)
    )
