import numpy as np

import jax.numpy as jnp
from scipy.spatial import cKDTree

from dynamic_direct_lidar_odometry_tpu.core import cloud as cloud_lib
from dynamic_direct_lidar_odometry_tpu.ops import covariance


def _ref_plane_covs(pts, k):
    """NumPy oracle reproducing nano_gicp_impl.hpp:375-441 (PLANE)."""
    tree = cKDTree(pts)
    _, idx = tree.query(pts, k=k)
    covs = np.zeros((len(pts), 3, 3))
    for i in range(len(pts)):
        nb = pts[idx[i]].astype(np.float64)
        nb = nb - nb.mean(0)
        cov = nb.T @ nb / k
        U, s, Vt = np.linalg.svd(cov)
        covs[i] = U @ np.diag([1.0, 1.0, 1e-3]) @ Vt
    return covs


def test_plane_covariances_match_oracle():
    rng = np.random.default_rng(0)
    # planar-ish surface with noise: the PLANE model's target case
    xy = rng.uniform(-5, 5, size=(400, 2))
    z = 0.05 * rng.normal(size=400)
    pts = np.column_stack([xy, z]).astype(np.float32)

    covs = np.asarray(
        covariance.plane_covariances(
            jnp.asarray(pts), jnp.ones(len(pts), bool), k=20
        )
    )
    ref = _ref_plane_covs(pts, 20)
    # spectra must match exactly: (1e-3, 1, 1)
    w = np.linalg.eigvalsh(covs)
    np.testing.assert_allclose(w[:, 0], 1e-3, rtol=1e-2)
    np.testing.assert_allclose(w[:, 1:], 1.0, rtol=1e-2)
    # the small-eigenvalue direction (surface normal) must agree
    def min_dir(C):
        vals, vecs = np.linalg.eigh(C)
        return vecs[:, :, 0]

    n_got, n_ref = min_dir(covs), min_dir(ref)
    dots = np.abs(np.sum(n_got * n_ref, axis=1))
    assert np.quantile(dots, 0.05) > 0.99


def test_masked_points_get_identity():
    pts = np.random.default_rng(1).normal(size=(64, 3)).astype(np.float32)
    mask = np.ones(64, bool)
    mask[10:20] = False
    c = cloud_lib.Cloud(jnp.asarray(pts), jnp.asarray(mask)).sanitized()
    covs = np.asarray(covariance.plane_covariances(c.points, c.mask, k=5))
    np.testing.assert_allclose(covs[10:20], np.eye(3)[None].repeat(10, 0))
