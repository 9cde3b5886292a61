"""PCA scene normalization (pure JAX).

Behavioral parity with reference src/data/normalize.py: median-centered
covariance eigendecomposition -> SE(3) aligning principal axes to coordinate
axes; applied to both frames' world points and the target pose, extracting the
scale factor used to rescale rendered depth.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .lie import transform_points  # re-exported convenience


def align_principal_axes(points: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) points -> (4, 4) SE(3) whose rotation aligns principal axes.

    Parity with reference src/data/normalize.py:8-50: centroid = per-axis
    median, covariance of centered cloud, eigh, eigenvectors sorted by
    descending eigenvalue, determinant sign fix on the first eigenvector,
    R = V^T, t = -R @ centroid. fp32 eigh runs via XLA (on TPU this lowers to
    a host-callable or on-device QR iteration; it is a once-per-frame op).
    """
    # torch.median returns the LOWER middle element for even N (depth-image
    # clouds are always even, H*W); jnp.median would interpolate
    n_pts = points.shape[0]
    centroid = jnp.sort(points, axis=0)[(n_pts - 1) // 2]
    centered = points - centroid
    # torch.cov uses unbiased (N-1) normalization.
    n = centered.shape[0]
    cov = jnp.matmul(centered.T, centered, precision=lax.Precision.HIGHEST) / (n - 1)
    eigvals, eigvecs = jnp.linalg.eigh(cov)
    order = jnp.argsort(-eigvals)
    eigvecs = eigvecs[:, order]
    det = jnp.linalg.det(eigvecs)
    eigvecs = eigvecs.at[:, 0].multiply(jnp.where(det < 0, -1.0, 1.0))
    R = eigvecs.T
    T = jnp.eye(4, dtype=points.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(-jnp.matmul(R, centroid, precision=lax.Precision.HIGHEST))
    return T


def transform_cameras(matrix: jnp.ndarray, c2w: jnp.ndarray):
    """Apply (4,4) SE(3) to (B,4,4) c2w stack; returns (new_c2w, scale (B,1)).

    Parity with reference src/data/normalize.py:76-104: left-multiply, then
    re-normalize the rotation block by the norm of the transformed first row
    (the extracted `scaling` is the pca scale factor).
    """
    transformed = jnp.einsum("ki,nij->nkj", matrix, c2w, precision=lax.Precision.HIGHEST)
    scaling = jnp.linalg.norm(transformed[:, 0, :3], axis=1, keepdims=True)  # (B,1)
    rot = transformed[:, :3, :3] / scaling[..., None]
    transformed = transformed.at[:, :3, :3].set(rot)
    return transformed, scaling


def normalize_pair(
    tar_points: jnp.ndarray,
    src_points: jnp.ndarray,
    tar_pose: jnp.ndarray,
    src_pose: jnp.ndarray,
):
    """Normalize a (tar, src) world-frame pair by tar's principal axes.

    Parity with reference normalize_2C (src/data/normalize.py:108-124): the
    transform is computed from tar's points and applied to both point clouds
    and both poses (apply_normalize_T runs on tar and src; the scale factor
    returned is the one extracted from tar's pose).

    Returns (tar_points', src_points', tar_pose', src_pose', pca_factor).
    """
    T = align_principal_axes(tar_points)
    tar_points = transform_points(T, tar_points)
    src_points = transform_points(T, src_points)
    new_tar, scale = transform_cameras(T, tar_pose[None])
    new_src, _ = transform_cameras(T, src_pose[None])
    return tar_points, src_points, new_tar[0], new_src[0], scale[0, 0]
