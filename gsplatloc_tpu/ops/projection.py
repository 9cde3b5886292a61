"""3D Gaussian -> 2D screen-space projection (pure JAX, fully differentiable).

TPU-native equivalent of the gsplat CUDA projection stage consumed by the
reference at src/my_gsplat/model.py:195-213 (math spec:
/root/reference/docs/main.md:148-212 — EWA splatting, classic mode):

  * world->camera transform of means (grads flow to the pose via viewmat),
  * perspective projection of means to pixel coordinates,
  * Sigma_2D = J W Sigma W^T J^T with the EWA Jacobian J (FoV-limited),
  * classic-mode 0.3-pixel dilation of the 2D covariance,
  * conic (inverse 2D covariance), 3-sigma radius, and visibility culling.

Everything is vectorized over N — XLA maps the (N,3)x(3,3) contractions onto
the MXU; no scalar loops. Culling quantities (radius, valid) are integer /
boolean with stop_gradient semantics by construction.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

HIGHEST = lax.Precision.HIGHEST

# Radius multiplier covering the full ALPHA_MIN=1/255 contribution reach of
# an opacity-1 splat: alpha = exp(-sigma) >= 1/255  <=>  r <= sqrt(2 ln 255)
# = 3.32904... (computed, not hardcoded: a truncated constant leaves a
# sliver of rim pixels that pass the ALPHA_MIN gate outside every binned
# tile — exactly the crack pixels the reach bound exists to prevent).
ALPHA_REACH = math.sqrt(2.0 * math.log(255.0))


class ProjectedGaussians(NamedTuple):
    """Screen-space Gaussians for one camera."""

    mean2d: jnp.ndarray  # (N, 2) pixel coords
    conic: jnp.ndarray  # (N, 3) inverse 2D covariance (a, b, c) for [[a,b],[b,c]]
    depth: jnp.ndarray  # (N,) camera-frame z
    radius: jnp.ndarray  # (N,) int32 3-sigma pixel radius (0 = culled)
    valid: jnp.ndarray  # (N,) bool
    opacity_comp: jnp.ndarray | None = None  # (N,) antialiased compensation


def project_iso_binning(
    means: jnp.ndarray,  # (N, 3) world
    s2: jnp.ndarray,  # (N,) isotropic world VARIANCE (scale^2)
    viewmat: jnp.ndarray,  # (4, 4) world->camera
    K: jnp.ndarray,  # (3, 3)
    width: int,
    height: int,
    near_plane: float = 1e-2,
    far_plane: float = 1e10,
    eps2d: float = 0.3,
) -> ProjectedGaussians:
    """Binning-facing projection for ISOTROPIC scenes (identity quats,
    s*I scales — the fused-tracking scene contract): cov_cam = R s2 I R^T
    = s2*I identically, so the two batched (N,3,3) einsums of
    `project_gaussians` (the round-4 profile's 10.7 ms 'nij,nkj->nik'
    rebuild term — XLA lowers tiny batched 3x3 matmuls miserably) fold
    into elementwise scalar algebra: cov2d = s2*(J J^T) + eps2d*I, the
    same folding `ops/fused_tracking._project_parts` uses in-kernel.
    Returns mean2d/depth/radius/valid only (conic=None — binning does not
    read it). Values match `project_gaussians` on iso inputs up to fp
    reassociation (~1 ulp); the int radius and validity gates agree except
    on measure-zero ties. Consumed by the K-cover rebuild
    (ops/kcover.py build_kcover_slot_buffer)."""
    R_cw = viewmat[:3, :3]
    t_cw = viewmat[:3, 3]
    p_cam = jnp.matmul(means, R_cw.T, precision=HIGHEST) + t_cw  # (N, 3)
    x, y, z = p_cam[:, 0], p_cam[:, 1], p_cam[:, 2]

    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]

    zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    mean2d = jnp.stack([fx * x / zs + cx, fy * y / zs + cy], axis=-1)

    lim_x = 1.3 * 0.5 * width / fx
    lim_y = 1.3 * 0.5 * height / fy
    tx = zs * jnp.clip(x / zs, -lim_x, lim_x)
    ty = zs * jnp.clip(y / zs, -lim_y, lim_y)
    rz = 1.0 / zs
    rz2 = rz * rz
    j00 = fx * rz
    j02 = -fx * tx * rz2
    j11 = fy * rz
    j12 = -fy * ty * rz2

    a = s2 * (j00 * j00 + j02 * j02) + eps2d
    b = s2 * (j02 * j12)
    c = s2 * (j11 * j11 + j12 * j12) + eps2d
    det = a * c - b * b

    bmid = 0.5 * (a + c)
    v1 = bmid + jnp.sqrt(jnp.maximum(bmid * bmid - det, 0.01))
    radius_f = jnp.ceil(ALPHA_REACH * jnp.sqrt(jnp.maximum(v1, 0.0)))

    valid = (
        (z > near_plane)
        & (z < far_plane)
        & (det > 0.0)
        & (radius_f > 0.0)
        & (mean2d[:, 0] + radius_f > 0)
        & (mean2d[:, 0] - radius_f < width)
        & (mean2d[:, 1] + radius_f > 0)
        & (mean2d[:, 1] - radius_f < height)
    )
    radius = jnp.where(valid, radius_f, 0.0)
    radius = lax.stop_gradient(radius).astype(jnp.int32)
    return ProjectedGaussians(
        mean2d=mean2d, conic=None, depth=z, radius=radius, valid=valid,
        opacity_comp=None,
    )


def quat_scale_to_cov3d(quats: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """Sigma = R S S^T R^T for (N,4) wxyz quats and (N,3) scales -> (N,3,3)."""
    from .lie import quat_to_rotmat

    R = quat_to_rotmat(quats)  # (N,3,3)
    RS = R * scales[:, None, :]  # R @ diag(s)
    return jnp.einsum("nij,nkj->nik", RS, RS, precision=HIGHEST)


def project_gaussians(
    means: jnp.ndarray,  # (N, 3) world
    quats: jnp.ndarray,  # (N, 4) wxyz
    scales: jnp.ndarray,  # (N, 3)
    viewmat: jnp.ndarray,  # (4, 4) world->camera
    K: jnp.ndarray,  # (3, 3)
    width: int,
    height: int,
    near_plane: float = 1e-2,
    far_plane: float = 1e10,
    eps2d: float = 0.3,
    radius_clip: float = 0.0,
    antialiased: bool = False,
) -> ProjectedGaussians:
    """Project 3D Gaussians into screen space.

    antialiased=False: gsplat 'classic' mode (the reference always uses this,
    GsConfig.antialiased=False at src/my_gsplat/model.py:125). True adds the
    gsplat 'antialiased' opacity compensation sqrt(det(cov)/det(cov+eps I)).
    """
    R_cw = viewmat[:3, :3]
    t_cw = viewmat[:3, 3]
    p_cam = jnp.matmul(means, R_cw.T, precision=HIGHEST) + t_cw  # (N, 3)
    x, y, z = p_cam[:, 0], p_cam[:, 1], p_cam[:, 2]

    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]

    zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)  # guard divisions
    mean2d = jnp.stack([fx * x / zs + cx, fy * y / zs + cy], axis=-1)

    # EWA Jacobian with FoV-limited x/z, y/z (gsplat persp_proj clamping).
    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tx = zs * jnp.clip(x / zs, -lim_x, lim_x)
    ty = zs * jnp.clip(y / zs, -lim_y, lim_y)
    rz = 1.0 / zs
    rz2 = rz * rz
    # J rows: [fx/z, 0, -fx*tx/z^2], [0, fy/z, -fy*ty/z^2]
    cov3d = quat_scale_to_cov3d(quats, scales)  # (N,3,3)
    cov_cam = jnp.einsum("ij,njk,lk->nil", R_cw, cov3d, R_cw, precision=HIGHEST)  # (N,3,3)

    j00 = fx * rz
    j02 = -fx * tx * rz2
    j11 = fy * rz
    j12 = -fy * ty * rz2
    # cov2d = J cov_cam J^T, expanded (J is (2,3) sparse).
    c00 = cov_cam[:, 0, 0]
    c01 = cov_cam[:, 0, 1]
    c02 = cov_cam[:, 0, 2]
    c11 = cov_cam[:, 1, 1]
    c12 = cov_cam[:, 1, 2]
    c22 = cov_cam[:, 2, 2]
    a = j00 * (j00 * c00 + j02 * c02) + j02 * (j00 * c02 + j02 * c22)
    b = j00 * (j11 * c01 + j12 * c02) + j02 * (j11 * c12 + j12 * c22)
    c = j11 * (j11 * c11 + j12 * c12) + j12 * (j11 * c12 + j12 * c22)

    det_orig = a * c - b * b  # pre-dilation determinant (antialiased mode)
    # EWA dilation (gsplat eps2d = 0.3).
    a = a + eps2d
    c = c + eps2d

    det = a * c - b * b
    det_safe = jnp.where(det == 0.0, 1e-12, det)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    # Screen radius from the larger eigenvalue. gsplat uses 3 sigma, but an
    # opacity-1 splat stays above the ALPHA_MIN=1/255 contribution gate out
    # to sqrt(2 ln 255) = 3.33 sigma: binning with 3 sigma truncates that
    # annulus at whatever tile granularity a path uses (visible as sparse
    # crack pixels that differ between tile sizes). Covering the full
    # ALPHA_MIN reach makes the rasterization independent of tile size —
    # every pixel the alpha gate accepts is inside some binned tile.
    bmid = 0.5 * (a + c)
    v1 = bmid + jnp.sqrt(jnp.maximum(bmid * bmid - det, 0.01))
    radius_f = jnp.ceil(ALPHA_REACH * jnp.sqrt(jnp.maximum(v1, 0.0)))

    valid = (
        (z > near_plane)
        & (z < far_plane)
        & (det > 0.0)
        & (radius_f > radius_clip)
        & (mean2d[:, 0] + radius_f > 0)
        & (mean2d[:, 0] - radius_f < width)
        & (mean2d[:, 1] + radius_f > 0)
        & (mean2d[:, 1] - radius_f < height)
    )
    radius = jnp.where(valid, radius_f, 0.0)
    radius = lax.stop_gradient(radius).astype(jnp.int32)

    opacity_comp = None
    if antialiased:
        opacity_comp = jnp.sqrt(
            jnp.maximum(det_orig, 0.0) / jnp.maximum(det, 1e-12)
        )

    return ProjectedGaussians(
        mean2d=mean2d, conic=conic, depth=z, radius=radius, valid=valid,
        opacity_comp=opacity_comp,
    )
