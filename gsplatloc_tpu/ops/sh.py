"""Real spherical harmonics color evaluation (degrees 0..3), pure JAX.

Equivalent of gsplat's SH path: the reference passes SH coefficients
colors[N, (deg+1)^2, 3] with sh_degree=1 into gsplat.rasterization
(src/my_gsplat/model.py:190-213); gsplat evaluates SH along the per-Gaussian
view direction, then shifts by +0.5 and clamps at 0. With the reference's
init (sh0 = (rgb-0.5)/C0, shN = 0, src/my_gsplat/model.py:168-175) the result
is exactly `rgb`.
"""

from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """DC coefficient from RGB (reference src/my_gsplat/utils.py:53-55)."""
    return (rgb - 0.5) / C0


def sh_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    return sh * C0 + 0.5


def eval_sh(degree: int, coeffs: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH colors.

    Args:
      degree: active SH degree (0..3); coeffs may hold more bands (ignored).
      coeffs: (N, K, 3) with K >= (degree+1)^2.
      dirs:   (N, 3) un-normalized view directions (mean - camera center).

    Returns:
      (N, 3) colors, already offset by +0.5 and clamped at 0 (gsplat semantics).
    """
    result = C0 * coeffs[:, 0, :]
    if degree >= 1:
        d = dirs / jnp.clip(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        x, y, z = d[:, 0:1], d[:, 1:2], d[:, 2:3]
        result = (
            result
            - C1 * y * coeffs[:, 1, :]
            + C1 * z * coeffs[:, 2, :]
            - C1 * x * coeffs[:, 3, :]
        )
        if degree >= 2:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + C2[0] * xy * coeffs[:, 4, :]
                + C2[1] * yz * coeffs[:, 5, :]
                + C2[2] * (2.0 * zz - xx - yy) * coeffs[:, 6, :]
                + C2[3] * xz * coeffs[:, 7, :]
                + C2[4] * (xx - yy) * coeffs[:, 8, :]
            )
            if degree >= 3:
                result = (
                    result
                    + C3[0] * y * (3 * xx - yy) * coeffs[:, 9, :]
                    + C3[1] * xy * z * coeffs[:, 10, :]
                    + C3[2] * y * (4 * zz - xx - yy) * coeffs[:, 11, :]
                    + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * coeffs[:, 12, :]
                    + C3[4] * x * (4 * zz - xx - yy) * coeffs[:, 13, :]
                    + C3[5] * z * (xx - yy) * coeffs[:, 14, :]
                    + C3[6] * x * (xx - 3 * yy) * coeffs[:, 15, :]
                )
    return jnp.maximum(result + 0.5, 0.0)
