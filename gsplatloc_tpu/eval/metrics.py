"""Pose/trajectory error metrics (JAX + numpy variants).

Parity with reference src/eval/utils.py:14-168 (translation/rotation errors)
and src/eval/logger.py:258-304 (ATE/AAE RMSE reduction over a sequence).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def translation_error(est_pose: jnp.ndarray, true_pose: jnp.ndarray) -> jnp.ndarray:
    """||t_est - t_true||_2 for (..., 4, 4) poses."""
    return jnp.linalg.norm(est_pose[..., :3, 3] - true_pose[..., :3, 3], axis=-1)


def rotation_error_deg(est_pose, true_pose) -> np.ndarray:
    """Geodesic rotation error in degrees: acos((tr(R_est R_true^T)-1)/2).

    Computed host-side in float64 (mirroring the reference's numpy variant,
    eval/utils.py:142-168): acos near 1 has a sqrt(eps) noise floor, so a
    float32/on-device version cannot resolve below ~0.026 deg — and a
    default-precision TPU einsum (bf16 MXU pass) zeroes out sub-degree
    errors entirely. All callers are host-side eval/logging."""
    R_est = np.asarray(est_pose, dtype=np.float64)[..., :3, :3]
    R_true = np.asarray(true_pose, dtype=np.float64)[..., :3, :3]
    delta = np.einsum("...ij,...kj->...ik", R_est, R_true)
    tr = np.trace(delta, axis1=-2, axis2=-1)
    cos = np.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return np.degrees(np.arccos(cos))


def rmse(values) -> float:
    """sqrt(mean(x^2)) — the reduction used for ATE/AAE RMSE."""
    v = np.asarray(values, dtype=np.float64)
    return float(np.sqrt(np.mean(v**2))) if v.size else float("nan")


def pointcloud_rmse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-point RMSE between equally-sized clouds (reference eval/utils.py:66-89)."""
    return jnp.sqrt(jnp.mean(jnp.sum((a - b) ** 2, axis=-1)))


def com_difference(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Center-of-mass distance (reference eval/utils.py:92-110)."""
    return jnp.linalg.norm(jnp.mean(a, axis=0) - jnp.mean(b, axis=0))


def silhouette_diff(depth_a: jnp.ndarray, depth_b: jnp.ndarray) -> jnp.ndarray:
    """Absolute Sobel-edge difference image (reference eval/utils.py:177-204)."""
    from ..ops.filters import sobel_magnitude

    return jnp.abs(sobel_magnitude(depth_a) - sobel_magnitude(depth_b))


def set_random_seed(seed: int = 42):
    """Seed host-side RNGs (reference eval/utils.py:171-174). JAX randomness
    is explicit-key, so this covers numpy/python only."""
    import random

    random.seed(seed)
    np.random.seed(seed)
