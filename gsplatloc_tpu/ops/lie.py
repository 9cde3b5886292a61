"""Rotation / SE(3) numerics (pure JAX, fp32).

Quaternions use (w, x, y, z) order throughout, matching the reference's kornia
convention (reference: src/my_gsplat/transform.py:50-84, src/my_gsplat/model.py:32).
All functions are batched over leading dimensions and jit/grad-safe.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# Pose precision is the product: never let TPU matmuls downcast to bf16.
HIGHEST = lax.Precision.HIGHEST


def normalize_quat(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternion(s) to unit norm. q: (..., 4) wxyz."""
    return q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-norm-insensitive quaternion (wxyz) -> rotation matrix (..., 3, 3).

    Normalizes first (reference normalizes via kornia normalize_quaternion,
    src/my_gsplat/transform.py:65-67).
    """
    q = normalize_quat(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) wxyz.

    Branchless Shepperd-style selection of the numerically largest component
    (behavioral parity with kornia rotation_matrix_to_quaternion, used at
    reference src/my_gsplat/model.py:32).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-24))

    # Four candidate constructions; pick by largest pivot.
    sw = _safe_sqrt(1.0 + tr) * 2.0  # 4w
    qw0 = jnp.stack([0.25 * sw, (m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw], -1)
    sx = _safe_sqrt(1.0 + m00 - m11 - m22) * 2.0  # 4x
    qx0 = jnp.stack([(m21 - m12) / sx, 0.25 * sx, (m01 + m10) / sx, (m02 + m20) / sx], -1)
    sy = _safe_sqrt(1.0 - m00 + m11 - m22) * 2.0  # 4y
    qy0 = jnp.stack([(m02 - m20) / sy, (m01 + m10) / sy, 0.25 * sy, (m12 + m21) / sy], -1)
    sz = _safe_sqrt(1.0 - m00 - m11 + m22) * 2.0  # 4z
    qz0 = jnp.stack([(m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz, 0.25 * sz], -1)

    cond_w = (tr > 0.0)[..., None]
    cond_x = ((m00 > m11) & (m00 > m22))[..., None]
    cond_y = (m11 > m22)[..., None]
    q = jnp.where(cond_w, qw0, jnp.where(cond_x, qx0, jnp.where(cond_y, qy0, qz0)))
    return normalize_quat(q)


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """6D rotation rep (Zhou et al.) -> rotation matrix via Gram-Schmidt.

    Parity with reference src/my_gsplat/transform.py:7-29.
    """
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.clip(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-12)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.clip(jnp.linalg.norm(b2, axis=-1, keepdims=True), 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> 6D rep (first two rows). Reference transform.py:32-47."""
    return m[..., :2, :].reshape(m.shape[:-2] + (6,))


def construct_pose(rotation: jnp.ndarray, translation: jnp.ndarray) -> jnp.ndarray:
    """Build (..., 4, 4) SE(3) from (..., 3, 3) R and (..., 3) t.

    Parity with reference src/my_gsplat/geometry.py:12-20.
    """
    batch = rotation.shape[:-2]
    top = jnp.concatenate([rotation, translation[..., None]], axis=-1)  # (...,3,4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], rotation.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def transform_points(matrix: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply SE(3) (4,4) to points (N,3) -> (N,3).

    Parity with reference src/my_gsplat/geometry.py:23-41 (addmm).
    """
    return jnp.matmul(points, matrix[:3, :3].T, precision=HIGHEST) + matrix[:3, 3]


def invert_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of (..., 4, 4) rigid transform.

    The reference uses torch.linalg.inv on c2w (src/my_gsplat/model.py:202), which
    is differentiable; the closed-form R^T / -R^T t is equivalent for rigid
    transforms and far cheaper on TPU. For *non*-orthonormal inputs (unnormalized
    quat never produces one here, since quat_to_rotmat normalizes) semantics could
    differ; the pose path always passes a rigid matrix.
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    new_t = -jnp.einsum("...ij,...j->...i", Rt, t, precision=HIGHEST)
    return construct_pose(Rt, new_t)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Exponential map se(3) -> SE(4,4). xi = (wx, wy, wz, vx, vy, vz).

    Rodrigues with small-angle series; used by the dense RGB-D odometry
    (tracking/odometry.py) — pure JAX, jit/vmap-safe.
    """
    w = xi[:3]
    v = xi[3:]
    th2 = jnp.sum(w * w)
    th = jnp.sqrt(th2 + 1e-24)
    small = th < 1e-6
    A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    B = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / (th2 + 1e-24))
    C = jnp.where(small, 1.0 / 6.0 - th2 / 120.0, (1.0 - A) / (th2 + 1e-24))
    W = jnp.array([
        [0.0, -w[2], w[1]],
        [w[2], 0.0, -w[0]],
        [-w[1], w[0], 0.0],
    ])
    W2 = W @ W
    R = jnp.eye(3) + A * W + B * W2
    V = jnp.eye(3) + B * W + C * W2
    return construct_pose(R, V @ v)
