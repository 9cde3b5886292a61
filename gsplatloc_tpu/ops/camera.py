"""Camera / depth-image geometry (pure JAX).

Replaces the reference's kornia usage (depth_to_3d_v2 at
src/my_gsplat/geometry.py:138-161, depth_to_normal at :164-197).
"""

from __future__ import annotations

import jax.numpy as jnp


def intrinsics_matrix(fx: float, fy: float, cx: float, cy: float) -> jnp.ndarray:
    """3x3 K from focal lengths / principal point (reference src/data/utils.py:28-37)."""
    return jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], jnp.float32)


def depth_to_points(depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Back-project an (H, W) depth map to an (H*W, 3) camera-frame point cloud.

    Uses the integer pixel grid (u, v in 0..W-1/0..H-1) with NO half-pixel
    offset, matching kornia.geometry.depth_to_3d_v2 as called by the reference
    (src/my_gsplat/geometry.py:158). Note the rasterizer itself uses half-pixel
    centers; that asymmetry is present in the reference and kept here.
    """
    H, W = depth.shape
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    u = jnp.arange(W, dtype=depth.dtype)[None, :]  # (1, W)
    v = jnp.arange(H, dtype=depth.dtype)[:, None]  # (H, 1)
    x = (u - cx) / fx * depth
    y = (v - cy) / fy * depth
    return jnp.stack([x, y, depth], axis=-1).reshape(-1, 3)


def points_to_depth_grid(points: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Reshape an (H*W, 3) grid-ordered cloud back to its (H, W, 3) image layout."""
    return points.reshape(H, W, 3)


def depth_to_normal(depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """(H, W) depth -> (H, W, 3) unit normal map.

    Cross product of central differences of the back-projected point image with
    replicate padding, matching reference src/my_gsplat/geometry.py:164-197
    (dx = P[x+1]-P[x-1] along width, dy along height, n = dx x dy, L2-normalized).
    """
    H, W = depth.shape
    pts = depth_to_points(depth, K).reshape(H, W, 3)
    padded = jnp.pad(pts, ((1, 1), (1, 1), (0, 0)), mode="edge")
    dx = padded[1:-1, 2:, :] - padded[1:-1, :-2, :]
    dy = padded[2:, 1:-1, :] - padded[:-2, 1:-1, :]
    n = jnp.cross(dx, dy)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    # F.normalize semantics: divide by max(norm, eps)
    return n / jnp.maximum(norm, 1e-12)
