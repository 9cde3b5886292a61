"""Frozen Gaussian scene construction from an RGB-D point cloud.

Parity with reference GSModel init (src/my_gsplat/model.py:136-175) and
compute_depth_gt's throwaway scene (src/my_gsplat/geometry.py:69-135):
means = points, opacity = sigmoid(logit(init_opa)) (== 1.0 for init_opa=1),
isotropic scales from kNN distances (with the reference's squared-distance
quirk, see ops/knn.py), identity quaternions, SH degree 1 with DC = rgb_to_sh
and zero higher bands. The scene is FROZEN — only the camera pose is optimized.
"""

from __future__ import annotations

from typing import NamedTuple


import jax.numpy as jnp

from ..ops.knn import (
    brute_knn_sq_dists,
    grid_knn_sq_dists,
    init_gs_scales_from_sq_dists,
)
from ..ops.sh import rgb_to_sh


class GaussianScene(NamedTuple):
    """Frozen splat scene (pytree of arrays, jit-friendly)."""

    means: jnp.ndarray  # (N, 3)
    quats: jnp.ndarray  # (N, 4) wxyz
    scales: jnp.ndarray  # (N, 3)
    opacities: jnp.ndarray  # (N,)
    sh_coeffs: jnp.ndarray  # (N, (deg+1)^2, 3)

    @property
    def num_gaussians(self) -> int:
        return self.means.shape[0]


def _logit_sigmoid(x: float) -> float:
    """torch.sigmoid(torch.logit(x)): identity on (0,1), exact 1.0 at 1.0."""
    return float(x)


def scene_from_point_cloud(
    points: jnp.ndarray,  # (N, 3)
    rgbs: jnp.ndarray,  # (N, 3) in [0, 1]
    *,
    knn_sq_dists: jnp.ndarray | None = None,  # (N, k) precomputed
    grid_shape: tuple[int, int] | None = None,  # (H, W) if grid-ordered cloud
    sh_degree: int = 1,
    init_opa: float = 1.0,
    knn_k: int = 5,
    knn_window: int = 2,
    knn_method: str = "auto",
) -> GaussianScene:
    """Build the frozen scene. If the cloud is a depth-image grid, pass
    grid_shape so scale init uses the O(N) windowed kNN; otherwise falls back
    to exact blocked brute force (fine <= ~100k points) or accepts
    precomputed kNN squared distances (e.g. from the native C++ KdTree).

    knn_method: "auto" (grid-window when grid_shape is given, else brute),
    "grid", "brute", or "exact" (native C++ KdTree, host round-trip —
    small_gicp parity; scripts/knn_accuracy.py quantifies grid vs exact).
    """
    n = points.shape[0]
    if knn_sq_dists is None:
        if knn_method == "exact":
            from ..ops.knn import exact_knn_sq_dists

            knn_sq_dists = exact_knn_sq_dists(points, knn_k)
        elif grid_shape is not None and knn_method in ("auto", "grid"):
            h, w = grid_shape
            knn_sq_dists = grid_knn_sq_dists(points.reshape(h, w, 3), knn_k, knn_window)
        else:
            knn_sq_dists = brute_knn_sq_dists(points, knn_k)
    scales = init_gs_scales_from_sq_dists(knn_sq_dists)

    quats = jnp.zeros((n, 4), points.dtype).at[:, 0].set(1.0)
    opacities = jnp.full((n,), _logit_sigmoid(init_opa), points.dtype)

    k_sh = (sh_degree + 1) ** 2
    sh = jnp.zeros((n, k_sh, 3), points.dtype)
    sh = sh.at[:, 0, :].set(rgb_to_sh(rgbs))
    return GaussianScene(
        means=points, quats=quats, scales=scales, opacities=opacities, sh_coeffs=sh
    )
