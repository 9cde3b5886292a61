"""On-device k-nearest-neighbor distances + Gaussian scale init (pure JAX).

The reference computes kNN with the small_gicp C++ KdTree
(src/my_gsplat/utils.py:16-22) to initialize isotropic Gaussian scales
(src/my_gsplat/geometry.py:44-66). TPU-native replacements:

* `grid_knn_sq_dists` — exploits that GsplatLoc's clouds are dense
  back-projections of a depth image: a point's 3D nearest neighbors lie in a
  small pixel window around it. O(N * window^2), fully vectorized, no
  host round-trip. This is the hot path (once per frame pair at ~816k points).
* `brute_knn_sq_dists` — exact blocked O(N^2) pairwise distances on the MXU
  for generic (non-grid) clouds up to ~100k points.
* The C++ KdTree in gsplatloc_tpu/native provides exact kNN for large
  unstructured clouds (small_gicp parity path).

IMPORTANT semantics quirk preserved from the reference: small_gicp's
batch_knn_search returns SQUARED distances, and the reference's
init_gs_scales then squares them again (geometry.py:60-62:
sqrt(mean(knn(...)** 2))). So the effective scale is the RMS of squared
neighbor distances, not of distances. We reproduce this exactly (it is the
behavior behind the published ATE numbers); `squared_quirk=False` gives the
textbook version.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def grid_knn_sq_dists(
    point_grid: jnp.ndarray, k: int = 5, window: int = 2
) -> jnp.ndarray:
    """Approximate kNN squared distances for a depth-grid point cloud.

    Args:
      point_grid: (H, W, 3) back-projected point image (grid order).
      k: number of neighbors INCLUDING self (self distance is 0), matching
         small_gicp batch_knn_search(k) semantics.
      window: half-width of the candidate pixel window (candidates =
         (2*window+1)^2 - 1 plus self).

    Returns:
      (H*W, k) squared distances, ascending (column 0 is the self-distance 0).
    """
    H, W, _ = point_grid.shape
    shifts = [
        (dy, dx)
        for dy in range(-window, window + 1)
        for dx in range(-window, window + 1)
        if not (dy == 0 and dx == 0)
    ]
    big = jnp.float32(3.0e38)
    cands = []
    for dy, dx in shifts:
        shifted = jnp.full_like(point_grid, big)
        ys = slice(max(dy, 0), H + min(dy, 0))
        yd = slice(max(-dy, 0), H + min(-dy, 0))
        xs = slice(max(dx, 0), W + min(dx, 0))
        xd = slice(max(-dx, 0), W + min(-dx, 0))
        shifted = shifted.at[yd, xd].set(point_grid[ys, xs])
        d2 = jnp.sum((shifted - point_grid) ** 2, axis=-1)
        cands.append(jnp.minimum(d2, big))  # inf-pad -> huge finite
    d2_all = jnp.stack(cands, axis=-1)  # (H, W, C)
    # k-1 smallest neighbor distances (self contributes the k-th, which is 0).
    neg_top, _ = jax.lax.top_k(-d2_all, k - 1)  # (H, W, k-1) ascending dist
    knn_d2 = -neg_top
    zeros = jnp.zeros(knn_d2.shape[:-1] + (1,), knn_d2.dtype)
    return jnp.concatenate([zeros, knn_d2], axis=-1).reshape(H * W, k)


@functools.partial(jax.jit, static_argnames=("k", "block"))
def brute_knn_sq_dists(points: jnp.ndarray, k: int = 5, block: int = 256) -> jnp.ndarray:
    """Exact kNN squared distances by blocked pairwise differences.

    points: (N, 3); returns (N, k) ascending squared distances including self.
    Memory O(block * N). Uses explicit differences rather than the
    |a|^2+|b|^2-2ab matmul trick: for dense depth clouds neighbor distances
    are ~1e-3 of the coordinate magnitude and the matmul form loses them to
    fp32 cancellation.
    """
    n = points.shape[0]
    n_pad = -(-n // block) * block
    pts_pad = jnp.pad(points, ((0, n_pad - n), (0, 0)), constant_values=3e18)

    def body(i, out):
        rows = jax.lax.dynamic_slice_in_dim(pts_pad, i * block, block)  # (B,3)
        diff = rows[:, None, :] - points[None, :, :]  # (B, N, 3)
        d2 = jnp.sum(diff * diff, axis=-1)
        neg_top, _ = jax.lax.top_k(-d2, k)  # (B, k) ascending distance
        return jax.lax.dynamic_update_slice_in_dim(out, -neg_top, i * block, axis=0)

    out = jnp.zeros((n_pad, k), points.dtype)
    out = jax.lax.fori_loop(0, n_pad // block, body, out)
    return out[:n]


def exact_knn_sq_dists(points, k: int = 5, num_threads: int = 8):
    """EXACT kNN squared distances via the native C++ KdTree (host
    round-trip; small_gicp batch_knn_search parity,
    reference src/my_gsplat/utils.py:16-22). Use to quantify / replace the
    grid-window approximation at scale: the KdTree build + query at 816k
    points runs in ~1 s on CPU threads while the cloud is still on host
    (the Parser hands out host-backed arrays before device transfer).

    Returns (N, k) ascending squared distances, column 0 the self-distance.
    """
    import numpy as np

    from ..native import KdTree

    pts = np.ascontiguousarray(np.asarray(points, np.float64))
    tree = KdTree(pts, num_threads=num_threads)
    _idx, d2 = tree.batch_knn_search(pts, k, num_threads=num_threads)
    return jnp.asarray(d2, jnp.float32)


def init_gs_scales_from_sq_dists(
    knn_sq_dists: jnp.ndarray, eps: float = 1e-24, squared_quirk: bool = True,
    clamp_quantile: float | None = 0.99, clamp_ratio: float = 64.0
) -> jnp.ndarray:
    """Isotropic Gaussian scales from kNN squared distances.

    Parity with reference init_gs_scales (src/my_gsplat/geometry.py:44-66):
    scale_i = sqrt(mean_j(d2_ij^2) + eps) over neighbors j = 1..k-1 (drops the
    self column), replicated to (N, 3). Note d2 is ALREADY squared (small_gicp
    convention) and the reference squares again — preserved under
    `squared_quirk=True` (default). The default robust clamp below is a
    DELIBERATE deviation from bit-level parity whenever a scene contains
    >= clamp_ratio-fold tail outliers (docs/PARITY.md "Scale-init robust
    clamp"); `count_clamped_scales` makes an engaged clamp observable.

    Robust clamp (TPU build extension): scales are capped at
    quantile(scale, clamp_quantile) * clamp_ratio. Rationale: a depth
    frame can contain ISOLATED occlusion fragments — e.g. office2 fixture
    frame 13 holds exactly 3 corner pixels of a mostly-out-of-frame
    occluder whose 5-NN sit 0.53 m away (130x the p99.99 distance); each
    became an opacity-1 splat with a ~140 px footprint that painted the
    depth-GT re-render's background ~1.2 m closer, making the pair's
    target unfittable (loss 0.52 at the TRUE pose) and diverging the
    tracker 42 cm. The reference carries the same failure mode: its
    std-ratio outlier REMOVAL (src/my_gsplat/utils.py:25-50) is commented
    out at the one call site (src/data/Image.py:32). Clamping (not
    removing) keeps shapes static for XLA; the threshold only engages on
    >=clamp_ratio-fold outliers past the q-th percentile, so healthy
    scenes are bit-identical (tests/test_geometry_ops.py). clamp_ratio
    is in the (squared-quirk) scale domain: 64 = an 8x cap on raw kNN
    distance. clamp_quantile=None disables.
    """
    neigh = knn_sq_dists[:, 1:]
    if squared_quirk:
        m = jnp.mean(neigh**2, axis=-1)
    else:
        m = jnp.mean(neigh, axis=-1)
    scale = jnp.sqrt(m + eps)
    if clamp_quantile is not None:
        cap = jnp.quantile(scale, clamp_quantile) * clamp_ratio
        scale = jnp.minimum(scale, cap)
    return jnp.repeat(scale[:, None], 3, axis=1)


def count_clamped_scales(
    knn_sq_dists: jnp.ndarray, eps: float = 1e-24,
    squared_quirk: bool = True, clamp_quantile: float = 0.99,
    clamp_ratio: float = 64.0,
) -> jnp.ndarray:
    """Number of splats whose scale the robust clamp in
    `init_gs_scales_from_sq_dists` would cap (int32 scalar). Observability
    hook (ADVICE r4): the clamp silently changes scales on >=64x tail
    outliers, so callers (tracking/runner.py) log this count per scene —
    0 on healthy scenes, where the clamp is bit-inert."""
    neigh = knn_sq_dists[:, 1:]
    m = jnp.mean(neigh**2, axis=-1) if squared_quirk else jnp.mean(
        neigh, axis=-1)
    scale = jnp.sqrt(m + eps)
    cap = jnp.quantile(scale, clamp_quantile) * clamp_ratio
    return jnp.sum(scale > cap).astype(jnp.int32)


def init_gs_scales_grid(
    point_grid: jnp.ndarray, k: int = 5, window: int = 2, eps: float = 1e-24
) -> jnp.ndarray:
    """Scale init for a depth-grid cloud: grid kNN + reference scale formula."""
    return init_gs_scales_from_sq_dists(grid_knn_sq_dists(point_grid, k, window), eps)


def remove_outliers(
    points: jnp.ndarray,
    knn_sq_dists: jnp.ndarray | None = None,
    k: int = 10,
    std_ratio: float = 10.0,
):
    """Statistical outlier mask (reference src/my_gsplat/utils.py:25-50):
    mean kNN distance per point; drop points beyond mean + std_ratio * std.

    Returns (inlier_mask (N,) bool, threshold). Caller applies the mask (jit
    needs static shapes; use jnp.where/compaction outside jit, matching the
    reference's eager masking).
    """
    if knn_sq_dists is None:
        knn_sq_dists = brute_knn_sq_dists(points, k)
    # reference quirk preserved: mean of squared dists, then sqrt
    dist_avg = jnp.sqrt(jnp.mean(knn_sq_dists[:, 1:] ** 2, axis=-1))
    mean = jnp.mean(dist_avg)
    std = jnp.std(dist_avg, ddof=1)  # torch.std is sample std (N-1)
    threshold = mean + std_ratio * std
    return dist_avg < threshold, threshold
