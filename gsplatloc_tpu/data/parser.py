"""Frame-pair assembler: world transform + PCA normalization + depth-GT
re-rendering, producing AlignData for the tracking loop.

Behavioral parity with reference Parser (src/data/dataset.py:333-383) and
compute_depth_gt (src/my_gsplat/geometry.py:69-135):

  parser[i] -> (tar = frame i, src = frame i+1):
    * BOTH camera-frame clouds go to world with TAR's pose (:349-350),
    * PCA principal-axis normalization from tar's cloud, applied to both
      clouds and both poses (normalize.py:108-124),
    * the pair's GT depth is NOT the raw sensor depth: the src cloud is
      re-rendered as throwaway opacity-1 Gaussians from the (normalized) tar
      viewpoint in ED mode, divided by the pca factor (:362-372) — so
      rendered and target depth share representation artifacts.

TPU-native: the whole per-pair pipeline (back-projection, transforms, PCA,
kNN scale init, ED render) is one jitted device computation; only image
loading stays on host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.gaussians import scene_from_point_cloud
from ..ops.camera import depth_to_points
from ..ops.lie import invert_se3, transform_points
from ..ops.pca import normalize_pair
from ..ops.rasterize import rasterize
from .base import AlignData
from .datasets import get_dataset


@partial(jax.jit, static_argnames=("height", "width", "grid_shape", "backend"))
def render_depth_gt(
    points: jnp.ndarray,  # (N, 3) world
    rgbs: jnp.ndarray,  # (N, 3)
    K: jnp.ndarray,
    c2w: jnp.ndarray,
    height: int,
    width: int,
    grid_shape=None,  # static (H, W) if grid-ordered
    backend: str = "pallas",
    knn_sq_dists: jnp.ndarray | None = None,  # precomputed (N, k)
) -> jnp.ndarray:
    """compute_depth_gt parity: throwaway scene (opacity 1, kNN scales with
    the reference's squared-distance quirk, identity quats, SH deg 1) rendered
    in ED mode, no grad. Returns (H, W) depth.

    backend "fused"/"subtile" render through the tracking kernel family —
    the reference uses ONE rasterizer for both the depth-GT re-render and
    the tracking render (gsplat, dataset.py:362-372 + model.py:195-213), so
    matching kernels here cancels representation artifacts in the loss;
    these also get exact big-splat binning (ops/binning.py big_budget).

    knn_sq_dists: precomputed scale-init kNN (e.g. the exact native KdTree
    on the raw camera-frame cloud — kNN distances are rigid-invariant, so
    host-side precomputation composes with the jitted world/PCA transforms
    here). Default None falls back to the on-device grid-window kNN, which
    INFLATES scales at grazing depth edges (measured: 0.15% of splats > 2x,
    max 3.5e4x — the worst become image-wide opaque blobs through the
    big-splat exact-binning path and flatten the tracking loss surface;
    the reference always uses exact small_gicp kNN)."""
    scene = scene_from_point_cloud(points, rgbs, grid_shape=grid_shape,
                                   knn_sq_dists=knn_sq_dists)
    if backend in ("fused", "subtile"):
        if backend == "fused":
            from ..ops.fused_tracking import (
                build_slot_buffer as build_fn,
                render_tracking_depth as render_fn,
            )
        else:
            from ..ops.fused_subtile import (
                build_subtile_slot_buffer as build_fn,
                render_tracking_depth_subtile as render_fn,
            )
        vm = invert_se3(c2w)
        slot, meta, _ = build_fn(scene, vm, K, width, height, 1e-2, 1e10)
        depth, _alpha = render_fn(vm, K, width, height, slot, meta)
        return jax.lax.stop_gradient(depth)
    render, _ = rasterize(
        scene.means, scene.quats, scene.scales, scene.opacities, scene.sh_coeffs,
        invert_se3(c2w), K, width, height,
        sh_degree=1, render_mode="ED", backend=backend,
    )
    return jax.lax.stop_gradient(render[..., 0])


@partial(jax.jit, static_argnames=("height", "width", "normalize", "backend"))
def _assemble_pair(
    tar_rgb, tar_depth, tar_c2w, src_rgb, src_depth, src_c2w, K,
    height: int, width: int, normalize: bool = True, backend: str = "pallas",
    src_knn_sq_dists=None,
):
    tar_points = transform_points(tar_c2w, depth_to_points(tar_depth, K))
    src_points = transform_points(tar_c2w, depth_to_points(src_depth, K))
    tar_colors = tar_rgb.reshape(-1, 3) / 255.0

    pca_factor = jnp.float32(1.0)
    if normalize:
        tar_points, src_points, tar_c2w, src_c2w, pca_factor = normalize_pair(
            tar_points, src_points, tar_c2w, src_c2w
        )
        src_colors = src_rgb.reshape(-1, 3) / 255.0
        depth_gt = (
            render_depth_gt(
                src_points, src_colors, K, tar_c2w, height, width,
                grid_shape=(height, width), backend=backend,
                knn_sq_dists=src_knn_sq_dists,
            )
            / pca_factor
        )
    else:
        depth_gt = src_depth

    return dict(
        colors=tar_colors,
        pixels=src_rgb / 255.0,
        tar_points=tar_points,
        src_points=src_points,
        src_depth=depth_gt,
        tar_c2w=tar_c2w,
        src_c2w=src_c2w,
        pca_factor=pca_factor,
    )


class Parser:
    """parser[i] -> AlignData for the (i, i+1) frame pair (reference :333-383)."""

    def __init__(
        self,
        data_set: str = "Replica",
        name: str = "room0",
        normalize: bool = True,
        backend: str = "pallas",
        knn_method: str = "auto",
        **dataset_kwargs,
    ):
        self._data = get_dataset(data_set, name, **dataset_kwargs)
        self.K = jnp.asarray(self._data.K)
        self.normalize = normalize
        self.backend = backend
        # "exact": precompute the depth-GT scene's scale-init kNN with the
        # native KdTree on the raw src cloud (host; rigid-invariant, so it
        # composes with the jitted world/PCA transforms). See
        # render_depth_gt — the grid-window fallback inflates scales at
        # grazing depth edges into image-wide opaque blobs.
        self.knn_method = knn_method
        self._knn_cache = {}  # frame index -> (N, 5) sq dists (last 3)
        self._frame_cache = {}  # frame index -> RGBDFrame (last 3)

    def frame(self, index: int):
        """self._data[index] with a 3-frame decode cache: sequential
        tracking reads each frame twice (as src of pair i-1, then tar of
        pair i) and the prefetch pipeline reads one pair ahead — caching
        3 frames makes every image decode exactly once."""
        if index not in self._frame_cache:
            self._frame_cache[index] = self._data[index]
            for k in sorted(self._frame_cache)[:-3]:
                del self._frame_cache[k]
        return self._frame_cache[index]

    def knn_for_frame(self, index: int):
        """Exact scale-init kNN sq-dists of frame `index`'s raw cloud
        (None unless knn_method == 'exact'). Cached for three frames: pair
        i's tar is pair i-1's src, so sequential tracking computes each
        frame once (3 not 2 so the prefetch pipeline's pair i+1 never
        evicts pair i's frames mid-flight).

        The back-projection runs on HOST (numpy) by design: this method is
        called from the prefetch worker while the device is busy with the
        previous pair's optimization — a device back-projection would
        enqueue behind that multi-second dispatch and serialize the
        pipeline. kNN distances are rigid-invariant, so the raw
        camera-frame cloud is the right input either way."""
        if self.knn_method != "exact":
            return None
        if index not in self._knn_cache:
            import numpy as np

            from ..ops.knn import exact_knn_sq_dists

            frame = self.frame(index)
            depth = np.asarray(frame.depth, np.float32)
            K = np.asarray(self.K, np.float32)
            h, w = depth.shape
            u = np.arange(w, dtype=np.float32)[None, :]
            v = np.arange(h, dtype=np.float32)[:, None]
            x = (u - K[0, 2]) / K[0, 0] * depth
            y = (v - K[1, 2]) / K[1, 1] * depth
            cam_pts = np.stack([x, y, depth], axis=-1).reshape(-1, 3)
            self._knn_cache[index] = exact_knn_sq_dists(cam_pts, 5)
            for k in sorted(self._knn_cache)[:-3]:
                del self._knn_cache[k]
        return self._knn_cache[index]

    def __len__(self):
        return len(self._data) - 1

    @property
    def dataset(self):
        return self._data

    def __getitem__(self, index: int) -> AlignData:
        assert index < len(self._data) - 1
        tar = self.frame(index)
        src = self.frame(index + 1)
        h, w = src.hw
        src_knn = self.knn_for_frame(index + 1)
        out = _assemble_pair(
            jnp.asarray(tar.rgb, jnp.float32),
            jnp.asarray(tar.depth, jnp.float32),
            jnp.asarray(tar.c2w, jnp.float32),
            jnp.asarray(src.rgb, jnp.float32),
            jnp.asarray(src.depth, jnp.float32),
            jnp.asarray(src.c2w, jnp.float32),
            self.K,
            height=h, width=w, normalize=self.normalize, backend=self.backend,
            src_knn_sq_dists=src_knn,
        )
        return AlignData(tar_nums=out["tar_points"].shape[0], **out)
