"""Bisect the on-chip sub-tile forward divergence (parity FAIL 2026-08-18).

Phases under test, each isolated on the REAL chip (interpret mode passes):
  A. project8: Pallas vs XLA form (same slot buffer).
  B. fwd kernel: _subtile_fwd_impl from the SAME (XLA) proj8 vs the
     full-tile fused render — per-sub-tile max-diff map to localize.
  C. scan variants: the fwd kernel's _scan_mul under the env knobs.

Run: python scripts/tpu_subtile_bisect.py  (ONE TPU process at a time).
"""

import numpy as np
import jax
import jax.numpy as jnp

from gsplatloc_tpu.data.synthetic import box_room_frame
from gsplatloc_tpu.models.gaussians import scene_from_point_cloud
from gsplatloc_tpu.ops import camera
from gsplatloc_tpu.ops.fused_subtile import (
    SUB_W, build_subtile_slot_buffer, _project8,
    _project8_pallas, _subtile_fwd_impl, unscramble_image,
)
from gsplatloc_tpu.ops.binning import TILE_H, TILE_W
from gsplatloc_tpu.ops.fused_tracking import (
    build_slot_buffer, cam_vector, render_tracking_depth,
)
from gsplatloc_tpu.ops.lie import invert_se3


def main():
    H, W = 128, 256
    K_np = np.array([[0.5 * W, 0, W / 2 - 0.5], [0, 0.5 * W, H / 2 - 0.5],
                     [0, 0, 1]], np.float32)
    rgb, depth = box_room_frame(np.eye(4), K_np, H, W)
    K = jnp.asarray(K_np)
    pts = camera.depth_to_points(jnp.asarray(depth), K)
    scene = scene_from_point_cloud(pts, jnp.asarray(rgb.reshape(-1, 3)),
                                   grid_shape=(H, W))
    jax.block_until_ready(scene)
    vm = invert_se3(jnp.eye(4))
    cam = cam_vector(vm, K, W, H)

    slot_s, meta_s, _ = build_subtile_slot_buffer(scene, vm, K, W, H,
                                                  1e-2, 1e10)
    n_ty = -(-H // TILE_H)
    n_tx = -(-W // TILE_W)

    # A. projection phase
    p8_x = jax.jit(lambda c: _project8(slot_s, c, 1e-2, 1e10))(cam)
    p8_p = jax.jit(lambda c: _project8_pallas(slot_s, c, 1e-2, 1e10))(cam)
    p8_x, p8_p = np.asarray(p8_x), np.asarray(p8_p)
    print(f"A project8 Pallas vs XLA: max|diff| per row = "
          f"{np.abs(p8_x - p8_p).max(axis=1)}", flush=True)

    # B. fwd kernel from the XLA proj8 (removes phase A from the equation)
    out_x, cd = jax.jit(
        lambda p: _subtile_fwd_impl(p, meta_s, n_ty, n_tx)
    )(jnp.asarray(p8_x))
    d_sub = np.asarray(unscramble_image(out_x[0], n_ty, n_tx))[:H, :W]
    a_sub = np.asarray(unscramble_image(out_x[1], n_ty, n_tx))[:H, :W]

    slot_f, meta_f, _ = build_slot_buffer(scene, vm, K, W, H, 1e-2, 1e10)
    d_f, a_f = render_tracking_depth(vm, K, W, H, slot_f, meta_f)
    # full-tile render returns normalized depth; reconstruct acc = d*alpha
    d_f, a_f = np.asarray(d_f), np.asarray(a_f)
    dacc_f = d_f * np.maximum(a_f, 1e-10)

    dd = np.abs(dacc_f - d_sub)
    da = np.abs(a_f - a_sub)
    print(f"B fwd(depth_acc) max|diff| {dd.max():.3e}  "
          f"alpha max|diff| {da.max():.3e}  "
          f"frac>1e-3: d {np.mean(dd > 1e-3):.4f} a {np.mean(da > 1e-3):.4f}",
          flush=True)
    # per-sub-tile max-diff map (n_ty, n_tx*N_SUB)
    sub_map = dd.reshape(n_ty, TILE_H, -1, SUB_W).max(axis=(1, 3))
    np.set_printoptions(precision=2, suppress=True, linewidth=200)
    print(f"B per-sub-tile max|d_acc diff| map "
          f"({sub_map.shape[0]}x{sub_map.shape[1]}):", flush=True)
    print(sub_map, flush=True)
    cd = np.asarray(cd).reshape(n_ty, -1)
    print(f"B chunks walked per sub-tile:\n{cd}", flush=True)

    # C. same fwd kernel, Pallas proj8 (isolates A->B interaction)
    out_p, _ = jax.jit(
        lambda p: _subtile_fwd_impl(p, meta_s, n_ty, n_tx)
    )(jnp.asarray(p8_p))
    d_subp = np.asarray(unscramble_image(out_p[0], n_ty, n_tx))[:H, :W]
    print(f"C fwd from Pallas proj8 vs XLA proj8: "
          f"max|diff| {np.abs(d_subp - d_sub).max():.3e}", flush=True)


if __name__ == "__main__":
    main()
