"""Real-TPU parity check for the phase-split sub-tile path.

Compares forward depth/alpha and pose (viewmat) gradients of the sub-tile
pipeline (ops/fused_subtile.py) against the full-tile fused path at a small
scale (quick compile). Interpret mode accepts layouts Mosaic rejects, so
this must run on the real chip before trusting bench numbers.

Gradient gate is vs the GRADIENT SCALE, not per-element: on CPU (f32, same
math) the two paths agree to 5e-5 relative, but on the real chip BOTH carry
~1% noise on heavily-cancelling elements — and the full-tile path is the
noisier one (its monomial frame spans 128 px vs the sub-tile's 16, measured
2026-08-17: element [1,2] full-tile 13.7% off CPU truth, sub-tile 3.5%).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from gsplatloc_tpu.data.synthetic import box_room_frame
from gsplatloc_tpu.models.gaussians import scene_from_point_cloud
from gsplatloc_tpu.ops import camera
from gsplatloc_tpu.ops.fused_subtile import (
    build_subtile_slot_buffer, render_tracking_depth_subtile,
)
from gsplatloc_tpu.ops.fused_tracking import (
    build_slot_buffer, render_tracking_depth,
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
    slot_f, meta_f, _ = build_slot_buffer(scene, vm, K, W, H, 1e-2, 1e10)
    d_f, a_f = render_tracking_depth(vm, K, W, H, slot_f, meta_f)
    slot_s, meta_s, _ = build_subtile_slot_buffer(scene, vm, K, W, H,
                                                  1e-2, 1e10)
    d_s, a_s = render_tracking_depth_subtile(vm, K, W, H, slot_s, meta_s)

    d_err = float(jnp.max(jnp.abs(d_f - d_s)))
    a_err = float(jnp.max(jnp.abs(a_f - a_s)))
    print(f"fwd: max|d| diff {d_err:.3e}  max|alpha| diff {a_err:.3e}",
          flush=True)

    target = jax.lax.stop_gradient(d_f) * 1.02  # offset so grads are nonzero

    def loss_fused(v):
        d, a = render_tracking_depth(v, K, W, H, slot_f, meta_f)
        return jnp.mean((d - target) ** 2) + 0.1 * jnp.mean(a)

    def loss_sub(v):
        d, a = render_tracking_depth_subtile(v, K, W, H, slot_s, meta_s)
        return jnp.mean((d - target) ** 2) + 0.1 * jnp.mean(a)

    lf, gf = jax.value_and_grad(loss_fused)(vm)
    ls, gs = jax.value_and_grad(loss_sub)(vm)
    lf, ls = float(lf), float(ls)
    gf = np.asarray(gf)[:3, :]
    gs = np.asarray(gs)[:3, :]
    scale = np.abs(gf).max()
    rel = np.abs(gf - gs) / scale
    print(f"loss: full {lf:.6e} sub {ls:.6e} "
          f"rel {abs(lf - ls) / abs(lf):.3e}", flush=True)
    np.set_printoptions(precision=6, suppress=False, linewidth=120)
    print(f"grad full:\n{gf}", flush=True)
    print(f"grad sub :\n{gs}", flush=True)
    print(f"rel diff :\n{rel}", flush=True)
    print(f"grad max diff vs scale: {rel.max():.3e}", flush=True)

    ok = (d_err < 5e-3 and a_err < 5e-3
          and abs(lf - ls) / max(abs(lf), 1e-12) < 1e-3
          and rel.max() < 3e-2)
    print("PARITY " + ("PASS" if ok else "FAIL"), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
# (debug entry appended below main)
