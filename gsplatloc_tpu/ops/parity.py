"""On-chip numerical parity check: sub-tile vs full-tile fused tracking path.

Interpret mode accepts layouts Mosaic rejects and the CPU backend cannot see
compiled-lowering divergences (round 1: the sub-tile path passed every CPU
test at 5e-5 yet failed on the real chip with pose-grad rel errors up to
10.5x). This check runs BOTH kernel families on the current default device
and compares forward depth/alpha and pose (viewmat) gradients, so callers —
bench.py before trusting a sub-tile number, scripts/tpu_subtile_parity.py as
the session gate — share one definition of "parity".

Gradient gate is vs the GRADIENT SCALE, not per-element: on chip BOTH paths
carry ~1% noise on heavily-cancelling elements (the full-tile path is the
noisier one: its monomial frame spans 128 px vs the sub-tile's 16; measured
2026-08-17, element [1,2] full-tile 13.7% off CPU truth, sub-tile 3.5%).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# pass thresholds (VERDICT round-1 bar: fwd < 5e-3, grad rel < 3e-2)
FWD_TOL = 5e-3
LOSS_REL_TOL = 1e-3
GRAD_REL_TOL = 3e-2


def subtile_parity(height: int = 128, width: int = 256,
                   fwd_tol: float = FWD_TOL) -> dict:
    """Build a synthetic box-room scene and compare the sub-tile pipeline
    (ops/fused_subtile.py) against the full-tile fused path
    (ops/fused_tracking.py) at quick-compile scale on the CURRENT device.

    Returns a dict with d_err / a_err (max abs fwd diffs), loss_rel,
    grad_rel (max grad diff vs grad scale), the two (3, 4) viewmat grads,
    and ok (all thresholds met).
    """
    from ..data.synthetic import box_room_frame
    from ..models.gaussians import scene_from_point_cloud
    from . import camera
    from .fused_subtile import (
        build_subtile_slot_buffer, render_tracking_depth_subtile,
    )
    from .fused_tracking import build_slot_buffer, render_tracking_depth
    from .lie import invert_se3

    H, W = height, width
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
    # pixels beyond the QUICK-scale bar: distinguishes a systematic fwd
    # divergence (r1 class: every pixel off) from isolated near-threshold
    # alpha-gate flips (borderline splats straddling the full-tile path's
    # sigma>=0 vs the sub-tile path's sigma>=-SIG_EPS gate)
    d_n_over = int(jnp.sum(jnp.abs(d_f - d_s) > FWD_TOL))

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
    scale = max(float(np.abs(gf).max()), 1e-12)
    rel = np.abs(gf - gs) / scale
    loss_rel = abs(lf - ls) / max(abs(lf), 1e-12)
    grad_rel = float(rel.max())
    ok = (d_err < fwd_tol and a_err < fwd_tol
          and loss_rel < LOSS_REL_TOL and grad_rel < GRAD_REL_TOL)
    return dict(
        d_err=d_err, a_err=a_err, d_n_over=d_n_over, loss_full=lf,
        loss_sub=ls, loss_rel=loss_rel, grad_rel=grad_rel, grad_full=gf,
        grad_sub=gs, rel=rel, ok=ok,
    )


def kcover_parity(height: int = 128, width: int = 256,
                  k_cover: int = 16) -> dict:
    """Same check for the K-cover render (ops/kcover.py) vs the full-tile
    fused path, at the selection pose (zero staleness — staleness is the
    tracking loop's select_motion_px gate's job). Grad tolerance is looser
    than the sub-tile check: the K-truncation drops sub-ALPHA_MIN tails
    the full walk keeps."""
    from ..data.synthetic import box_room_frame
    from ..models.gaussians import scene_from_point_cloud
    from . import camera
    from .fused_tracking import (
        build_slot_buffer, cam_vector, render_tracking_depth,
    )
    from .kcover import (
        build_kcover_buffer, build_kcover_slot_buffer,
        render_tracking_depth_kcover,
    )
    from .lie import invert_se3

    H, W = height, width
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
    # THE product rebuild path (unpadded + budgeted slot buffer +
    # in-kernel-projection select — what optimize_pose ships, round 5)
    slot_s, meta_s, _ovf = build_kcover_slot_buffer(scene, vm, K, W, H,
                                                    1e-2, 1e10)
    n_ty = -(-H // 16)
    n_tx = -(-W // 128)
    kbuf = build_kcover_buffer(slot_s, meta_s, cam_vector(vm, K, W, H),
                               n_ty, n_tx, 1e-2, 1e10, k_cover=k_cover)
    d_k, a_k = render_tracking_depth_kcover(vm, K, W, H, kbuf)

    d_err = float(jnp.max(jnp.abs(d_f - d_k)))
    a_err = float(jnp.max(jnp.abs(a_f - a_k)))
    target = jax.lax.stop_gradient(d_f) * 1.02

    def loss_fused(v):
        d, a = render_tracking_depth(v, K, W, H, slot_f, meta_f)
        return jnp.mean((d - target) ** 2) + 0.1 * jnp.mean(a)

    def loss_k(v):
        d, a = render_tracking_depth_kcover(v, K, W, H, kbuf)
        return jnp.mean((d - target) ** 2) + 0.1 * jnp.mean(a)

    lf, gf = jax.value_and_grad(loss_fused)(vm)
    lk, gk = jax.value_and_grad(loss_k)(vm)
    lf, lk = float(lf), float(lk)
    gf = np.asarray(gf)[:3, :]
    gk = np.asarray(gk)[:3, :]
    scale = max(float(np.abs(gf).max()), 1e-12)
    rel = np.abs(gf - gk) / scale
    loss_rel = abs(lf - lk) / max(abs(lf), 1e-12)
    grad_rel = float(rel.max())
    ok = (d_err < 2e-2 and a_err < 1e-2
          and loss_rel < 1e-2 and grad_rel < 5e-2)
    return dict(
        d_err=d_err, a_err=a_err, loss_full=lf, loss_sub=lk,
        loss_rel=loss_rel, grad_rel=grad_rel, grad_full=gf, grad_sub=gk,
        rel=rel, ok=ok,
    )


def general_parity(height: int = 64, width: int = 128, n: int = 300) -> dict:
    """On-chip parity of the GENERAL rasterizer (ops/rasterize_pallas.py,
    the gsplat-API path: RGB+ED mode, anisotropic quats/scales, grads to
    viewmat AND every Gaussian param) against the dense XLA oracle
    (ops/rasterize_ref.py) on the CURRENT device at quick-compile scale.

    The tracking family has kcover_parity/subtile_parity; this closes the
    same round-1 lesson (CPU-interpret PASS proves nothing on chip) for
    the general path, which was previously CPU-tested only (VERDICT r3
    next #7). Run by scripts/tpu_parity_full.py in every TPU session.
    """
    from ..data.synthetic import random_gaussian_cloud
    from ..models.gaussians import scene_from_point_cloud
    from . import camera
    from .rasterize import rasterize

    H, W = height, width
    rng = np.random.default_rng(11)
    pts, rgb = random_gaussian_cloud(rng, n)
    scene = scene_from_point_cloud(jnp.asarray(pts), jnp.asarray(rgb))
    # anisotropic scales + random quats: the general path's full surface
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    scene = scene._replace(
        scales=jnp.asarray(rng.uniform(0.02, 0.09, (n, 3)).astype(np.float32)),
        quats=jnp.asarray(q),
        opacities=jnp.full((n,), 0.6, jnp.float32),
    )
    K = camera.intrinsics_matrix(0.5 * W, 0.5 * W, W / 2 - 0.5, H / 2 - 0.5)
    vm = jnp.eye(4)

    def render(means, quats, scales, opas, sh, v, backend):
        return rasterize(means, quats, scales, opas, sh, v, K, W, H,
                         sh_degree=1, render_mode="RGB+ED", backend=backend)

    args = (scene.means, scene.quats, scene.scales, scene.opacities,
            scene.sh_coeffs, vm)
    r_o, a_o = render(*args, "reference")
    r_p, a_p = render(*args, "pallas")
    fwd_err = float(jnp.max(jnp.abs(r_o - r_p)))
    a_err = float(jnp.max(jnp.abs(a_o - a_p)))

    def loss(means, quats, scales, opas, sh, v, backend):
        r, a = render(means, quats, scales, opas, sh, v, backend)
        return jnp.mean(r ** 2) + 0.05 * jnp.mean(a)

    g_o = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(*args, "reference")
    g_p = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(*args, "pallas")
    names = ["means", "quats", "scales", "opacities", "sh", "viewmat"]
    rels = {}
    for o, p, name in zip(g_o, g_p, names):
        o, p = np.asarray(o), np.asarray(p)
        scale = max(float(np.abs(o).max()), 1e-12)
        rels[name] = float(np.abs(o - p).max() / scale)
    grad_rel = max(rels.values())
    ok = fwd_err < FWD_TOL and a_err < FWD_TOL and grad_rel < GRAD_REL_TOL
    return dict(fwd_err=fwd_err, a_err=a_err, grad_rels=rels,
                grad_rel=grad_rel, ok=ok)
