"""Fused pose-tracking rasterizer vs the general path: forward + pose grads.

The fused path projects in-kernel from a slot-ordered 3D buffer and emits
per-tile pose-gradient partials; with the slot buffer built at the SAME pose
(fresh binning) its output must match the general Pallas path exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from gsplatloc_tpu.data.synthetic import random_gaussian_cloud
from gsplatloc_tpu.models.gaussians import scene_from_point_cloud
from gsplatloc_tpu.ops import camera
from gsplatloc_tpu.ops.fused_tracking import (
    build_slot_buffer, cam_vector, compact_slot_buffer, fused_probe,
    render_tracking_depth,
)
from gsplatloc_tpu.ops.lie import invert_se3

from helpers import assert_close_except_gate_flips
from gsplatloc_tpu.ops.rasterize import rasterize


def _scene(n=400, seed=0, scales=0.05, opacity=1.0, mixed=False):
    rng = np.random.default_rng(seed)
    pts, rgb = random_gaussian_cloud(rng, n)
    scene = scene_from_point_cloud(jnp.asarray(pts), jnp.asarray(rgb))
    if mixed:
        # heterogeneous per-splat ISOTROPIC scales: the fused tracking
        # path's scene contract is identity quats + isotropic scales (the
        # GSModel contract; fused_tracking.py module docstring) — general
        # mixedtropic scenes are covered by the general backend's tests
        # (tests/test_rasterize_pallas.py)
        s = rng.uniform(0.02, 0.08, (n, 1)).astype(np.float32)
        scene = scene._replace(scales=jnp.asarray(np.repeat(s, 3, axis=1)))
    else:
        scene = scene._replace(scales=jnp.full_like(scene.scales, scales))
    return scene._replace(opacities=jnp.full_like(scene.opacities, opacity))


def _viewmat(angles=(0, 0, 0), t=(0, 0, 0)):
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = Rotation.from_euler("xyz", angles, degrees=True).as_matrix()
    c2w[:3, 3] = t
    return invert_se3(jnp.asarray(c2w))


@pytest.mark.parametrize("opacity", [1.0, 0.6])
@pytest.mark.parametrize("mixed", [False, True])
def test_fused_forward_matches_general(opacity, mixed):
    h, w = 48, 160
    scene = _scene(n=500, opacity=opacity, mixed=mixed)
    K = camera.intrinsics_matrix(80.0, 80.0, w / 2 - 0.5, h / 2 - 0.5)
    vm = _viewmat((2, -1, 1), (0.03, -0.02, 0.05))

    ref, alpha_ref = rasterize(
        scene.means, scene.quats, scene.scales, scene.opacities,
        scene.sh_coeffs, vm, K, w, h, sh_degree=1, render_mode="ED",
        backend="pallas",
    )
    slot3d, meta, _ = build_slot_buffer(scene, vm, K, w, h, 1e-2, 1e10)
    depth, alpha = render_tracking_depth(vm, K, w, h, slot3d, meta)
    assert_close_except_gate_flips(alpha, alpha_ref, atol=3e-5)
    assert_close_except_gate_flips(depth, ref[..., 0], atol=3e-4,
                                   flip_abs=0.3)


@pytest.mark.parametrize("opacity", [1.0, 0.55])
def test_fused_pose_grads_match_general(opacity):
    h, w = 32, 128
    scene = _scene(n=300, seed=4, opacity=opacity, mixed=True)
    K = camera.intrinsics_matrix(70.0, 70.0, w / 2 - 0.5, h / 2 - 0.5)
    vm0 = _viewmat((1, -0.5, 0.8), (0.01, -0.015, 0.02))

    target, _ = rasterize(
        scene.means, scene.quats, scene.scales, scene.opacities,
        scene.sh_coeffs, jnp.eye(4), K, w, h, sh_degree=1, render_mode="ED",
        backend="pallas",
    )
    target = jax.lax.stop_gradient(target[..., 0])
    slot3d, meta, _ = build_slot_buffer(scene, vm0, K, w, h, 1e-2, 1e10)

    def loss_general(vm):
        r, a = rasterize(
            scene.means, scene.quats, scene.scales, scene.opacities,
            scene.sh_coeffs, vm, K, w, h, sh_degree=1, render_mode="ED",
            backend="pallas",
        )
        return jnp.mean((r[..., 0] - target) ** 2) + 0.1 * jnp.mean(a)

    def loss_fused(vm):
        d, a = render_tracking_depth(vm, K, w, h, slot3d, meta)
        return jnp.mean((d - target) ** 2) + 0.1 * jnp.mean(a)

    g_gen = np.asarray(jax.grad(loss_general)(vm0))
    g_fus = np.asarray(jax.grad(loss_fused)(vm0))
    scale = np.abs(g_gen[:3, :]).max()
    np.testing.assert_allclose(
        g_fus[:3, :], g_gen[:3, :], rtol=3e-3, atol=3e-4 * scale
    )


@pytest.mark.parametrize("opacity", [1.0, 0.6])
def test_probe_compact_exact(opacity):
    """Compacting non-contributing slots leaves the render AND the pose
    gradient exact at the probe pose (dropped slots have zero weight, zero
    gradient, and no transmittance effect on any live pixel)."""
    from gsplatloc_tpu.ops.binning import TILE_H, TILE_W

    h, w = 48, 160
    scene = _scene(n=800, seed=3, opacity=opacity, mixed=True)
    K = camera.intrinsics_matrix(80.0, 80.0, w / 2 - 0.5, h / 2 - 0.5)
    vm = _viewmat((2, -1, 1), (0.03, -0.02, 0.05))

    slot_full, meta_full, _ = build_slot_buffer(scene, vm, K, w, h, 1e-2, 1e10)
    n_ty, n_tx = -(-h // TILE_H), -(-w // TILE_W)
    contrib, cd = fused_probe(
        slot_full, meta_full, cam_vector(vm, K, w, h), n_ty, n_tx,
        slot_full.shape[1], 1e-2, 1e10,
    )
    slot_c, meta_c = compact_slot_buffer(slot_full, meta_full, contrib, cd)

    kept = int(meta_c[-1] - meta_c[1])
    total = int(meta_full[-1] - meta_full[1])
    assert 0 < kept < total, (kept, total)

    d_full, a_full = render_tracking_depth(vm, K, w, h, slot_full, meta_full)
    d_c, a_c = render_tracking_depth(vm, K, w, h, slot_c, meta_c)
    # compaction is exact up to prefix-scan re-association ulps (kept slots
    # shift chunk positions, changing the Hillis-Steele association order)
    np.testing.assert_allclose(np.asarray(d_c), np.asarray(d_full),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_c), np.asarray(a_full),
                               rtol=0, atol=1e-5)

    # gradient exactness holds AT the probe pose: use a smooth linear
    # functional of the render so the gradient there is non-degenerate
    rng = np.random.default_rng(11)
    wd = jnp.asarray(rng.standard_normal((h, w)), jnp.float32)
    wa = jnp.asarray(rng.standard_normal((h, w)), jnp.float32)

    def loss(vm_, slot, meta):
        d, a = render_tracking_depth(vm_, K, w, h, slot, meta)
        return jnp.mean(d * wd) + jnp.mean(a * wa)

    g_full = np.asarray(jax.grad(loss)(vm, slot_full, meta_full))
    g_c = np.asarray(jax.grad(loss)(vm, slot_c, meta_c))
    # grads match to the moment-expansion rounding level (the tile-local
    # monomial recombination in the backward re-rounds differently when
    # slots shift chunk positions)
    scale = max(np.abs(g_full).max(), 1e-12)
    np.testing.assert_allclose(g_c, g_full, rtol=0, atol=1e-4 * scale)


def test_fused_recovery_end_to_end():
    """Pose recovery using the fused path only (stale binning across steps)."""
    from gsplatloc_tpu.eval.metrics import rotation_error_deg, translation_error
    from gsplatloc_tpu.models.pose import PoseState
    from gsplatloc_tpu.opt.adam import adam_init, adam_step

    h, w = 48, 128
    scene = _scene(n=1000, seed=7, scales=0.06)
    K = camera.intrinsics_matrix(70.0, 70.0, w / 2 - 0.5, h / 2 - 0.5)
    gt_c2w = np.eye(4, dtype=np.float32)
    gt_c2w[:3, :3] = Rotation.from_euler("xyz", [0.8, -0.5, 0.3],
                                         degrees=True).as_matrix()
    gt_c2w[:3, 3] = [0.015, -0.01, 0.02]
    gt_c2w = jnp.asarray(gt_c2w)
    vm_gt = invert_se3(gt_c2w)
    slot_gt, meta_gt, _ = build_slot_buffer(scene, vm_gt, K, w, h, 1e-2, 1e10)
    depth_gt, _ = render_tracking_depth(vm_gt, K, w, h, slot_gt, meta_gt)
    depth_gt = jax.lax.stop_gradient(depth_gt)

    pose = PoseState.from_c2w(jnp.eye(4))
    slot, meta, _ = build_slot_buffer(
        scene, invert_se3(pose.to_c2w()), K, w, h, 1e-2, 1e10
    )

    @jax.jit
    def step(pose, aq, at, i, slot, meta):
        def f(q, t):
            vm = invert_se3(PoseState(quat=q, trans=t).to_c2w())
            d, _ = render_tracking_depth(vm, K, w, h, slot, meta)
            mask = jax.lax.stop_gradient((d != 0).astype(d.dtype))
            return jnp.mean(jnp.abs(d * mask - depth_gt * mask))
        loss, (gq, gt_) = jax.value_and_grad(f, argnums=(0, 1))(
            pose.quat, pose.trans
        )
        q, aq = adam_step(pose.quat, gq, aq, i, 5e-4, 1e-3)
        t, at = adam_step(pose.trans, gt_, at, i, 1e-3, 1e-3)
        return PoseState(quat=q, trans=t), aq, at, loss

    aq, at = adam_init(pose.quat), adam_init(pose.trans)
    for i in range(150):
        if i and i % 50 == 0:  # periodic resort (stale-binning refresh)
            slot, meta, _ = build_slot_buffer(
                scene, invert_se3(pose.to_c2w()), K, w, h, 1e-2, 1e10
            )
        pose, aq, at, loss = step(pose, aq, at, jnp.int32(i), slot, meta)

    best = pose.to_c2w()
    eT = float(translation_error(best, gt_c2w))
    eR = float(rotation_error_deg(best, gt_c2w))
    eT0 = float(translation_error(jnp.eye(4), gt_c2w))
    assert eT < eT0 / 5, (eT, eT0)
    assert eR < 0.3, eR


@pytest.mark.parametrize("compact", [False, True])
def test_optimize_pose_fused_backend(compact):
    """The full while_loop tracking path with backend='fused'."""
    from gsplatloc_tpu.eval.metrics import rotation_error_deg, translation_error
    from gsplatloc_tpu.opt.tracking import TrackingConfig, optimize_pose

    h, w = 48, 128
    scene = _scene(n=1200, seed=9, scales=0.06)
    K = camera.intrinsics_matrix(70.0, 70.0, w / 2 - 0.5, h / 2 - 0.5)
    gt_c2w = np.eye(4, dtype=np.float32)
    gt_c2w[:3, :3] = Rotation.from_euler("xyz", [0.7, -0.4, 0.3],
                                         degrees=True).as_matrix()
    gt_c2w[:3, 3] = [0.012, -0.01, 0.018]
    gt_c2w = jnp.asarray(gt_c2w)
    slot, meta, _ = build_slot_buffer(scene, invert_se3(gt_c2w), K, w, h,
                                      1e-2, 1e10)
    depth_gt, _ = render_tracking_depth(invert_se3(gt_c2w), K, w, h, slot, meta)
    depth_gt = jax.lax.stop_gradient(depth_gt)

    cfg = TrackingConfig(max_steps=200, patience=50, warmup_steps=30,
                         resort_every=25, compact=compact, kcover=0)
    res = optimize_pose(scene, jnp.eye(4), depth_gt, K, w, h, config=cfg,
                        backend="fused")
    best = res.best_pose.to_c2w()
    eT = float(translation_error(best, gt_c2w))
    eR = float(rotation_error_deg(best, gt_c2w))
    eT0 = float(translation_error(jnp.eye(4), gt_c2w))
    assert eT < eT0 / 5, (eT, eT0)
    assert eR < 0.3, eR
