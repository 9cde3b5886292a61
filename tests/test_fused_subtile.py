"""Sub-tile fused rasterizer vs the full-tile fused path and general path.

The (16, 32) sub-tile kernels share all per-slot math with the fused path;
with the slot buffer built at the same pose their forward and pose gradient
must agree with the full-tile fused path to re-association rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from gsplatloc_tpu.data.synthetic import random_gaussian_cloud
from gsplatloc_tpu.models.gaussians import scene_from_point_cloud
from gsplatloc_tpu.ops import camera
from gsplatloc_tpu.ops.fused_subtile import (
    build_subtile_slot_buffer, render_tracking_depth_subtile,
    scramble_image, unscramble_image,
)
from gsplatloc_tpu.ops.fused_tracking import (
    build_slot_buffer, render_tracking_depth,
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


def test_scramble_roundtrip():
    rng = np.random.default_rng(0)
    n_ty, n_tx = 3, 2
    img = jnp.asarray(rng.standard_normal((n_ty * 16, n_tx * 128)),
                      jnp.float32)
    flat = scramble_image(img, n_ty, n_tx)
    back = unscramble_image(flat, n_ty, n_tx)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(img))
    # spot-check the flat index convention the kernels rely on:
    # global-ROW-MAJOR sub-tile ids (fused_subtile._seg_id)
    from gsplatloc_tpu.ops.fused_subtile import (
        N_SUB_X, N_SUB_Y, P_SUB, SUB_H, SUB_W,
    )

    n_gx = n_tx * N_SUB_X
    gy, gx, r, c = n_ty * N_SUB_Y - 2, n_gx - 3, SUB_H // 2, SUB_W // 2 - 1
    assert float(flat[(gy * n_gx + gx) * P_SUB + r * SUB_W + c]) == float(
        img[gy * SUB_H + r, gx * SUB_W + c]
    )


@pytest.mark.parametrize("opacity", [1.0, 0.6])
@pytest.mark.parametrize("mixed", [False, True])
def test_subtile_forward_matches_fused(opacity, mixed):
    h, w = 48, 160
    scene = _scene(n=500, opacity=opacity, mixed=mixed)
    K = camera.intrinsics_matrix(80.0, 80.0, w / 2 - 0.5, h / 2 - 0.5)
    vm = _viewmat((2, -1, 1), (0.03, -0.02, 0.05))

    slot_f, meta_f, _ = build_slot_buffer(scene, vm, K, w, h, 1e-2, 1e10)
    d_ref, a_ref = render_tracking_depth(vm, K, w, h, slot_f, meta_f)

    slot_s, meta_s, _ = build_subtile_slot_buffer(scene, vm, K, w, h,
                                                  1e-2, 1e10)
    d_sub, a_sub = render_tracking_depth_subtile(vm, K, w, h, slot_s, meta_s)
    assert_close_except_gate_flips(a_sub, a_ref, atol=3e-5)
    assert_close_except_gate_flips(d_sub, d_ref, atol=3e-4, flip_abs=0.3)


def test_subtile_forward_matches_general_oracle():
    h, w = 48, 160
    scene = _scene(n=500, opacity=1.0, mixed=True)
    K = camera.intrinsics_matrix(80.0, 80.0, w / 2 - 0.5, h / 2 - 0.5)
    vm = _viewmat((1, -2, 0.5), (0.02, 0.01, -0.03))

    ref, a_ref = rasterize(
        scene.means, scene.quats, scene.scales, scene.opacities,
        scene.sh_coeffs, vm, K, w, h, sh_degree=1, render_mode="ED",
        backend="pallas",
    )
    slot_s, meta_s, _ = build_subtile_slot_buffer(scene, vm, K, w, h,
                                                  1e-2, 1e10)
    d_sub, a_sub = render_tracking_depth_subtile(vm, K, w, h, slot_s, meta_s)
    assert_close_except_gate_flips(a_sub, a_ref, atol=3e-5)
    assert_close_except_gate_flips(d_sub, ref[..., 0], atol=3e-4,
                                   flip_abs=0.3)


@pytest.mark.parametrize("opacity", [1.0, 0.55])
def test_subtile_pose_grads_match_fused(opacity):
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
    slot_f, meta_f, _ = build_slot_buffer(scene, vm0, K, w, h, 1e-2, 1e10)
    slot_s, meta_s, _ = build_subtile_slot_buffer(scene, vm0, K, w, h,
                                                  1e-2, 1e10)

    def loss_fused(vm):
        d, a = render_tracking_depth(vm, K, w, h, slot_f, meta_f)
        return jnp.mean((d - target) ** 2) + 0.1 * jnp.mean(a)

    def loss_sub(vm):
        d, a = render_tracking_depth_subtile(vm, K, w, h, slot_s, meta_s)
        return jnp.mean((d - target) ** 2) + 0.1 * jnp.mean(a)

    g_fus = np.asarray(jax.grad(loss_fused)(vm0))
    g_sub = np.asarray(jax.grad(loss_sub)(vm0))
    scale = np.abs(g_fus[:3, :]).max()
    np.testing.assert_allclose(
        g_sub[:3, :], g_fus[:3, :], rtol=3e-3, atol=3e-4 * scale
    )


def test_optimize_pose_motion_adaptive_resort():
    """resort_motion_px gates rebuilds on accumulated pose motion; recovery
    quality must hold (staleness stays below the pixel bound)."""
    from gsplatloc_tpu.eval.metrics import rotation_error_deg, translation_error
    from gsplatloc_tpu.ops.lie import invert_se3 as inv
    from gsplatloc_tpu.opt.tracking import TrackingConfig, optimize_pose

    h, w = 48, 128
    scene = _scene(n=1200, seed=9, scales=0.06)
    K = camera.intrinsics_matrix(70.0, 70.0, w / 2 - 0.5, h / 2 - 0.5)
    gt_c2w = np.eye(4, dtype=np.float32)
    gt_c2w[:3, :3] = Rotation.from_euler("xyz", [0.7, -0.4, 0.3],
                                         degrees=True).as_matrix()
    gt_c2w[:3, 3] = [0.012, -0.01, 0.018]
    gt_c2w = jnp.asarray(gt_c2w)
    slot, meta, _ = build_subtile_slot_buffer(scene, inv(gt_c2w), K, w, h,
                                              1e-2, 1e10)
    depth_gt, _ = render_tracking_depth_subtile(inv(gt_c2w), K, w, h,
                                                slot, meta)
    depth_gt = jax.lax.stop_gradient(depth_gt)

    cfg = TrackingConfig(max_steps=200, patience=50, warmup_steps=30,
                         resort_every=10, resort_motion_px=0.25,
                         subtile=True, kcover=0)
    res = optimize_pose(scene, jnp.eye(4), depth_gt, K, w, h, config=cfg,
                        backend="fused")
    best = res.best_pose.to_c2w()
    eT = float(translation_error(best, gt_c2w))
    eT0 = float(translation_error(jnp.eye(4), gt_c2w))
    assert eT < eT0 / 5, (eT, eT0)
    assert float(rotation_error_deg(best, gt_c2w)) < 0.3


def test_optimize_pose_subtile_backend():
    """The full while_loop tracking path with subtile=True."""
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
    slot, meta, _ = build_subtile_slot_buffer(scene, invert_se3(gt_c2w),
                                              K, w, h, 1e-2, 1e10)
    depth_gt, _ = render_tracking_depth_subtile(invert_se3(gt_c2w), K, w, h,
                                                slot, meta)
    depth_gt = jax.lax.stop_gradient(depth_gt)

    cfg = TrackingConfig(max_steps=200, patience=50, warmup_steps=30,
                         resort_every=25, subtile=True, kcover=0)
    res = optimize_pose(scene, jnp.eye(4), depth_gt, K, w, h, config=cfg,
                        backend="fused")
    best = res.best_pose.to_c2w()
    eT = float(translation_error(best, gt_c2w))
    eR = float(rotation_error_deg(best, gt_c2w))
    eT0 = float(translation_error(jnp.eye(4), gt_c2w))
    assert eT < eT0 / 5, (eT, eT0)
    assert eR < 0.3, eR


def test_phase_kernels_match_xla_forms():
    """The Pallas project8/chain phase kernels must reproduce the XLA
    reference forms exactly (same f32 math, VMEM-resident intermediates)."""
    from gsplatloc_tpu.ops.fused_subtile import (
        CB, ENC_Y, N_SUB, NUM_PROJ_ROWS, _chain_pallas, _chain_xla,
        _project8, _project8_pallas, build_subtile_slot_buffer,
    )
    from gsplatloc_tpu.ops.fused_tracking import cam_vector

    h, w = 48, 160
    scene = _scene(n=500, seed=3, mixed=True)
    K = camera.intrinsics_matrix(0.7 * w, 0.7 * w, w / 2 - 0.5, h / 2 - 0.5)
    vm = _viewmat((2.0, -1.0, 0.5), (0.01, -0.02, 0.03))
    slot3d, meta, _ = build_subtile_slot_buffer(scene, vm, K, w, h,
                                                1e-2, 1e10)
    mp = slot3d.shape[1]
    assert mp % CB == 0  # pad_align keeps the Pallas path exercised
    cam = cam_vector(vm, K, w, h)

    p_ref = _project8(slot3d, cam, 1e-2, 1e10)
    p_ker = _project8_pallas(slot3d, cam, 1e-2, 1e10)
    # same f32 formulas; XLA/interpreter fuse differently (fma, 1/x), so
    # allow a few ulp of relative drift
    np.testing.assert_allclose(np.asarray(p_ker), np.asarray(p_ref),
                               rtol=5e-4, atol=1e-5)

    # synthetic moments with the packed origin row the bwd kernel writes:
    # enc = sub_row*ENC_Y + sub_col per chunk, reconstructed here from
    # the segment starts (same recipe as _chain_xla)
    rng = np.random.default_rng(7)
    mom = rng.normal(0, 1e-3, (NUM_PROJ_ROWS, mp)).astype(np.float32)
    from gsplatloc_tpu.ops.binning import TILE_H, TILE_W
    from gsplatloc_tpu.ops.rasterize_pallas import CHUNK
    n_tx = -(-w // TILE_W)
    starts = np.asarray(meta)[1:]
    n_seg = starts.shape[0] - 1
    cstart = np.arange(mp // CHUNK) * CHUNK
    seg = np.clip(np.searchsorted(starts[1:], cstart, side="right"),
                  0, n_seg - 1)
    from gsplatloc_tpu.ops.fused_subtile import N_SUB_X

    n_gx = n_tx * N_SUB_X
    enc = (seg // n_gx) * ENC_Y + (seg % n_gx)
    mom[7] = np.repeat(enc.astype(np.float32), CHUNK)
    mom = jnp.asarray(mom)

    d_ref = _chain_xla(slot3d, mom, cam, meta, n_tx)
    limits = jnp.stack([meta[1], meta[-1]]).astype(jnp.int32)
    d_ker = _chain_pallas(slot3d, mom, cam, limits, meta, n_tx)
    scale = np.abs(np.asarray(d_ref)).max()
    np.testing.assert_allclose(np.asarray(d_ker), np.asarray(d_ref),
                               rtol=0, atol=2e-5 * scale)


def test_triangular_scan_forms_match_hillis():
    """The MXU triangular cumsum/cumprod forms (env knobs GSPLATLOC_SCAN_*)
    must match Hillis-Steele on representative transmittance data."""
    from gsplatloc_tpu.ops.fused_subtile import _tri_dot, P_SUB
    from gsplatloc_tpu.ops.rasterize_pallas import CHUNK, _scan_add, _scan_mul

    rng = np.random.default_rng(11)
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    tri = (r >= c).astype(jnp.float32)

    # cumsum on w*phi-scale data
    w = jnp.asarray(rng.uniform(-1e-3, 1e-3, (CHUNK, P_SUB)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(_tri_dot(tri, w)), np.asarray(_scan_add(w, P_SUB)),
        rtol=1e-5, atol=1e-7,
    )
    # cumprod via exp(cumsum(log)) on (1 - alpha) data in [1e-3, 1]
    om = jnp.asarray(rng.uniform(1e-3, 1.0, (CHUNK, P_SUB)), jnp.float32)
    got = jnp.exp(_tri_dot(tri, jnp.log(jnp.maximum(om, 1e-30))))
    ref = _scan_mul(om, P_SUB)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=1e-9)
