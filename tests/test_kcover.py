"""K-cover renderer (ops/kcover.py) vs the sub-tile fused path.

The K-cover render composites only each pixel's first-K covering splats
(selected by the same gates as the kernels); at the selection pose it must
reproduce the full sub-tile walk wherever K saturates transmittance, its
pose gradients must track the kernel gradients at a (staleness-scale)
perturbed pose, and the two-gate tracking loop must recover poses.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from gsplatloc_tpu.data.synthetic import box_room_frame
from gsplatloc_tpu.eval.metrics import rotation_error_deg, translation_error
from gsplatloc_tpu.models.gaussians import scene_from_point_cloud
from gsplatloc_tpu.ops import camera
from gsplatloc_tpu.ops.fused_subtile import (
    build_subtile_slot_buffer, render_tracking_depth_subtile,
)
from gsplatloc_tpu.ops.fused_tracking import cam_vector
from gsplatloc_tpu.ops.kcover import (
    build_kcover_buffer, render_tracking_depth_kcover,
)
from gsplatloc_tpu.ops.lie import invert_se3
from gsplatloc_tpu.opt.tracking import TrackingConfig, optimize_pose


def _setup(h=64, w=128, clutter=10):
    K_np = np.array([[0.5 * w, 0, w / 2 - 0.5], [0, 0.5 * w, h / 2 - 0.5],
                     [0, 0, 1]], np.float32)
    rgb, depth = box_room_frame(np.eye(4), K_np, h, w, clutter=clutter)
    K = jnp.asarray(K_np)
    pts = camera.depth_to_points(jnp.asarray(depth), K)
    scene = scene_from_point_cloud(pts, jnp.asarray(rgb.reshape(-1, 3)),
                                   grid_shape=(h, w))
    return scene, K


def test_kcover_matches_subtile_at_select_pose():
    h, w = 64, 128
    scene, K = _setup(h, w)
    vm = invert_se3(jnp.eye(4))
    slot, meta, _ = build_subtile_slot_buffer(scene, vm, K, w, h, 1e-2, 1e10)
    d_s, a_s = render_tracking_depth_subtile(vm, K, w, h, slot, meta)
    n_ty, n_tx = -(-h // 16), -(-w // 128)
    kbuf = build_kcover_buffer(slot, meta, cam_vector(vm, K, w, h),
                               n_ty, n_tx, 1e-2, 1e10, k_cover=16)
    d_k, a_k = render_tracking_depth_kcover(vm, K, w, h, kbuf)
    np.testing.assert_allclose(np.asarray(a_k), np.asarray(a_s), atol=2e-3)
    np.testing.assert_allclose(np.asarray(d_k), np.asarray(d_s), atol=5e-3)


def test_kcover_custom_vjp_matches_autodiff():
    """The hand-written backward (compositing bwd + single-pixel-frame
    _pose_chain) must match plain autodiff through render_kcover_ref."""
    from gsplatloc_tpu.ops.kcover import render_kcover, render_kcover_ref

    h, w = 64, 128
    scene, K = _setup(h, w)
    vm = invert_se3(jnp.eye(4))
    slot, meta, _ = build_subtile_slot_buffer(scene, vm, K, w, h, 1e-2, 1e10)
    n_ty, n_tx = -(-h // 16), -(-w // 128)
    cam0 = cam_vector(vm, K, w, h)
    kbuf = build_kcover_buffer(slot, meta, cam0, n_ty, n_tx, 1e-2, 1e10,
                               k_cover=16)

    # perturbed pose so every gradient path is live
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = Rotation.from_euler(
        "xyz", [0.06, -0.04, 0.03], degrees=True).as_matrix()
    c2w[:3, 3] = [0.005, -0.004, 0.006]
    cam = cam_vector(invert_se3(jnp.asarray(c2w)), K, w, h)

    d1, a1 = render_kcover(kbuf, cam, n_ty, n_tx, 1e-2, 1e10)
    d2, a2 = render_kcover_ref(kbuf, cam, n_ty, n_tx, 1e-2, 1e10)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=0)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=0)

    tgt = jax.lax.stop_gradient(d2) * 1.02

    # compare at the PRODUCT level (quat/trans): the raw dR rows
    # legitimately differ by a manifold-normal component — _pose_chain is
    # generic in M = R S R^T while the iso projection constant-folds the
    # R-dependence (cov = s^2 I); the quat -> R VJP projects both onto
    # the same tangent gradient (verified to 2e-8 in f64)
    from gsplatloc_tpu.models.pose import PoseState

    pose0 = PoseState.from_c2w(jnp.asarray(c2w))

    def loss(f, quat, trans):
        vmx = invert_se3(PoseState(quat=quat, trans=trans).to_c2w())
        d, a = f(kbuf, cam_vector(vmx, K, w, h), n_ty, n_tx, 1e-2, 1e10)
        return jnp.mean((d - tgt) ** 2) + 0.1 * jnp.mean(a)

    gq1, gt1 = jax.grad(lambda q, t: loss(render_kcover, q, t),
                        argnums=(0, 1))(pose0.quat, pose0.trans)
    gq2, gt2 = jax.grad(lambda q, t: loss(render_kcover_ref, q, t),
                        argnums=(0, 1))(pose0.quat, pose0.trans)
    sq = max(float(jnp.abs(gq2).max()), 1e-12)
    st = max(float(jnp.abs(gt2).max()), 1e-12)
    np.testing.assert_allclose(np.asarray(gq1), np.asarray(gq2),
                               atol=1e-4 * sq, rtol=0)
    np.testing.assert_allclose(np.asarray(gt1), np.asarray(gt2),
                               atol=1e-4 * st, rtol=0)


def test_kcover_pallas_step_matches_ref():
    """The fused Pallas step kernel pair (the on-chip shipped path,
    interpret mode here) must match the plain-XLA oracle: forward to fp
    noise, quat/trans gradients to summation-order noise (the dR rows'
    manifold-normal component is projected out by the quat VJP — compare
    at the product level, same argument as the custom-VJP test)."""
    from gsplatloc_tpu.models.pose import PoseState
    from gsplatloc_tpu.ops.kcover import render_kcover, render_kcover_ref

    h, w = 64, 128
    scene, K = _setup(h, w)
    vm = invert_se3(jnp.eye(4))
    slot, meta, _ = build_subtile_slot_buffer(scene, vm, K, w, h, 1e-2, 1e10)
    n_ty, n_tx = -(-h // 16), -(-w // 128)
    kbuf = build_kcover_buffer(slot, meta, cam_vector(vm, K, w, h),
                               n_ty, n_tx, 1e-2, 1e10, k_cover=16)

    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = Rotation.from_euler(
        "xyz", [0.06, -0.04, 0.03], degrees=True).as_matrix()
    c2w[:3, 3] = [0.005, -0.004, 0.006]
    cam = cam_vector(invert_se3(jnp.asarray(c2w)), K, w, h)

    d_r, a_r = render_kcover_ref(kbuf, cam, n_ty, n_tx, 1e-2, 1e10)
    d_p, a_p = render_kcover(kbuf, cam, n_ty, n_tx, 1e-2, 1e10,
                             impl="pallas")
    # fp-noise-only tolerance (summation order: MXU contraction vs
    # jnp.sum), 50x under the 5e-3 parity bar; measured 7e-7 on chip,
    # ~2e-5 through the CPU interpreter
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_r), atol=1e-4)

    tgt = jax.lax.stop_gradient(d_r) * 1.02
    pose0 = PoseState.from_c2w(jnp.asarray(c2w))

    def loss(f, quat, trans):
        vmx = invert_se3(PoseState(quat=quat, trans=trans).to_c2w())
        d, a = f(kbuf, cam_vector(vmx, K, w, h), n_ty, n_tx, 1e-2, 1e10)
        return jnp.mean((d - tgt) ** 2) + 0.1 * jnp.mean(a)

    gq1, gt1 = jax.grad(
        lambda q, t: loss(lambda *a: render_kcover(*a, impl="pallas"), q, t),
        argnums=(0, 1))(pose0.quat, pose0.trans)
    gq2, gt2 = jax.grad(lambda q, t: loss(render_kcover_ref, q, t),
                        argnums=(0, 1))(pose0.quat, pose0.trans)
    sq = max(float(jnp.abs(gq2).max()), 1e-12)
    st = max(float(jnp.abs(gt2).max()), 1e-12)
    np.testing.assert_allclose(np.asarray(gq1), np.asarray(gq2),
                               atol=2e-3 * sq, rtol=0)
    np.testing.assert_allclose(np.asarray(gt1), np.asarray(gt2),
                               atol=2e-3 * st, rtol=0)


def test_kcover_records_path_matches_gather_path():
    """The record-emitting select kernel (via='records', the default)
    must produce the exact buffer the index+XLA-gather oracle builds."""
    h, w = 64, 128
    scene, K = _setup(h, w)
    vm = invert_se3(jnp.eye(4))
    slot, meta, _ = build_subtile_slot_buffer(scene, vm, K, w, h, 1e-2, 1e10)
    n_ty, n_tx = -(-h // 16), -(-w // 128)
    cam = cam_vector(vm, K, w, h)
    kb_r = build_kcover_buffer(slot, meta, cam, n_ty, n_tx, 1e-2, 1e10,
                               k_cover=8, via="records")
    kb_g = build_kcover_buffer(slot, meta, cam, n_ty, n_tx, 1e-2, 1e10,
                               k_cover=8, via="gather")
    np.testing.assert_allclose(np.asarray(kb_r), np.asarray(kb_g),
                               rtol=0, atol=0)


def test_kcover_grads_track_subtile_at_perturbed_pose():
    """Gradient agreement at ~1 px of staleness (the select-gate budget)."""
    h, w = 64, 128
    scene, K = _setup(h, w)
    vm = invert_se3(jnp.eye(4))
    slot, meta, _ = build_subtile_slot_buffer(scene, vm, K, w, h, 1e-2, 1e10)
    d_s, _ = render_tracking_depth_subtile(vm, K, w, h, slot, meta)
    tgt = jax.lax.stop_gradient(d_s) * 1.02
    n_ty, n_tx = -(-h // 16), -(-w // 128)
    kbuf = build_kcover_buffer(slot, meta, cam_vector(vm, K, w, h),
                               n_ty, n_tx, 1e-2, 1e10, k_cover=16)

    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = Rotation.from_euler(
        "xyz", [0.05, -0.03, 0.02], degrees=True).as_matrix()
    c2w[:3, 3] = [0.004, -0.003, 0.005]
    vmp = invert_se3(jnp.asarray(c2w))

    def loss_s(v):
        d, a = render_tracking_depth_subtile(v, K, w, h, slot, meta)
        return jnp.mean((d - tgt) ** 2) + 0.1 * jnp.mean(a)

    def loss_k(v):
        d, a = render_tracking_depth_kcover(v, K, w, h, kbuf)
        return jnp.mean((d - tgt) ** 2) + 0.1 * jnp.mean(a)

    ls, gs = jax.value_and_grad(loss_s)(vmp)
    lk, gk = jax.value_and_grad(loss_k)(vmp)
    assert abs(float(ls) - float(lk)) / abs(float(ls)) < 0.02
    gs = np.asarray(gs)[:3]
    gk = np.asarray(gk)[:3]
    scale = np.abs(gs).max()
    assert np.abs(gs - gk).max() / scale < 0.05


def test_kcover_coast_mode_regression():
    """Coast mode (gates loosen 8x after coast_after_steps non-improving
    steps) must not degrade the recovered pose (VERDICT r2 weak #3: coast
    shipped untested — a 16-px-stale cover could report spurious best-loss
    improvements and lock a wrong best_pose). Run the same recovery with
    coast engaged EARLY (trigger 5) vs disabled; the coast run must reach
    the same accuracy class."""
    h, w = 48, 128
    scene, K = _setup(h, w, clutter=10)
    gt = np.eye(4, dtype=np.float32)
    gt[:3, :3] = Rotation.from_euler(
        "xyz", [0.7, -0.4, 0.3], degrees=True).as_matrix()
    gt[:3, 3] = [0.012, -0.01, 0.018]
    gt = jnp.asarray(gt)
    slot, meta, _ = build_subtile_slot_buffer(
        scene, invert_se3(gt), K, w, h, 1e-2, 1e10)
    depth_gt, _ = render_tracking_depth_subtile(
        invert_se3(gt), K, w, h, slot, meta)
    depth_gt = jax.lax.stop_gradient(depth_gt)

    results = {}
    for label, coast in (("coast", 5), ("no_coast", 0)):
        cfg = TrackingConfig(max_steps=200, patience=50, warmup_steps=30,
                             resort_every=10, kcover=16,
                             coast_after_steps=coast)
        res = optimize_pose(scene, jnp.eye(4), depth_gt, K, w, h,
                            config=cfg, backend="fused")
        results[label] = float(
            translation_error(res.best_pose.to_c2w(), gt))
    eT0 = float(translation_error(jnp.eye(4), gt))
    # both must recover; coast may not cost more than 2x (same class)
    assert results["no_coast"] < eT0 / 20, results
    assert results["coast"] < max(results["no_coast"] * 2.0, eT0 / 20), results


def test_optimize_pose_kcover_backend():
    """The full two-gate tracking loop (binning gate + tighter selection
    gate) recovers a perturbed pose through the K-cover render."""
    h, w = 48, 128
    scene, K = _setup(h, w, clutter=10)
    gt = np.eye(4, dtype=np.float32)
    gt[:3, :3] = Rotation.from_euler(
        "xyz", [0.7, -0.4, 0.3], degrees=True).as_matrix()
    gt[:3, 3] = [0.012, -0.01, 0.018]
    gt = jnp.asarray(gt)
    slot, meta, _ = build_subtile_slot_buffer(
        scene, invert_se3(gt), K, w, h, 1e-2, 1e10)
    depth_gt, _ = render_tracking_depth_subtile(
        invert_se3(gt), K, w, h, slot, meta)
    depth_gt = jax.lax.stop_gradient(depth_gt)

    cfg = TrackingConfig(max_steps=200, patience=50, warmup_steps=30,
                         resort_every=10, kcover=16)
    res = optimize_pose(scene, jnp.eye(4), depth_gt, K, w, h, config=cfg,
                        backend="fused")
    best = res.best_pose.to_c2w()
    eT = float(translation_error(best, gt))
    eT0 = float(translation_error(jnp.eye(4), gt))
    assert eT < eT0 / 20, (eT, eT0)
    assert float(rotation_error_deg(best, gt)) < 0.1
    assert float(res.best_loss) < 2e-3
    # the motion-gated segments must have re-selected the cover during
    # convergence (the pose moves far more than select_motion_px)
    assert int(res.selects) >= 1, int(res.selects)


def test_sel_walk_bounds_arithmetic():
    """CB_SEL blocks are absolutely aligned and cover [start, end) for
    every CHUNK-aligned segment shape: empty segments walk zero blocks,
    segments overhanging both block ends are covered, and a segment
    ending at the buffer end never implies an out-of-range consumed
    block (ops/kcover.py _sel_walk_bounds; the in-kernel lane mask
    handles the overhang)."""
    from gsplatloc_tpu.ops.kcover import CB_SEL, _sel_walk_bounds

    def expect(start, end):
        # the documented contract, CB_SEL-generic (the default moved
        # 512 -> 256 in round 5): floor-aligned base, ceil cover of end
        if end <= start:
            return (start // CB_SEL) * CB_SEL, 0
        b0 = start // CB_SEL
        return b0 * CB_SEL, -(-end // CB_SEL) - b0

    cases = [
        (0, 0),                # empty at origin
        (128, 128),            # empty, unaligned
        (0, 128),              # head of first block
        (128, 640),            # overhangs block boundaries
        (CB_SEL, 2 * CB_SEL),  # exactly one aligned block
        (8192 - 384, 8192),    # tail at buffer end
    ]
    cases = [(s, e, *expect(s, e)) for s, e in cases]
    for start, end, want_base, want_n in cases:
        base, n = _sel_walk_bounds(jnp.int32(start), jnp.int32(end))
        base, n = int(base), int(n)
        assert base % CB_SEL == 0
        assert base == want_base, (start, end, base)
        assert n == want_n, (start, end, n)
        if end > start:
            # blocks cover the segment...
            assert base <= start and base + n * CB_SEL >= end
            # ...and consumed blocks stay inside a CB_SEL-aligned buffer
            assert base + n * CB_SEL <= ((end + CB_SEL - 1) // CB_SEL
                                         ) * CB_SEL
        else:
            assert n == 0


def test_render_kcover_explicit_pallas_raises_on_misaligned():
    """impl='pallas' explicitly forced with m_out not a multiple of
    CB_STEP must raise, not silently fall back to XLA (a parity test
    would vacuously compare XLA vs itself — ADVICE r3)."""
    import pytest

    from gsplatloc_tpu.ops import kcover as kc

    m_out = kc.CB_STEP + kc.P_SUB  # not a CB_STEP multiple
    kbuf = jnp.zeros((kc.NREC_KC, 8, m_out), jnp.float32)
    cam = jnp.zeros((18,), jnp.float32)
    with pytest.raises(ValueError, match="CB_STEP"):
        kc.render_kcover(kbuf, cam, 1, 1, 1e-2, 1e10, impl="pallas")


def test_step_live_gate_excludes_boundary_slot():
    """The walk kernels (and the reference CUDA rasterizer) EXCLUDE the
    slot whose inclusive transmittance crosses T_EPS — its t_excl can be
    as large as the surviving T, so compositing it anyway was a measured
    0.09 alpha error on boundary pixels. The K-cover step must apply the
    same gate, and the alpha-only select may therefore list post-death
    records (the step zeroes their weights). Hand-built cover list: ten
    alpha~0.21 covers drive T to ~0.09, then an opaque record whose
    inclusive T crosses T_EPS — expected alpha_acc stays ~0.91, NOT ~1."""
    from gsplatloc_tpu.ops.fused_subtile import scramble_image
    from gsplatloc_tpu.ops.fused_tracking import cam_vector
    from gsplatloc_tpu.ops.kcover import NREC_KC, render_kcover_ref
    from gsplatloc_tpu.ops.lie import invert_se3

    h, w = 16, 128  # one sub-tile row
    K_np = np.array([[100.0, 0, w / 2 - 0.5], [0, 100.0, h / 2 - 0.5],
                     [0, 0, 1]], np.float32)
    vm = invert_se3(jnp.eye(4))
    cam = cam_vector(vm, jnp.asarray(K_np), w, h)
    m_out = h * w
    kbuf = np.zeros((NREC_KC, 16, m_out), np.float32)
    # world point rendering to pixel (8, 64): x=(64-63.5)/100*z, ...
    z = 1.0
    x = (64 + 0.5 - K_np[0, 2]) / K_np[0, 0] * z
    y = (8 + 0.5 - K_np[1, 2]) / K_np[1, 1] * z
    # ten translucent covers: s2 sized so pixel-center alpha ~ 0.21
    # (alpha = exp(-0) = 1 at dead center; use opacity via s2? opa row
    # is the amplitude — set opa = 0.21 directly)
    for k in range(10):
        kbuf[:, k, :] = np.array([x, y, z, 1e-4, 0.21], np.float32)[:, None]
        z += 1e-3
        x = (64 + 0.5 - K_np[0, 2]) / K_np[0, 0] * z
        y = (8 + 0.5 - K_np[1, 2]) / K_np[1, 1] * z
    # T after 10: 0.79^10 ~ 0.0947 > T_EPS. Opaque giant behind:
    # inclusive T = 0.0947 * (1 - 0.999) ~ 9.5e-5 < T_EPS -> EXCLUDED
    kbuf[:, 10, :] = np.array([x, y, z + 1.0, 1.0, 1.0], np.float32)[:, None]
    d, a = render_kcover_ref(jnp.asarray(kbuf), cam, 1, 1, 1e-2, 1e10)
    a_px = float(a[8, 64])
    expect = 1.0 - 0.79 ** 10
    assert abs(a_px - expect) < 5e-3, (a_px, expect)
    # and the pose gradient through the gated render stays finite/nonzero
    def loss(c):
        d2, a2 = render_kcover_ref(jnp.asarray(kbuf), c, 1, 1, 1e-2, 1e10)
        return jnp.sum(d2)
    g = jax.grad(loss)(cam)
    assert np.isfinite(np.asarray(g)).all()


def test_kcover_slot_buffer_matches_padded_builder():
    """The round-5 unpadded + budgeted rebuild (build_kcover_slot_buffer)
    must select the SAME cover records as the padded sub-tile builder:
    the live slot set and its depth order are identical, only dead
    padding slots (exactly-zero contribution) and block groupings differ.
    Rendered depth/alpha therefore match to fp-reassociation tolerance
    (the iso binning projection reassociates cov2d vs the general path)."""
    from gsplatloc_tpu.ops.kcover import build_kcover_slot_buffer

    h, w = 64, 128
    scene, K = _setup(h, w)
    vm = invert_se3(jnp.eye(4))
    n_ty, n_tx = -(-h // 16), -(-w // 128)
    cam = cam_vector(vm, K, w, h)

    slot_p, meta_p, _ = build_subtile_slot_buffer(scene, vm, K, w, h,
                                                  1e-2, 1e10)
    kb_p = build_kcover_buffer(slot_p, meta_p, cam, n_ty, n_tx,
                               1e-2, 1e10, k_cover=16)
    for budget in (1.0, 0.7):
        slot_u, meta_u, ovf = build_kcover_slot_buffer(
            scene, vm, K, w, h, 1e-2, 1e10, slot_budget=budget)
        assert not bool(ovf), f"unexpected overflow at budget {budget}"
        kb_u = build_kcover_buffer(slot_u, meta_u, cam, n_ty, n_tx,
                                   1e-2, 1e10, k_cover=16)
        d_p, a_p = render_tracking_depth_kcover(vm, K, w, h, kb_p)
        d_u, a_u = render_tracking_depth_kcover(vm, K, w, h, kb_u)
        np.testing.assert_allclose(np.asarray(a_u), np.asarray(a_p),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(d_u), np.asarray(d_p),
                                   atol=1e-4)


def test_kcover_slot_budget_overflow_flag():
    """A budget below the live fraction must raise the overflow flag (and
    only truncate — never read out-of-range records)."""
    from gsplatloc_tpu.ops.kcover import build_kcover_slot_buffer

    h, w = 64, 128
    scene, K = _setup(h, w)
    vm = invert_se3(jnp.eye(4))
    slot_u, meta_u, ovf = build_kcover_slot_buffer(
        scene, vm, K, w, h, 1e-2, 1e10, slot_budget=0.05)
    assert bool(ovf)
    # clamped starts never exceed the static buffer
    assert int(jnp.max(meta_u[1:])) <= slot_u.shape[1]


def test_kcover_overflow_surfaces_in_pair_result():
    """optimize_pose reports slot_overflow when the budget truncates."""
    h, w = 64, 128
    scene, K = _setup(h, w)
    vm = invert_se3(jnp.eye(4))
    slot, meta, _ = build_subtile_slot_buffer(scene, vm, K, w, h, 1e-2, 1e10)
    d_gt, _ = render_tracking_depth_subtile(vm, K, w, h, slot, meta)
    d_gt = jax.lax.stop_gradient(d_gt)
    for budget, expect in ((0.05, True), (1.0, False)):
        cfg = TrackingConfig(max_steps=3, patience=10, warmup_steps=0,
                             resort_every=2, kcover=16, slot_budget=budget)
        res = optimize_pose(scene, jnp.eye(4), d_gt, K, w, h,
                            config=cfg, backend="fused")
        assert bool(res.slot_overflow) == expect, (budget, expect)


def test_project_iso_binning_matches_general():
    """project_iso_binning must agree with project_gaussians on isotropic
    scenes: identical radius/valid (integer/boolean — ulp reassociation
    does not flip them off ties) and matching mean2d/depth."""
    from gsplatloc_tpu.ops.projection import (
        project_gaussians, project_iso_binning,
    )

    h, w = 64, 128
    scene, K = _setup(h, w)
    vm = invert_se3(
        jnp.asarray(np.array([[1, 0, 0, 0.01], [0, 1, 0, -0.02],
                              [0, 0, 1, 0.03], [0, 0, 0, 1]], np.float32)))
    g = project_gaussians(scene.means, scene.quats, scene.scales, vm, K,
                          w, h, 1e-2, 1e10)
    i = project_iso_binning(scene.means,
                            scene.scales[:, 0] * scene.scales[:, 0],
                            vm, K, w, h, 1e-2, 1e10)
    np.testing.assert_array_equal(np.asarray(g.valid), np.asarray(i.valid))
    np.testing.assert_array_equal(np.asarray(g.radius), np.asarray(i.radius))
    np.testing.assert_allclose(np.asarray(g.mean2d), np.asarray(i.mean2d),
                               rtol=1e-6, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g.depth), np.asarray(i.depth),
                               rtol=1e-6, atol=1e-6)


def test_select_scan_and_rows_variants_bitwise():
    """The MXU triangular-dot rank scan ({0,1} operands, f32 accumulation
    -> exact integer counts) and the 8-row padded extraction operand must
    produce BITWISE-identical cover records to the default kernel."""
    from gsplatloc_tpu.ops.kcover import (
        build_kcover_slot_buffer, select_kcover_records,
    )

    h, w = 64, 128
    scene, K = _setup(h, w)
    vm = invert_se3(jnp.eye(4))
    slot, meta, _ = build_kcover_slot_buffer(scene, vm, K, w, h, 1e-2, 1e10)
    n_ty, n_tx = -(-h // 16), -(-w // 128)
    cam = cam_vector(vm, K, w, h)
    base = np.asarray(select_kcover_records(
        slot, meta, cam, n_ty, n_tx, 16, 1e-2, 1e10,
        scan_impl="hs", sel_rows=6))
    for scan_impl, sel_rows in (("mxu", 6), ("hs", 8), ("mxu", 8)):
        out = np.asarray(select_kcover_records(
            slot, meta, cam, n_ty, n_tx, 16, 1e-2, 1e10,
            scan_impl=scan_impl, sel_rows=sel_rows))
        np.testing.assert_array_equal(out, base, err_msg=(scan_impl, sel_rows))
