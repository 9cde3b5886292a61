"""Multi-device tile sharding: parity vs single-device + grad all-reduce.

Runs on the 8-device virtual CPU mesh from conftest."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplatloc_tpu.data.synthetic import random_gaussian_cloud
from gsplatloc_tpu.models.gaussians import scene_from_point_cloud
from gsplatloc_tpu.models.pose import PoseState
from gsplatloc_tpu.ops import camera
from gsplatloc_tpu.ops.lie import invert_se3
from gsplatloc_tpu.ops.rasterize import rasterize
from gsplatloc_tpu.parallel.sharded import make_tile_mesh


def _scene(n=300, seed=0):
    rng = np.random.default_rng(seed)
    pts, rgb = random_gaussian_cloud(rng, n)
    scene = scene_from_point_cloud(jnp.asarray(pts), jnp.asarray(rgb))
    return scene._replace(scales=jnp.full_like(scene.scales, 0.05))


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_forward_matches_single(n_dev):
    h, w = 16 * n_dev * 2, 128  # 2 tile rows per device
    scene = _scene()
    K = camera.intrinsics_matrix(60.0, 60.0, w / 2 - 0.5, h / 2 - 0.5)
    mesh = make_tile_mesh(n_dev)
    args = (scene.means, scene.quats, scene.scales, scene.opacities,
            scene.sh_coeffs, jnp.eye(4), K, w, h)
    r1, a1 = rasterize(*args, sh_degree=1, render_mode="RGB+ED", backend="pallas")
    r2, a2 = rasterize(*args, sh_degree=1, render_mode="RGB+ED",
                       backend="pallas", mesh=mesh)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), atol=1e-6)


def test_sharded_pose_grads_match_single():
    n_dev = 4
    h, w = 16 * n_dev, 128
    scene = _scene(seed=3)
    K = camera.intrinsics_matrix(60.0, 60.0, w / 2 - 0.5, h / 2 - 0.5)
    mesh = make_tile_mesh(n_dev)
    target, _ = rasterize(
        scene.means, scene.quats, scene.scales, scene.opacities, scene.sh_coeffs,
        jnp.eye(4), K, w, h, sh_degree=1, render_mode="ED", backend="pallas",
    )
    target = jax.lax.stop_gradient(target)

    def loss(quat, trans, m):
        vm = invert_se3(PoseState(quat=quat, trans=trans).to_c2w())
        r, _ = rasterize(
            scene.means, scene.quats, scene.scales, scene.opacities,
            scene.sh_coeffs, vm, K, w, h, sh_degree=1, render_mode="ED",
            backend="pallas", mesh=m,
        )
        return jnp.mean((r - target) ** 2)

    q0 = jnp.array([0.9995, 0.01, -0.008, 0.012])
    t0 = jnp.array([0.01, -0.015, 0.02])
    g1 = jax.grad(loss, argnums=(0, 1))(q0, t0, None)
    g2 = jax.grad(loss, argnums=(0, 1))(q0, t0, mesh)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                                   atol=1e-7)


def test_dryrun_multichip_entrypoints():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (128, 256, 4)
    mod.dryrun_multichip(4)

def test_sharded_fused_render_and_grads():
    from gsplatloc_tpu.ops.fused_tracking import (
        build_slot_buffer, render_tracking_depth,
    )

    n_dev = 4
    h, w = 16 * n_dev, 128
    scene = _scene(seed=5)
    K = camera.intrinsics_matrix(60.0, 60.0, w / 2 - 0.5, h / 2 - 0.5)
    mesh = make_tile_mesh(n_dev)
    vm = jnp.eye(4)
    slot, meta, _ = build_slot_buffer(scene, vm, K, w, h, 1e-2, 1e10)

    d1, a1 = render_tracking_depth(vm, K, w, h, slot, meta)
    d2, a2 = render_tracking_depth(vm, K, w, h, slot, meta, mesh=mesh)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), atol=1e-6)

    target = jax.lax.stop_gradient(d1)

    def loss(vmx, m):
        d, a = render_tracking_depth(vmx, K, w, h, slot, meta, mesh=m)
        return jnp.mean((d - target * 1.01) ** 2) + 0.05 * jnp.mean(a)

    g1 = np.asarray(jax.grad(loss)(vm, None))
    g2 = np.asarray(jax.grad(loss)(vm, mesh))
    np.testing.assert_allclose(g2, g1, rtol=1e-4, atol=1e-7)


def test_dryrun_multichip_fused_step():
    """Full fused training step SPMD over a 4-device mesh."""
    from gsplatloc_tpu.opt.tracking import TrackingConfig, optimize_pose
    from gsplatloc_tpu.ops.fused_tracking import (
        build_slot_buffer, render_tracking_depth,
    )
    from gsplatloc_tpu.ops.lie import invert_se3

    n_dev = 4
    h, w = 16 * n_dev, 128
    scene = _scene(seed=6)
    K = camera.intrinsics_matrix(60.0, 60.0, w / 2 - 0.5, h / 2 - 0.5)
    mesh = make_tile_mesh(n_dev)
    slot, meta, _ = build_slot_buffer(scene, invert_se3(jnp.eye(4)), K, w, h,
                                      1e-2, 1e10)
    depth_gt, _ = render_tracking_depth(invert_se3(jnp.eye(4)), K, w, h,
                                        slot, meta)
    cfg = TrackingConfig(max_steps=2, patience=10, warmup_steps=0,
                         resort_every=100, kcover=0)
    res = optimize_pose(scene, jnp.eye(4), jax.lax.stop_gradient(depth_gt),
                        K, w, h, config=cfg, backend="fused", mesh=mesh)
    assert int(res.steps_run) == 2
    assert np.isfinite(float(res.final_pose.trans[0]))

def test_sharded_subtile_render_and_grads():
    from gsplatloc_tpu.ops.fused_subtile import (
        build_subtile_slot_buffer, render_tracking_depth_subtile,
    )

    n_dev = 4
    h, w = 16 * n_dev, 128
    scene = _scene(seed=7)
    K = camera.intrinsics_matrix(60.0, 60.0, w / 2 - 0.5, h / 2 - 0.5)
    mesh = make_tile_mesh(n_dev)
    vm = jnp.eye(4)
    slot, meta, _ = build_subtile_slot_buffer(scene, vm, K, w, h, 1e-2, 1e10)

    d1, a1 = render_tracking_depth_subtile(vm, K, w, h, slot, meta)
    d2, a2 = render_tracking_depth_subtile(vm, K, w, h, slot, meta, mesh=mesh)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), atol=1e-6)

    target = jax.lax.stop_gradient(d1)

    def loss(vmx, m):
        d, a = render_tracking_depth_subtile(vmx, K, w, h, slot, meta, mesh=m)
        return jnp.mean((d - target * 1.01) ** 2) + 0.05 * jnp.mean(a)

    g1 = np.asarray(jax.grad(loss)(vm, None))
    g2 = np.asarray(jax.grad(loss)(vm, mesh))
    np.testing.assert_allclose(g2, g1, rtol=1e-4, atol=1e-7)


def test_dryrun_multichip_subtile_step():
    """Full subtile (default-config) training step SPMD over a 4-device
    mesh — the production hot path under a mesh."""
    from gsplatloc_tpu.opt.tracking import TrackingConfig, optimize_pose
    from gsplatloc_tpu.ops.fused_subtile import (
        build_subtile_slot_buffer, render_tracking_depth_subtile,
    )
    from gsplatloc_tpu.ops.lie import invert_se3

    n_dev = 4
    h, w = 16 * n_dev, 128
    scene = _scene(seed=8)
    K = camera.intrinsics_matrix(60.0, 60.0, w / 2 - 0.5, h / 2 - 0.5)
    mesh = make_tile_mesh(n_dev)
    slot, meta, _ = build_subtile_slot_buffer(
        scene, invert_se3(jnp.eye(4)), K, w, h, 1e-2, 1e10
    )
    depth_gt, _ = render_tracking_depth_subtile(
        invert_se3(jnp.eye(4)), K, w, h, slot, meta
    )
    cfg = TrackingConfig(max_steps=2, patience=10, warmup_steps=0,
                         resort_every=100, kcover=0)
    assert cfg.subtile
    res = optimize_pose(scene, jnp.eye(4), jax.lax.stop_gradient(depth_gt),
                        K, w, h, config=cfg, backend="fused", mesh=mesh)
    assert int(res.steps_run) == 2
    assert np.isfinite(float(res.final_pose.trans[0]))


def test_sharded_kcover_build_render_and_grads():
    """K-cover under a mesh: the pixel-sharded cover buffer + sharded
    render must match the single-device path (forward AND pose grads —
    the replication transpose psums the cam gradient)."""
    from gsplatloc_tpu.ops.fused_subtile import build_subtile_slot_buffer
    from gsplatloc_tpu.ops.fused_tracking import cam_vector
    from gsplatloc_tpu.ops.kcover import (
        build_kcover_buffer, render_tracking_depth_kcover,
    )

    n_dev = 4
    h, w = 16 * n_dev, 128
    scene = _scene(seed=7)
    K = camera.intrinsics_matrix(60.0, 60.0, w / 2 - 0.5, h / 2 - 0.5)
    mesh = make_tile_mesh(n_dev)
    vm = jnp.eye(4)
    slot, meta, _ = build_subtile_slot_buffer(scene, vm, K, w, h, 1e-2, 1e10)
    n_ty, n_tx = -(-h // 16), -(-w // 128)
    cam = cam_vector(vm, K, w, h)

    kb1 = build_kcover_buffer(slot, meta, cam, n_ty, n_tx, 1e-2, 1e10,
                              k_cover=16)
    kb2 = build_kcover_buffer(slot, meta, cam, n_ty, n_tx, 1e-2, 1e10,
                              k_cover=16, mesh=mesh)
    np.testing.assert_allclose(np.asarray(kb2), np.asarray(kb1),
                               rtol=0, atol=0)

    d1, a1 = render_tracking_depth_kcover(vm, K, w, h, kb1)
    d2, a2 = render_tracking_depth_kcover(vm, K, w, h, kb2, mesh=mesh)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), atol=1e-6)

    target = jax.lax.stop_gradient(d1)

    def loss(vmx, kb, m):
        d, a = render_tracking_depth_kcover(vmx, K, w, h, kb, mesh=m)
        return jnp.mean((d - target * 1.01) ** 2) + 0.05 * jnp.mean(a)

    g1 = np.asarray(jax.grad(loss)(vm, kb1, None))
    g2 = np.asarray(jax.grad(loss)(vm, kb2, mesh))
    np.testing.assert_allclose(g2, g1, rtol=1e-4, atol=1e-7)


def test_dryrun_multichip_kcover_step():
    """Full K-cover (two-gate) training steps SPMD over a 4-device mesh."""
    from gsplatloc_tpu.opt.tracking import TrackingConfig, optimize_pose
    from gsplatloc_tpu.ops.fused_subtile import (
        build_subtile_slot_buffer, render_tracking_depth_subtile,
    )
    from gsplatloc_tpu.ops.lie import invert_se3

    n_dev = 4
    h, w = 16 * n_dev, 128
    scene = _scene(seed=8)
    K = camera.intrinsics_matrix(60.0, 60.0, w / 2 - 0.5, h / 2 - 0.5)
    mesh = make_tile_mesh(n_dev)
    slot, meta, _ = build_subtile_slot_buffer(
        scene, invert_se3(jnp.eye(4)), K, w, h, 1e-2, 1e10
    )
    depth_gt, _ = render_tracking_depth_subtile(
        invert_se3(jnp.eye(4)), K, w, h, slot, meta
    )
    cfg = TrackingConfig(max_steps=4, patience=10, warmup_steps=0,
                         resort_every=3, kcover=16)
    res = optimize_pose(scene, jnp.eye(4), jax.lax.stop_gradient(depth_gt),
                        K, w, h, config=cfg, backend="fused", mesh=mesh)
    assert int(res.steps_run) == 4
    assert np.isfinite(float(res.final_pose.trans[0]))


def test_distributed_single_process_bootstrap():
    """jax.distributed single-process init + global mesh + scene sharding.
    initialize() must precede ANY backend use, so it runs in a fresh
    subprocess (the test session's backend is already up)."""
    import subprocess
    import sys

    code = """
import jax
jax.config.update("jax_platforms", "cpu")
from gsplatloc_tpu.parallel import global_tile_mesh, initialize, shard_scenes
multi = initialize(coordinator_address="localhost:39217",
                   num_processes=1, process_id=0)
assert multi is False  # one process
initialize(coordinator_address="localhost:39217",
           num_processes=1, process_id=0)  # idempotent
mesh = global_tile_mesh()
assert mesh.shape["tiles"] == len(jax.devices())
rooms = [f"room{i}" for i in range(8)]
assert shard_scenes(rooms) == rooms  # P=1 takes everything
parts = [shard_scenes(rooms, process_id=p, process_count=3)
         for p in range(3)]
assert sorted(sum(parts, [])) == sorted(rooms)
assert max(len(p) for p in parts) - min(len(p) for p in parts) <= 1
print("DIST_OK")
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=240)
    assert "DIST_OK" in out.stdout, (out.stdout, out.stderr)


@pytest.mark.skipif(
    not os.environ.get("GSPLATLOC_DIST_TEST"),
    reason="2-process jax.distributed run (~30 s, spawns 2 subprocesses); "
           "set GSPLATLOC_DIST_TEST=1 to run. Committed evidence: "
           "runs/round4/distributed/ (scripts/run_distributed_cpu.py)")
def test_distributed_two_process_cpu():
    """REAL multi-process validation: 2 OS processes x 4 virtual CPU
    devices, Gloo collectives across the process boundary, fused tracking
    step SPMD over the global mesh (VERDICT r3 next #5)."""
    import subprocess
    import sys
    from pathlib import Path

    script = Path(__file__).parents[1] / "scripts" / "run_distributed_cpu.py"
    out = subprocess.run([sys.executable, str(script)], capture_output=True,
                         text=True, timeout=900)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert '"ok": true' in out.stdout
