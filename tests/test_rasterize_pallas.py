"""Pallas tile rasterizer vs dense oracle: forward + gradient parity.

Runs in interpreter mode on CPU (compiled on real TPU). Scenes are kept
within the binning radius clamp so the tile path is exact vs the oracle.
"""

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


def _scene(n=300, seed=0, scales=0.04, opacity=1.0):
    rng = np.random.default_rng(seed)
    pts, rgb = random_gaussian_cloud(rng, n)
    scene = scene_from_point_cloud(jnp.asarray(pts), jnp.asarray(rgb))
    return scene._replace(
        scales=jnp.full_like(scene.scales, scales),
        opacities=jnp.full_like(scene.opacities, opacity),
    )


def _render(scene, viewmat, K, h, w, mode, backend):
    return rasterize(
        scene.means, scene.quats, scene.scales, scene.opacities, scene.sh_coeffs,
        viewmat, K, w, h, sh_degree=1, render_mode=mode, backend=backend,
    )


@pytest.mark.parametrize("mode", ["RGB+ED", "ED"])
@pytest.mark.parametrize("opacity", [1.0, 0.6])
def test_forward_parity_vs_oracle(mode, opacity):
    h, w = 40, 192  # spans multiple (16, 128) tiles incl. partial edge tiles
    scene = _scene(n=400, opacity=opacity)
    K = camera.intrinsics_matrix(90.0, 90.0, w / 2 - 0.5, h / 2 - 0.5)
    vm = jnp.eye(4)
    ro, ao = _render(scene, vm, K, h, w, mode, "reference")
    rp, ap = _render(scene, vm, K, h, w, mode, "pallas")
    np.testing.assert_allclose(np.asarray(ap), np.asarray(ao), atol=2e-5)
    np.testing.assert_allclose(np.asarray(rp), np.asarray(ro), atol=2e-4)


def test_forward_parity_rotated_camera():
    from scipy.spatial.transform import Rotation

    h, w = 48, 144
    scene = _scene(n=500, seed=2)
    K = camera.intrinsics_matrix(80.0, 80.0, w / 2 - 0.5, h / 2 - 0.5)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = Rotation.from_euler("xyz", [3, -2, 4], degrees=True).as_matrix()
    c2w[:3, 3] = [0.05, -0.02, 0.1]
    vm = invert_se3(jnp.asarray(c2w))
    ro, ao = _render(scene, vm, K, h, w, "RGB+ED", "reference")
    rp, ap = _render(scene, vm, K, h, w, "RGB+ED", "pallas")
    np.testing.assert_allclose(np.asarray(ap), np.asarray(ao), atol=2e-5)
    np.testing.assert_allclose(np.asarray(rp), np.asarray(ro), atol=2e-4)


@pytest.mark.parametrize("opacity", [1.0, 0.6])
def test_pose_gradient_parity_vs_oracle_autodiff(opacity):
    """The custom VJP (Pallas bwd kernel + projection autodiff) must match
    autodiff through the dense oracle — same gating semantics, same math."""
    h, w = 32, 128
    scene = _scene(n=250, seed=4, scales=0.05, opacity=opacity)
    K = camera.intrinsics_matrix(70.0, 70.0, w / 2 - 0.5, h / 2 - 0.5)
    target, _ = _render(scene, jnp.eye(4), K, h, w, "ED", "reference")
    target = jax.lax.stop_gradient(target)

    def loss(quat, trans, backend):
        vm = invert_se3(PoseState(quat=quat, trans=trans).to_c2w())
        r, a = _render(scene, vm, K, h, w, "ED", backend)
        return jnp.mean((r - target) ** 2) + 0.1 * jnp.mean(a)

    q0 = jnp.array([0.9995, 0.01, -0.008, 0.012])
    t0 = jnp.array([0.01, -0.015, 0.02])
    go_q, go_t = jax.grad(loss, argnums=(0, 1))(q0, t0, "reference")
    gp_q, gp_t = jax.grad(loss, argnums=(0, 1))(q0, t0, "pallas")
    scale = max(float(jnp.max(jnp.abs(go_q))), float(jnp.max(jnp.abs(go_t))))
    np.testing.assert_allclose(
        np.asarray(gp_q), np.asarray(go_q), rtol=2e-3, atol=2e-4 * scale
    )
    np.testing.assert_allclose(
        np.asarray(gp_t), np.asarray(go_t), rtol=2e-3, atol=2e-4 * scale
    )


def test_gaussian_param_gradient_parity():
    """Gradients to Gaussian params (means/scales/opacities/sh) also flow
    through the Pallas path and match the oracle (gsplat API parity)."""
    h, w = 32, 128
    scene = _scene(n=120, seed=5, scales=0.06, opacity=0.55)
    K = camera.intrinsics_matrix(70.0, 70.0, w / 2 - 0.5, h / 2 - 0.5)
    vm = jnp.eye(4)

    def loss(means, scales, opacities, sh, backend):
        r, a = rasterize(
            means, scene.quats, scales, opacities, sh, vm, K, w, h,
            sh_degree=1, render_mode="RGB+ED", backend=backend,
        )
        return jnp.mean(r**2) + 0.05 * jnp.mean(a)

    args = (scene.means, scene.scales, scene.opacities, scene.sh_coeffs)
    go = jax.grad(loss, argnums=(0, 1, 2, 3))(*args, "reference")
    gp = jax.grad(loss, argnums=(0, 1, 2, 3))(*args, "pallas")
    for o, p, name in zip(go, gp, ["means", "scales", "opa", "sh"]):
        o, p = np.asarray(o), np.asarray(p)
        scale = np.abs(o).max() + 1e-12
        np.testing.assert_allclose(p, o, rtol=5e-3, atol=5e-4 * scale, err_msg=name)


def test_general_parity_helper():
    """ops/parity.general_parity — the session-gate check for the general
    rasterizer — passes on CPU (the TPU sessions run the same function on
    chip; scripts/tpu_parity_full.py)."""
    from gsplatloc_tpu.ops.parity import general_parity

    r = general_parity(height=32, width=128, n=150)
    assert r["ok"], r
    assert set(r["grad_rels"]) == {
        "means", "quats", "scales", "opacities", "sh", "viewmat"}
