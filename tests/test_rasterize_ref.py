"""Oracle rasterizer: forward semantics + autodiff pose gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from gsplatloc_tpu.data.synthetic import random_gaussian_cloud
from gsplatloc_tpu.models.gaussians import scene_from_point_cloud
from gsplatloc_tpu.models.pose import PoseState
from gsplatloc_tpu.ops import camera
from gsplatloc_tpu.ops.lie import invert_se3
from gsplatloc_tpu.ops.rasterize import rasterize


def _setup(n=400, h=40, w=48, seed=0):
    rng = np.random.default_rng(seed)
    pts, rgb = random_gaussian_cloud(rng, n)
    scene = scene_from_point_cloud(jnp.asarray(pts), jnp.asarray(rgb))
    # widen the scales a bit so splats cover pixels (random clouds are sparse)
    scene = scene._replace(scales=jnp.full_like(scene.scales, 0.05))
    K = camera.intrinsics_matrix(60.0, 60.0, w / 2 - 0.5, h / 2 - 0.5)
    viewmat = jnp.eye(4)
    return scene, K, viewmat, h, w


def _render(scene, viewmat, K, h, w, mode="RGB+ED"):
    return rasterize(
        scene.means, scene.quats, scene.scales, scene.opacities, scene.sh_coeffs,
        viewmat, K, w, h, sh_degree=1, render_mode=mode, backend="reference",
    )


def test_forward_shapes_and_modes():
    scene, K, viewmat, h, w = _setup()
    r, a = _render(scene, viewmat, K, h, w, "RGB+ED")
    assert r.shape == (h, w, 4) and a.shape == (h, w)
    r2, _ = _render(scene, viewmat, K, h, w, "ED")
    assert r2.shape == (h, w, 1)
    # ED channel identical between modes
    np.testing.assert_allclose(np.asarray(r[..., 3]), np.asarray(r2[..., 0]), rtol=1e-6)
    # alpha in [0, 1]
    a = np.asarray(a)
    assert a.min() >= 0.0 and a.max() <= 1.0 + 1e-6


def test_depth_is_alpha_normalized_expected_depth():
    scene, K, viewmat, h, w = _setup()
    r, a = _render(scene, viewmat, K, h, w)
    d = np.asarray(r[..., 3])
    a = np.asarray(a)
    covered = a > 0.5
    assert covered.sum() > 100
    # expected depth must lie within the cloud's z range where covered
    assert d[covered].min() > 1.5 and d[covered].max() < 4.5


def test_single_gaussian_center_color_and_depth():
    # one opaque gaussian straight ahead: center pixel ~= its color & depth
    from gsplatloc_tpu.ops.sh import rgb_to_sh

    mean = jnp.array([[0.0, 0.0, 2.0]])
    quat = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    scale = jnp.array([[0.3, 0.3, 0.3]])
    opa = jnp.array([1.0])
    sh = jnp.zeros((1, 4, 3)).at[0, 0].set(rgb_to_sh(jnp.array([0.2, 0.5, 0.9])))
    h, w = 33, 33
    K = camera.intrinsics_matrix(50.0, 50.0, 16.0, 16.0)
    r, a = rasterize(
        mean, quat, scale, opa, sh, jnp.eye(4), K, w, h,
        sh_degree=1, render_mode="RGB+ED", backend="reference",
    )
    center = np.asarray(r[16, 16])
    alpha = float(a[16, 16])
    assert alpha > 0.99
    # RGB accumulates alpha-weighted color; ED is alpha-normalized.
    np.testing.assert_allclose(center[:3] / alpha, [0.2, 0.5, 0.9], atol=1e-5)
    np.testing.assert_allclose(center[3], 2.0, atol=1e-3)


def test_front_to_back_occlusion():
    from gsplatloc_tpu.ops.sh import rgb_to_sh

    # near red gaussian occludes far blue one on the same ray
    means = jnp.array([[0.0, 0.0, 1.5], [0.0, 0.0, 3.0]])
    quats = jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (2, 1))
    scales = jnp.full((2, 3), 0.2)
    opa = jnp.array([1.0, 1.0])
    sh = jnp.zeros((2, 4, 3))
    sh = sh.at[0, 0].set(rgb_to_sh(jnp.array([1.0, 0.0, 0.0])))
    sh = sh.at[1, 0].set(rgb_to_sh(jnp.array([0.0, 0.0, 1.0])))
    h, w = 17, 17
    K = camera.intrinsics_matrix(30.0, 30.0, 8.0, 8.0)
    r, _ = rasterize(
        means, quats, scales, opa, sh, jnp.eye(4), K, w, h,
        sh_degree=1, render_mode="RGB+ED", backend="reference",
    )
    c = np.asarray(r[8, 8])
    assert c[0] > 0.95 and c[2] < 0.05  # red wins
    # residual transmittance (1 - alpha_near) lets the far splat bleed a
    # little into the expected depth — gsplat semantics, not a bug.
    np.testing.assert_allclose(c[3], 1.5, atol=0.05)


def test_pose_gradients_match_finite_differences():
    # FD validation needs the smooth regime: the rasterizer's hard gates
    # (alpha < 1/255 cutoff -> expected depth jumping 0 -> d at splat
    # boundaries, 0.999 ceiling, T-stop, culling) make the loss only
    # piecewise-smooth — true of the reference CUDA rasterizer as well.
    # Use a handful of big overlapping splats that cover the whole image
    # with alpha far from every threshold.
    rng = np.random.default_rng(3)
    n, h, w = 6, 16, 16
    pts = np.stack(
        [rng.uniform(-0.3, 0.3, n), rng.uniform(-0.3, 0.3, n), rng.uniform(2.2, 3.0, n)],
        axis=1,
    ).astype(np.float32)
    rgb = rng.uniform(0.2, 0.8, (n, 3)).astype(np.float32)
    scene = scene_from_point_cloud(jnp.asarray(pts), jnp.asarray(rgb))
    scene = scene._replace(
        scales=jnp.full_like(scene.scales, 2.0),  # footprint >> image
        opacities=jnp.full_like(scene.opacities, 0.5),
    )
    K = camera.intrinsics_matrix(20.0, 20.0, w / 2 - 0.5, h / 2 - 0.5)
    target, _ = _render(scene, jnp.eye(4), K, h, w, "ED")
    target = jax.lax.stop_gradient(target) * 1.02  # avoid zero-grad optimum

    def loss_at(quat, trans):
        pose = PoseState(quat=quat, trans=trans)
        vm = invert_se3(pose.to_c2w())
        r, _ = _render(scene, vm, K, h, w, "ED")
        return jnp.mean((r - target) ** 2)

    q0 = jnp.array([0.9995, 0.008, -0.006, 0.007])
    t0 = jnp.array([0.004, -0.006, 0.008])
    g_q, g_t = jax.grad(loss_at, argnums=(0, 1))(q0, t0)
    g = np.concatenate([np.asarray(g_q), np.asarray(g_t)])

    eps = 1e-3
    fd = []
    for i in range(4):
        dq = jnp.zeros(4).at[i].set(eps)
        fd.append(float((loss_at(q0 + dq, t0) - loss_at(q0 - dq, t0)) / (2 * eps)))
    for i in range(3):
        dt = jnp.zeros(3).at[i].set(eps)
        fd.append(float((loss_at(q0, t0 + dt) - loss_at(q0, t0 - dt)) / (2 * eps)))
    fd = np.asarray(fd)
    scale = np.abs(fd).max()
    assert scale > 1e-5  # the test must actually exercise nonzero gradients
    np.testing.assert_allclose(g, fd, rtol=0.05, atol=0.02 * scale)
