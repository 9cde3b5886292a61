"""Trajectory path generation, outlier removal, recorded optimization,
antialiased projection, PointCloud wrapper."""

import jax.numpy as jnp
import numpy as np

from gsplatloc_tpu.data import traj


def _ring_poses(n=12, r=2.0):
    poses = []
    for th in np.linspace(0, 2 * np.pi, n, endpoint=False):
        p = np.array([r * np.cos(th), r * np.sin(th), 0.5])
        m = traj.viewmatrix(-p, np.array([0.0, 0.0, 1.0]), p)
        poses.append(m)
    return np.stack(poses)


def test_viewmatrix_orthonormal():
    m = traj.viewmatrix(np.array([0.0, 0, 1]), np.array([0.0, 1, 0]),
                        np.array([1.0, 2, 3]))
    R = m[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(m[:3, 3], [1, 2, 3])


def test_focus_point_of_ring():
    poses = _ring_poses()
    f = traj.focus_point_fn(poses)
    # cameras on a ring looking at the origin-ish axis
    assert np.linalg.norm(f[:2]) < 0.2


def test_ellipse_paths():
    poses = _ring_poses()
    pz = traj.generate_ellipse_path_z(poses, n_frames=24)
    py = traj.generate_ellipse_path_y(poses, n_frames=16)
    assert pz.shape == (24, 4, 4) and py.shape == (16, 4, 4)
    for m in pz[:3]:
        R = m[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)


def test_interpolated_path_passes_near_keyframes():
    poses = _ring_poses(5)
    out = traj.generate_interpolated_path(poses, n_interp=10)
    assert out.shape == (40, 4, 4)
    # spline stays in the neighborhood of the control polygon
    d = np.linalg.norm(out[:, :3, 3], axis=1)
    assert d.min() > 1.0 and d.max() < 2.5


def test_remove_outliers():
    from gsplatloc_tpu.ops.knn import remove_outliers

    rng = np.random.default_rng(0)
    pts = rng.normal(0, 0.01, (500, 3)).astype(np.float32)
    pts[0] = [50.0, 50.0, 50.0]  # gross outlier
    mask, thr = remove_outliers(jnp.asarray(pts), k=8, std_ratio=5.0)
    mask = np.asarray(mask)
    assert not mask[0]
    assert mask[1:].mean() > 0.99


def test_optimize_pose_recorded_series():
    from gsplatloc_tpu.data.synthetic import random_gaussian_cloud
    from gsplatloc_tpu.models.gaussians import scene_from_point_cloud
    from gsplatloc_tpu.ops import camera
    from gsplatloc_tpu.ops.lie import invert_se3
    from gsplatloc_tpu.ops.rasterize import rasterize
    from gsplatloc_tpu.opt.tracking import TrackingConfig, optimize_pose_recorded

    rng = np.random.default_rng(2)
    pts, rgb = random_gaussian_cloud(rng, 300)
    scene = scene_from_point_cloud(jnp.asarray(pts), jnp.asarray(rgb))
    scene = scene._replace(scales=jnp.full_like(scene.scales, 0.07))
    h, w = 24, 32
    K = camera.intrinsics_matrix(40.0, 40.0, w / 2 - 0.5, h / 2 - 0.5)
    gt = jnp.eye(4).at[0, 3].set(0.01)
    d, _ = rasterize(scene.means, scene.quats, scene.scales, scene.opacities,
                     scene.sh_coeffs, invert_se3(gt), K, w, h, sh_degree=1,
                     render_mode="ED", backend="reference")
    series = optimize_pose_recorded(
        scene, jnp.eye(4), d[..., 0], K, w, h, n_steps=40,
        config=TrackingConfig(max_steps=40), backend="reference",
    )
    losses = np.asarray(series["loss"])
    assert losses.shape == (40,)
    assert losses[-1] < losses[0] * 0.8  # descending


def test_antialiased_projection():
    from gsplatloc_tpu.ops.projection import project_gaussians

    means = jnp.array([[0.0, 0.0, 2.0]])
    quats = jnp.array([[1.0, 0, 0, 0]])
    K = jnp.array([[50.0, 0, 16], [0, 50.0, 16], [0, 0, 1]])
    # tiny gaussian: dilation dominates -> strong compensation
    p_small = project_gaussians(means, quats, jnp.full((1, 3), 1e-3),
                                jnp.eye(4), K, 32, 32, antialiased=True)
    # large gaussian: compensation ~ 1
    p_big = project_gaussians(means, quats, jnp.full((1, 3), 1.0),
                              jnp.eye(4), K, 32, 32, antialiased=True)
    assert float(p_small.opacity_comp[0]) < 0.05
    assert float(p_big.opacity_comp[0]) > 0.95
    p_classic = project_gaussians(means, quats, jnp.full((1, 3), 1.0),
                                  jnp.eye(4), K, 32, 32)
    assert p_classic.opacity_comp is None


def test_native_pointcloud_wrapper():
    from gsplatloc_tpu import native

    rng = np.random.default_rng(1)
    pts = rng.normal(size=(800, 3))
    pc = native.PointCloud(pts).preprocess(knn=10)
    assert len(pc) == 800
    assert pc.normals.shape == (800, 3)
    assert pc.covs.shape == (800, 3, 3)
    down = pc.downsample(0.5)
    assert 0 < len(down) < 800
