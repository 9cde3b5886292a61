"""Tests for camera back-projection, normals, Sobel, PCA, kNN, metrics."""

import jax.numpy as jnp
import numpy as np

from gsplatloc_tpu.eval import metrics
from gsplatloc_tpu.ops import camera, filters, knn, pca


def _K():
    return camera.intrinsics_matrix(100.0, 100.0, 31.5, 23.5)


def test_depth_to_points_pinhole_inverse():
    H, W = 48, 64
    K = _K()
    depth = jnp.full((H, W), 2.0)
    pts = camera.depth_to_points(depth, K)
    assert pts.shape == (H * W, 3)
    # reproject: u = fx*x/z + cx should recover integer grid
    u = 100.0 * pts[:, 0] / pts[:, 2] + 31.5
    v = 100.0 * pts[:, 1] / pts[:, 2] + 23.5
    uu, vv = np.meshgrid(np.arange(W), np.arange(H))
    np.testing.assert_allclose(np.asarray(u).reshape(H, W), uu, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v).reshape(H, W), vv, atol=1e-4)


def test_depth_to_normal_flat_plane():
    H, W = 32, 32
    K = _K()
    depth = jnp.full((H, W), 3.0)
    n = camera.depth_to_normal(depth, K)
    # A fronto-parallel plane has normals along -+z; interior pixels consistent.
    interior = np.asarray(n[4:-4, 4:-4])
    assert np.all(np.abs(interior[..., 2]) > 0.99)


def test_sobel_magnitude_step_edge():
    img = jnp.zeros((16, 16)).at[:, 8:].set(1.0)
    mag = np.asarray(filters.sobel_magnitude(img))
    # edge columns (7, 8) light up, far columns ~ sqrt(eps)
    assert mag[8, 7] > 0.4
    assert mag[8, 8] > 0.4
    assert mag[8, 2] < 1e-2
    # kornia normalization: interior step edge magnitude = 4/8 = 0.5
    np.testing.assert_allclose(mag[8, 7], 0.5, atol=1e-3)


def test_sobel_matches_manual_conv(rng):
    img = jnp.asarray(rng.normal(size=(20, 24)), jnp.float32)
    mag = np.asarray(filters.sobel_magnitude(img))
    # manual check at an interior pixel
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float64) / 8.0
    patch = np.asarray(img)[7:10, 9:12]
    gx = np.sum(patch * kx)
    gy = np.sum(patch * kx.T)
    np.testing.assert_allclose(mag[8, 10], np.sqrt(gx**2 + gy**2 + 1e-6), rtol=1e-4)


def test_pca_align_principal_axes(rng):
    # anisotropic cloud rotated by a known rotation
    base = rng.normal(size=(5000, 3)) * np.array([10.0, 2.0, 0.5])
    from scipy.spatial.transform import Rotation

    R = Rotation.from_euler("xyz", [0.3, -0.5, 0.9]).as_matrix()
    pts = base @ R.T + np.array([5.0, -3.0, 2.0])
    T = np.asarray(pca.align_principal_axes(jnp.asarray(pts, jnp.float32)))
    aligned = pts @ T[:3, :3].T + T[:3, 3]
    cov = np.cov(aligned.T)
    # covariance should be (nearly) diagonal with descending diagonal
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 0.05 * np.diag(cov).max()
    d = np.diag(cov)
    assert d[0] > d[1] > d[2]
    # rotation is orthonormal with det +1
    np.testing.assert_allclose(T[:3, :3] @ T[:3, :3].T, np.eye(3), atol=1e-5)
    assert np.linalg.det(T[:3, :3]) > 0


def test_normalize_pair_scale_factor(rng):
    pts = rng.normal(size=(2000, 3)).astype(np.float32)
    pose = np.eye(4, dtype=np.float32)
    tar2, src2, tpose, spose, factor = pca.normalize_pair(
        jnp.asarray(pts), jnp.asarray(pts) + 0.01, jnp.asarray(pose), jnp.asarray(pose)
    )
    # rigid transform of a rigid pose keeps scale 1
    np.testing.assert_allclose(float(factor), 1.0, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(tpose[:3, :3]) @ np.asarray(tpose[:3, :3]).T, np.eye(3), atol=1e-5
    )


def test_knn_vs_exact_kdtree(rng):
    from scipy.spatial import cKDTree

    H, W = 12, 16
    depth = 2.0 + 0.05 * rng.normal(size=(H, W)).astype(np.float32)
    K = _K()
    pts = camera.depth_to_points(jnp.asarray(depth), K)
    grid = pts.reshape(H, W, 3)
    d2_grid = np.asarray(knn.grid_knn_sq_dists(grid, k=5, window=3))
    d2_brute = np.asarray(knn.brute_knn_sq_dists(pts, k=5, block=64))
    tree = cKDTree(np.asarray(pts, np.float64))
    d, _ = tree.query(np.asarray(pts, np.float64), k=5)
    d2_exact = d**2
    # brute force is exact
    np.testing.assert_allclose(d2_brute, d2_exact, rtol=1e-3, atol=1e-9)
    # windowed grid kNN is approximate only at image borders under noise:
    # require >=99% exact agreement and small overall error
    match = np.isclose(d2_grid, d2_exact, rtol=1e-3, atol=1e-9)
    assert match.mean() > 0.99
    assert np.abs(d2_grid - d2_exact).max() < 5e-3


def test_init_gs_scales_quirk():
    d2 = jnp.array([[0.0, 4.0, 4.0, 4.0, 4.0]])  # sq dists (d=2)
    s = knn.init_gs_scales_from_sq_dists(d2)
    # quirk: sqrt(mean((d^2)^2)) = d^2 = 4
    np.testing.assert_allclose(np.asarray(s), 4.0, rtol=1e-5)
    s2 = knn.init_gs_scales_from_sq_dists(d2, squared_quirk=False)
    np.testing.assert_allclose(np.asarray(s2), 2.0, rtol=1e-5)


def test_init_gs_scales_robust_clamp():
    """Isolated-fragment splats (office2 fixture frame 13: 3 corner
    pixels whose 5-NN sit 130x the p99.99 distance) are clamped at
    q99 * clamp_ratio; healthy scales are BIT-identical with the clamp
    on vs off (the threshold only engages on extreme tails)."""
    rng = np.random.default_rng(0)
    d2 = rng.uniform(1e-5, 4e-5, (4096, 5)).astype(np.float32)
    d2[:, 0] = 0.0
    d2_out = d2.copy()
    d2_out[7, 1:] = 0.28  # d ~ 0.53 m vs ~5 mm healthy
    s_clean = knn.init_gs_scales_from_sq_dists(jnp.asarray(d2))
    s_clean_off = knn.init_gs_scales_from_sq_dists(
        jnp.asarray(d2), clamp_quantile=None)
    np.testing.assert_array_equal(np.asarray(s_clean),
                                  np.asarray(s_clean_off))
    s_out = np.asarray(knn.init_gs_scales_from_sq_dists(jnp.asarray(d2_out)))
    s_raw = np.asarray(knn.init_gs_scales_from_sq_dists(
        jnp.asarray(d2_out), clamp_quantile=None))
    assert s_raw[7, 0] > 0.07  # the quirked outlier scale, unclamped
    # the actual documented bound: q99 of the RAW scales * clamp_ratio
    cap = np.quantile(s_raw[:, 0], 0.99) * 64.0
    np.testing.assert_allclose(s_out[7, 0], cap, rtol=1e-4)  # f32 quantile
    assert s_out[7, 0] < 0.01  # clamped to the healthy-tail class
    mask = np.ones(4096, bool)
    mask[7] = False
    np.testing.assert_array_equal(s_out[mask], s_raw[mask])
    # observability hook reports exactly the one engaged clamp
    assert int(knn.count_clamped_scales(jnp.asarray(d2_out))) == 1
    assert int(knn.count_clamped_scales(jnp.asarray(d2))) == 0


def test_pose_errors():
    from scipy.spatial.transform import Rotation

    T1 = np.eye(4, dtype=np.float32)
    T2 = np.eye(4, dtype=np.float32)
    T2[:3, :3] = Rotation.from_euler("z", 10, degrees=True).as_matrix()
    T2[:3, 3] = [3.0, 4.0, 0.0]
    eT = float(metrics.translation_error(jnp.asarray(T2), jnp.asarray(T1)))
    eR = float(metrics.rotation_error_deg(jnp.asarray(T2), jnp.asarray(T1)))
    np.testing.assert_allclose(eT, 5.0, rtol=1e-5)
    np.testing.assert_allclose(eR, 10.0, rtol=1e-4)
    assert metrics.rmse([3.0, 4.0]) == np.sqrt(12.5)


def test_ssim_psnr_sanity(rng):
    img = jnp.asarray(rng.uniform(size=(32, 32, 3)), jnp.float32)
    assert float(filters.ssim(img, img)) > 0.999
    assert float(filters.psnr(img, img)) > 90.0
    noisy = img + 0.1 * jnp.asarray(rng.normal(size=(32, 32, 3)), jnp.float32)
    assert float(filters.ssim(img, noisy)) < 0.95


class TestLpips:
    def test_lpips_properties(self):
        import jax, jax.numpy as jnp, numpy as np
        from gsplatloc_tpu.eval.lpips import lpips, random_lpips_params

        params = random_lpips_params(0)
        rng = np.random.default_rng(5)
        a = jnp.asarray(rng.random((64, 96, 3)), jnp.float32)
        b = jnp.asarray(rng.random((64, 96, 3)), jnp.float32)
        f = jax.jit(lambda x, y: lpips(x, y, params))
        assert float(f(a, a)) < 1e-10
        dab = float(f(a, b))
        assert dab > 0 and np.isfinite(dab)
        assert abs(dab - float(f(b, a))) < 1e-6  # symmetric
        batched = f(jnp.stack([a, a]), jnp.stack([a, b]))
        np.testing.assert_allclose(
            np.asarray(batched), [0.0, dab], atol=1e-6)

    def test_lpips_save_load_roundtrip(self, tmp_path):
        import numpy as np, jax.numpy as jnp
        from gsplatloc_tpu.eval.lpips import (
            load_lpips_params, lpips, random_lpips_params)

        p = random_lpips_params(1)
        path = tmp_path / "lpips.npz"
        np.savez(
            path,
            **{f"conv{i}_w": np.asarray(w) for i, (w, _b) in enumerate(p["convs"])},
            **{f"conv{i}_b": np.asarray(b) for i, (_w, b) in enumerate(p["convs"])},
            **{f"lin{i}_w": np.asarray(l) for i, l in enumerate(p["lins"])},
        )
        p2 = load_lpips_params(str(path))
        rng = np.random.default_rng(6)
        a = jnp.asarray(rng.random((40, 56, 3)), jnp.float32)
        b = jnp.asarray(rng.random((40, 56, 3)), jnp.float32)
        assert abs(float(lpips(a, b, p)) - float(lpips(a, b, p2))) < 1e-7


def test_sobel_stencil_matches_conv_impl():
    """The shift-add stencil Sobel must match the conv formulation bitwise-
    nearly (same f32 adds, different association) including at borders."""
    import numpy as np, jax.numpy as jnp
    from gsplatloc_tpu.ops import filters

    rng = np.random.default_rng(12)
    img = jnp.asarray(rng.standard_normal((37, 53)), jnp.float32)
    a = np.asarray(filters.sobel_magnitude(img))
    b = np.asarray(filters._sobel_magnitude_conv(img))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_pca_median_torch_semantics():
    """Even-N centroid must be the LOWER middle element per axis
    (torch.median), not the interpolated midpoint (np.median)."""
    import numpy as np, jax.numpy as jnp
    from gsplatloc_tpu.ops.pca import align_principal_axes

    pts = jnp.asarray(
        np.stack([[1.0, 2.0, 10.0, 11.0]] * 3, axis=1), jnp.float32)
    T = align_principal_axes(pts)
    R = np.asarray(T[:3, :3])
    t = np.asarray(T[:3, 3])
    centroid = -R.T @ t  # T maps x -> R(x - centroid)
    np.testing.assert_allclose(centroid, [2.0, 2.0, 2.0], atol=1e-5)


def test_remove_outliers_sample_std():
    """Threshold uses torch's sample std (ddof=1)."""
    import numpy as np, jax.numpy as jnp
    from gsplatloc_tpu.ops.knn import remove_outliers

    rng = np.random.default_rng(4)
    pts = jnp.asarray(rng.standard_normal((64, 3)), jnp.float32)
    _, threshold = remove_outliers(pts, k=5, std_ratio=2.0)
    from gsplatloc_tpu.ops.knn import brute_knn_sq_dists
    d2 = np.asarray(brute_knn_sq_dists(pts, 5))
    dist_avg = np.sqrt(np.mean(d2[:, 1:] ** 2, axis=-1))
    want = dist_avg.mean() + 2.0 * dist_avg.std(ddof=1)
    np.testing.assert_allclose(float(threshold), want, rtol=1e-5)


def test_antialiased_opacity_compensation_applied():
    """antialiased=True must scale opacities by the pre/post-dilation
    determinant ratio (sub-pixel splats render dimmer than classic)."""
    import numpy as np, jax.numpy as jnp
    from gsplatloc_tpu.data.synthetic import random_gaussian_cloud
    from gsplatloc_tpu.models.gaussians import scene_from_point_cloud
    from gsplatloc_tpu.ops import camera
    from gsplatloc_tpu.ops.lie import invert_se3
    from gsplatloc_tpu.ops.rasterize import rasterize

    rng = np.random.default_rng(3)
    pts, rgb = random_gaussian_cloud(rng, 300)
    s = scene_from_point_cloud(jnp.asarray(pts), jnp.asarray(rgb))
    s = s._replace(scales=jnp.full_like(s.scales, 0.01))  # sub-pixel
    K = camera.intrinsics_matrix(48.0, 48.0, 31.5, 23.5)
    args = (s.means, s.quats, s.scales, s.opacities, s.sh_coeffs,
            invert_se3(jnp.eye(4)), K, 64, 48)
    _, al1 = rasterize(*args, sh_degree=1, render_mode="ED",
                       backend="reference")
    _, al2 = rasterize(*args, sh_degree=1, render_mode="ED",
                       backend="reference", antialiased=True)
    assert float(jnp.max(al1 - al2)) > 0.05  # compensation dims coverage
    assert float(jnp.min(al2)) >= 0.0
