"""Native C++ library (KdTree/kNN/normals/voxel/registration) + ICP tracker."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from gsplatloc_tpu import native


@pytest.fixture(scope="module")
def lib():
    native.build_library()
    return native


def _surface_cloud(n_side=50, noise=0.002, seed=1):
    rng = np.random.default_rng(seed)
    x, y = np.meshgrid(np.linspace(-1, 1, n_side), np.linspace(-1, 1, n_side))
    z = 0.3 * np.sin(2 * x) + 0.2 * np.cos(3 * y)
    pts = np.stack([x.ravel(), y.ravel(), z.ravel()], 1)
    return pts + rng.normal(0, noise, pts.shape)


def test_kdtree_knn_exact(lib, rng):
    from scipy.spatial import cKDTree

    pts = rng.normal(size=(3000, 3))
    tree = lib.KdTree(pts)
    idx, d2 = tree.batch_knn_search(pts, 6)
    ck = cKDTree(pts)
    d, i = ck.query(pts, k=6)
    assert (idx == i).all()
    np.testing.assert_allclose(d2, d**2, rtol=1e-10)


def test_normals_on_plane(lib, rng):
    # flat plane -> normals along z
    pts = np.stack([rng.uniform(-1, 1, 2000), rng.uniform(-1, 1, 2000),
                    np.zeros(2000)], 1)
    tree = lib.KdTree(pts)
    normals, covs = tree.estimate_normals_covariances(10)
    assert np.abs(normals[:, 2]).min() > 0.999
    # plane-regularized covariance: smallest eigenvalue ~ eps * others
    w = np.linalg.eigvalsh(covs[0])
    assert w[0] < 0.01 * w[2]


def test_voxel_downsample(lib, rng):
    pts = rng.uniform(0, 1, (5000, 3))
    down = lib.voxel_downsample(pts, 0.25)
    assert 30 <= down.shape[0] <= 64  # 4x4x4 grid
    # centroids stay inside the unit cube
    assert down.min() >= 0 and down.max() <= 1


@pytest.mark.parametrize("rtype", ["ICP", "PLANE_ICP", "GICP"])
def test_registration_recovers_transform(lib, rtype):
    tgt = _surface_cloud()
    T_true = np.eye(4)
    T_true[:3, :3] = Rotation.from_euler(
        "xyz", [0.5, -0.4, 0.3], degrees=True
    ).as_matrix()
    T_true[:3, 3] = [0.01, -0.008, 0.012]
    inv = np.linalg.inv(T_true)
    src = tgt @ inv[:3, :3].T + inv[:3, 3]
    res = lib.align(tgt, src, registration_type=rtype,
                    max_correspondence_distance=0.3, max_iterations=50)
    err_t = np.linalg.norm(res.T_target_source[:3, 3] - T_true[:3, 3])
    dR = res.T_target_source[:3, :3] @ T_true[:3, :3].T
    err_r = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert err_t < 1e-3, (rtype, err_t)
    assert err_r < 0.05, (rtype, err_r)
    assert res.inliers == tgt.shape[0]


def test_icp_experiment_on_synthetic(tmp_path):
    from gsplatloc_tpu.data.datasets import SyntheticBoxRoom
    from gsplatloc_tpu.tracking.icp import ICPExperiment

    ds = SyntheticBoxRoom(n_frames=5, height=48, width=64, speed=2.0)
    exp = ICPExperiment(ds, registration_type="GICP",
                        run_dir=tmp_path / "icp", max_images=5)
    out = exp.run()
    assert len(out["eT"]) == 4
    # per-frame GT-init alignment on clean synthetic depth: sub-cm error
    assert out["ate_rmse"] < 0.02, out["ate_rmse"]


def test_icp_sweep_ledger(tmp_path):
    from gsplatloc_tpu.data.datasets import SyntheticBoxRoom
    from gsplatloc_tpu.tracking.icp import run_icp_sweep

    def factory(scene):
        return SyntheticBoxRoom(n_frames=3, height=32, width=48)

    res1 = run_icp_sweep(factory, ["roomA"], methods=["ICP"],
                         run_root=tmp_path / "sweep", max_images=3)
    assert ("roomA", "ICP") in res1
    # second run resumes: nothing re-run
    res2 = run_icp_sweep(factory, ["roomA"], methods=["ICP"],
                         run_root=tmp_path / "sweep", max_images=3)
    assert res2 == {}


def test_colored_icp_constrains_flat_plane(lib):
    # flat plane: geometry leaves lateral translation free; the color term
    # pins it exactly
    x, y = np.meshgrid(np.linspace(-1, 1, 60), np.linspace(-1, 1, 60))
    tgt = np.stack([x.ravel(), y.ravel(), np.zeros(3600)], 1)
    col = (0.5 + 0.5 * np.sin(6 * x) * np.cos(5 * y)).ravel()
    T_true = np.eye(4)
    T_true[:3, 3] = [0.02, -0.015, 0.0]
    inv = np.linalg.inv(T_true)
    src = tgt @ inv[:3, :3].T + inv[:3, 3]
    res_c = lib.align_colored(tgt, src, col, col,
                              max_correspondence_distance=0.3)
    res_p = lib.align(tgt, src, registration_type="PLANE_ICP",
                      max_correspondence_distance=0.3, max_iterations=30)
    eT_c = np.linalg.norm(res_c.T_target_source[:3, 3] - T_true[:3, 3])
    eT_p = np.linalg.norm(res_p.T_target_source[:3, 3] - T_true[:3, 3])
    assert eT_c < 1e-6
    assert eT_p > 0.02  # plane ICP cannot observe the slide


@pytest.mark.parametrize("rtype", ["COLORED_ICP", "HYBRID"])
def test_icp_experiment_new_methods(tmp_path, rtype):
    from gsplatloc_tpu.data.datasets import SyntheticBoxRoom
    from gsplatloc_tpu.tracking.icp import ICPExperiment

    ds = SyntheticBoxRoom(n_frames=4, height=48, width=64, speed=2.0)
    exp = ICPExperiment(ds, registration_type=rtype,
                        run_dir=tmp_path / rtype, max_images=4)
    out = exp.run()
    assert len(out["eT"]) == 3
    assert out["ate_rmse"] < 0.05, (rtype, out["ate_rmse"])
