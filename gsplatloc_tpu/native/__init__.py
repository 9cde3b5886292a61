"""ctypes bindings + build for the native C++ point-cloud library.

small_gicp-surface parity (SURVEY.md §2.2): PointCloud/KdTree/batch kNN
(squared distances), estimate_normals_covariances, voxel downsampling, and
align() with ICP / PLANE_ICP / GICP. Built on demand with g++ -O3 -fopenmp
(no pip/pybind11 — plain shared library + ctypes).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "src"
_BUILD = Path(__file__).parent / "build"
_LIB = _BUILD / "libgsplatloc_native.so"

REG_TYPES = {"ICP": 0, "PLANE_ICP": 1, "GICP": 2, "COLORED_ICP": 3}


def build_library(force: bool = False) -> Path:
    srcs = sorted(_SRC.glob("*.cc"))
    hdrs = sorted(_SRC.glob("*.h"))
    if _LIB.exists() and not force:
        newest_src = max(p.stat().st_mtime for p in srcs + hdrs)
        if _LIB.stat().st_mtime >= newest_src:
            return _LIB
    _BUILD.mkdir(exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
        "-fopenmp", f"-I{_SRC}", *map(str, srcs), "-o", str(_LIB),
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"native build failed ({' '.join(cmd)}):\n{proc.stderr}"
        )
    return _LIB


_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(str(build_library()))
    c_dp = ctypes.POINTER(ctypes.c_double)
    c_ip = ctypes.POINTER(ctypes.c_int32)
    lib.gs_kdtree_build.restype = ctypes.c_void_p
    lib.gs_kdtree_build.argtypes = [c_dp, ctypes.c_int64]
    lib.gs_kdtree_free.argtypes = [ctypes.c_void_p]
    lib.gs_kdtree_batch_knn.argtypes = [
        ctypes.c_void_p, c_dp, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        c_ip, c_dp,
    ]
    lib.gs_estimate_normals_covs.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, c_dp, c_dp,
    ]
    lib.gs_voxel_downsample.restype = ctypes.c_int64
    lib.gs_voxel_downsample.argtypes = [
        c_dp, ctypes.c_int64, ctypes.c_double, c_dp, ctypes.c_int64,
    ]
    lib.gs_register.argtypes = [
        ctypes.c_void_p, c_dp, ctypes.c_int64, c_dp, ctypes.c_int64,
        c_dp, c_dp, c_dp, ctypes.c_int32, c_dp, ctypes.c_double,
        ctypes.c_int32, ctypes.c_int32, c_dp, c_dp, c_ip, c_ip,
    ]
    lib.gs_estimate_color_gradients.argtypes = [
        ctypes.c_void_p, c_dp, c_dp, ctypes.c_int32, ctypes.c_int32, c_dp,
    ]
    lib.gs_register_colored.argtypes = [
        ctypes.c_void_p, c_dp, ctypes.c_int64, c_dp, ctypes.c_int64,
        c_dp, c_dp, c_dp, c_dp, ctypes.c_double, c_dp, ctypes.c_double,
        ctypes.c_int32, ctypes.c_int32, c_dp, c_dp, c_ip, c_ip,
    ]
    _lib = lib
    return lib


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class KdTree:
    """Parallel KdTree over an (N, 3) float64 cloud (small_gicp.KdTree parity)."""

    def __init__(self, points: np.ndarray, num_threads: int = 4):
        self._lib = _load()
        self.points = np.ascontiguousarray(points, np.float64)
        if self.points.ndim != 2 or self.points.shape[1] != 3:
            raise ValueError("points must be (N, 3)")
        self._handle = self._lib.gs_kdtree_build(
            _dptr(self.points), self.points.shape[0]
        )
        self.num_threads = num_threads

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.gs_kdtree_free(self._handle)
            self._handle = None

    def batch_knn_search(self, queries: np.ndarray, k: int,
                         num_threads: int | None = None):
        """-> (indices (Q, k) int32, SQUARED distances (Q, k) float64) —
        small_gicp batch_knn_search convention (squared!)."""
        q = np.ascontiguousarray(queries, np.float64)
        nq = q.shape[0]
        idx = np.empty((nq, k), np.int32)
        d2 = np.empty((nq, k), np.float64)
        self._lib.gs_kdtree_batch_knn(
            self._handle, _dptr(q), nq, k,
            num_threads or self.num_threads,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), _dptr(d2),
        )
        return idx, d2

    def estimate_normals_covariances(self, k: int = 20,
                                     num_threads: int | None = None):
        """-> (normals (N, 3), covariances (N, 3, 3)) — GICP plane-regularized."""
        n = self.points.shape[0]
        normals = np.empty((n, 3), np.float64)
        covs = np.empty((n, 3, 3), np.float64)
        self._lib.gs_estimate_normals_covs(
            self._handle, k, num_threads or self.num_threads,
            _dptr(normals), _dptr(covs),
        )
        return normals, covs


def voxel_downsample(points: np.ndarray, resolution: float) -> np.ndarray:
    """Voxel-grid centroid downsampling (small_gicp preprocess_points parity)."""
    lib = _load()
    p = np.ascontiguousarray(points, np.float64)
    out = np.empty_like(p)
    m = lib.gs_voxel_downsample(_dptr(p), p.shape[0], resolution, _dptr(out),
                                p.shape[0])
    return out[:m].copy()


class RegistrationResult:
    def __init__(self, T, error, iterations, inliers):
        self.T_target_source = T
        self.error = error
        self.iterations = iterations
        self.inliers = inliers


def align(
    target: np.ndarray,
    source: np.ndarray,
    target_tree: KdTree | None = None,
    init_T_target_source: np.ndarray | None = None,
    max_correspondence_distance: float = 0.1,
    registration_type: str = "GICP",
    num_threads: int = 4,
    max_iterations: int = 20,
    knn: int = 20,
    target_normals: np.ndarray | None = None,
    target_covs: np.ndarray | None = None,
    source_covs: np.ndarray | None = None,
) -> RegistrationResult:
    """small_gicp.align parity: estimates T_target_source by GN ICP/GICP.

    Missing normals/covariances are estimated on the fly (kNN PCA).
    """
    lib = _load()
    tgt = np.ascontiguousarray(target, np.float64)
    src = np.ascontiguousarray(source, np.float64)
    tree = target_tree or KdTree(tgt, num_threads)
    rtype = REG_TYPES[registration_type]

    if rtype == 1 and target_normals is None:
        target_normals, _ = tree.estimate_normals_covariances(knn, num_threads)
    if rtype == 2:
        if target_covs is None:
            _, target_covs = tree.estimate_normals_covariances(knn, num_threads)
        if source_covs is None:
            src_tree = KdTree(src, num_threads)
            _, source_covs = src_tree.estimate_normals_covariances(
                knn, num_threads
            )

    init = (np.eye(4) if init_T_target_source is None
            else np.asarray(init_T_target_source, np.float64))
    init = np.ascontiguousarray(init, np.float64)
    out_T = np.empty((4, 4), np.float64)
    err = ctypes.c_double()
    iters = ctypes.c_int32()
    inliers = ctypes.c_int32()

    tn = (np.ascontiguousarray(target_normals, np.float64)
          if target_normals is not None else None)
    tc = (np.ascontiguousarray(target_covs, np.float64)
          if target_covs is not None else None)
    sc = (np.ascontiguousarray(source_covs, np.float64)
          if source_covs is not None else None)
    lib.gs_register(
        tree._handle, _dptr(tgt), tgt.shape[0], _dptr(src), src.shape[0],
        _dptr(tn) if tn is not None else None,
        _dptr(tc) if tc is not None else None,
        _dptr(sc) if sc is not None else None,
        rtype, _dptr(init), max_correspondence_distance, max_iterations,
        num_threads, _dptr(out_T), ctypes.byref(err), ctypes.byref(iters),
        ctypes.byref(inliers),
    )
    return RegistrationResult(out_T, err.value, iters.value, inliers.value)


def estimate_color_gradients(tree: "KdTree", colors: np.ndarray,
                             normals: np.ndarray, k: int = 20,
                             num_threads: int = 4) -> np.ndarray:
    """Per-point tangent-plane intensity gradients (colored ICP precompute)."""
    lib = _load()
    n = tree.points.shape[0]
    grads = np.empty((n, 3), np.float64)
    c = np.ascontiguousarray(colors, np.float64)
    nr = np.ascontiguousarray(normals, np.float64)
    lib.gs_estimate_color_gradients(tree._handle, _dptr(c), _dptr(nr), k,
                                    num_threads, _dptr(grads))
    return grads


def align_colored(
    target: np.ndarray,
    source: np.ndarray,
    target_colors: np.ndarray,  # (nt,) intensity in [0,1]
    source_colors: np.ndarray,  # (ns,)
    target_tree: KdTree | None = None,
    init_T_target_source: np.ndarray | None = None,
    max_correspondence_distance: float = 0.1,
    lambda_geometric: float = 0.968,
    num_threads: int = 4,
    max_iterations: int = 30,
    knn: int = 20,
) -> RegistrationResult:
    """Colored ICP (Park et al.; Open3D registration_colored_icp parity):
    point-to-plane + tangent-plane color term."""
    lib = _load()
    tgt = np.ascontiguousarray(target, np.float64)
    src = np.ascontiguousarray(source, np.float64)
    tree = target_tree or KdTree(tgt, num_threads)
    normals, _ = tree.estimate_normals_covariances(knn, num_threads)
    grads = estimate_color_gradients(tree, target_colors, normals, knn,
                                     num_threads)
    init = (np.eye(4) if init_T_target_source is None
            else np.asarray(init_T_target_source, np.float64))
    init = np.ascontiguousarray(init, np.float64)
    out_T = np.empty((4, 4), np.float64)
    err = ctypes.c_double()
    iters = ctypes.c_int32()
    inliers = ctypes.c_int32()
    tc = np.ascontiguousarray(target_colors, np.float64)
    sc = np.ascontiguousarray(source_colors, np.float64)
    nr = np.ascontiguousarray(normals, np.float64)
    lib.gs_register_colored(
        tree._handle, _dptr(tgt), tgt.shape[0], _dptr(src), src.shape[0],
        _dptr(nr), _dptr(tc), _dptr(grads), _dptr(sc), lambda_geometric,
        _dptr(init), max_correspondence_distance, max_iterations, num_threads,
        _dptr(out_T), ctypes.byref(err), ctypes.byref(iters),
        ctypes.byref(inliers),
    )
    return RegistrationResult(out_T, err.value, iters.value, inliers.value)


class PointCloud:
    """OO wrapper bundling points + KdTree + normals/covariances — parity
    with the reference's PointClouds wrapper over small_gicp
    (src/data/pcd.py:6-111: preprocess(knn) builds the tree and estimates
    normals + covariances)."""

    def __init__(self, points: np.ndarray, num_threads: int = 4):
        self.points = np.ascontiguousarray(points[:, :3], np.float64)
        self.num_threads = num_threads
        self.tree: KdTree | None = None
        self.normals: np.ndarray | None = None
        self.covs: np.ndarray | None = None

    def __len__(self):
        return self.points.shape[0]

    def preprocess(self, knn: int = 20):
        """Build KdTree + estimate normals/covariances (pcd.py:33-38)."""
        self.tree = KdTree(self.points, self.num_threads)
        self.normals, self.covs = self.tree.estimate_normals_covariances(
            knn, self.num_threads
        )
        return self

    def downsample(self, resolution: float) -> "PointCloud":
        return PointCloud(voxel_downsample(self.points, resolution),
                          self.num_threads)
