"""Dense hybrid RGB-D odometry: recover a known relative transform."""

import numpy as np
from scipy.spatial.transform import Rotation

from gsplatloc_tpu.data.synthetic import box_room_frame
from gsplatloc_tpu.tracking.odometry import rgbd_odometry_multi_scale


def test_hybrid_odometry_recovers_motion():
    H, W = 120, 160
    K = np.array([[100.0, 0, W / 2 - 0.5], [0, 100.0, H / 2 - 0.5],
                  [0, 0, 1]], np.float32)
    c2w_t = np.eye(4)
    c2w_s = np.eye(4)
    c2w_s[:3, :3] = Rotation.from_euler("xyz", [1.0, -0.8, 0.5],
                                        degrees=True).as_matrix()
    c2w_s[:3, 3] = [0.02, -0.015, 0.03]
    rgb_t, depth_t = box_room_frame(c2w_t, K, H, W)
    rgb_s, depth_s = box_room_frame(c2w_s, K, H, W)

    T_true = np.linalg.inv(c2w_t) @ c2w_s  # maps source-cam -> target-cam
    T_est = rgbd_odometry_multi_scale(
        rgb_s, depth_s, rgb_t, depth_t, K, levels=3, iterations=(10, 10, 10)
    )
    eT = np.linalg.norm(T_est[:3, 3] - T_true[:3, 3])
    dR = T_est[:3, :3] @ T_true[:3, :3].T
    eR = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    # init error: ~4.2 cm / 1.4 deg; dense GN should get close to exact
    init_eT = np.linalg.norm(T_true[:3, 3])
    assert eT < init_eT / 10, (eT, init_eT)
    assert eR < 0.2, eR


def test_hybrid_odometry_identity_stays_identity():
    H, W = 60, 80
    K = np.array([[60.0, 0, W / 2 - 0.5], [0, 60.0, H / 2 - 0.5],
                  [0, 0, 1]], np.float32)
    rgb, depth = box_room_frame(np.eye(4), K, H, W)
    T = rgbd_odometry_multi_scale(rgb, depth, rgb, depth, K, levels=2,
                                  iterations=(5, 5))
    np.testing.assert_allclose(T, np.eye(4), atol=1e-4)


def test_hybrid_odometry_depth_holes_no_bias():
    """Invalid (0) target-depth pixels are rejected from bilinear sampling
    and gradient computation (Open3D semantics — blending a 0 corner
    biases the geometric residual ~w*depth at every hole edge). On this
    symmetric scene the per-edge wrenches largely cancel, so this pins
    hole-path robustness (convergence with 25 dropout blobs + fractional
    warp), not the asymmetric-bias failure itself."""
    H, W = 60, 80
    K = np.array([[60.0, 0, W / 2 - 0.5], [0, 60.0, H / 2 - 0.5],
                  [0, 0, 1]], np.float32)
    rgb, depth = box_room_frame(np.eye(4), K, H, W)
    depth_holes = depth.copy()
    rng = np.random.default_rng(9)
    # scatter invalid blobs over the target depth (sensor-dropout style)
    for _ in range(25):
        y = rng.integers(2, H - 6)
        x = rng.integers(2, W - 6)
        depth_holes[y:y + 4, x:x + 4] = 0.0
    # perturbed init: fractional warp coordinates actually blend corners
    # (a perfect init samples exact pixel centers and hides the bias)
    T0 = np.eye(4)
    T0[:3, 3] = [0.004, -0.003, 0.005]
    T = rgbd_odometry_multi_scale(rgb, depth, rgb, depth_holes, K,
                                  init_T=T0, levels=2, iterations=(12, 12))
    eT = np.linalg.norm(T[:3, 3])
    eR = np.degrees(np.arccos(np.clip((np.trace(T[:3, :3]) - 1) / 2, -1, 1)))
    assert eT < 2e-4, eT
    assert eR < 0.02, eR
