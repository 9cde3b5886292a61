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
