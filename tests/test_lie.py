"""Golden + property tests for rotation/SE(3) numerics."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from gsplatloc_tpu.ops import lie


def random_rotations(rng, n=32):
    return Rotation.random(n, random_state=np.random.RandomState(0)).as_matrix()


def test_quat_to_rotmat_matches_scipy(rng):
    # scipy uses xyzw; ours is wxyz.
    rots = Rotation.random(64, random_state=np.random.RandomState(1))
    q_xyzw = rots.as_quat()
    q_wxyz = np.roll(q_xyzw, 1, axis=1)
    ours = np.asarray(lie.quat_to_rotmat(jnp.asarray(q_wxyz, jnp.float32)))
    np.testing.assert_allclose(ours, rots.as_matrix(), atol=2e-6)


def test_rotmat_quat_roundtrip(rng):
    m = random_rotations(rng, 64)
    q = lie.rotmat_to_quat(jnp.asarray(m, jnp.float32))
    m2 = np.asarray(lie.quat_to_rotmat(q))
    np.testing.assert_allclose(m2, m, atol=1e-5)


def test_quat_normalization_invariance():
    q = jnp.array([2.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(np.asarray(lie.quat_to_rotmat(q)), np.eye(3), atol=1e-7)


def test_rotation_6d_roundtrip(rng):
    m = random_rotations(rng, 16)
    d6 = lie.matrix_to_rotation_6d(jnp.asarray(m, jnp.float32))
    m2 = np.asarray(lie.rotation_6d_to_matrix(d6))
    np.testing.assert_allclose(m2, m, atol=1e-5)


def test_construct_and_invert_pose(rng):
    R = random_rotations(rng, 1)[0]
    t = rng.normal(size=3).astype(np.float32)
    T = lie.construct_pose(jnp.asarray(R, jnp.float32), jnp.asarray(t))
    assert T.shape == (4, 4)
    Tinv = lie.invert_se3(T)
    np.testing.assert_allclose(np.asarray(T @ Tinv), np.eye(4), atol=1e-5)


def test_transform_points_matches_homogeneous(rng):
    R = random_rotations(rng, 1)[0]
    t = rng.normal(size=3)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    pts = rng.normal(size=(100, 3))
    ours = np.asarray(
        lie.transform_points(jnp.asarray(T, jnp.float32), jnp.asarray(pts, jnp.float32))
    )
    expected = (T[:3, :3] @ pts.T).T + t
    np.testing.assert_allclose(ours, expected, atol=1e-5)


@pytest.mark.parametrize("trace_case", ["identity", "pi_x", "pi_y", "pi_z"])
def test_rotmat_to_quat_degenerate(trace_case):
    mats = {
        "identity": np.eye(3),
        "pi_x": np.diag([1.0, -1.0, -1.0]),
        "pi_y": np.diag([-1.0, 1.0, -1.0]),
        "pi_z": np.diag([-1.0, -1.0, 1.0]),
    }
    m = mats[trace_case]
    q = lie.rotmat_to_quat(jnp.asarray(m, jnp.float32))
    m2 = np.asarray(lie.quat_to_rotmat(q))
    np.testing.assert_allclose(m2, m, atol=1e-5)
