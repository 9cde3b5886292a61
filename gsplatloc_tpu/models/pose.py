"""Camera pose parameterization: quaternion + translation.

Parity with reference CameraOptModule_quat_tans (src/my_gsplat/model.py:27-116):
pose stored as (wxyz quaternion, translation); forward() rebuilds the 4x4 c2w
from the normalized quaternion; constant-velocity prediction extrapolates the
next frame's init. Pure pytree — the optimizer lives in opt/adam.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.lie import construct_pose, normalize_quat, quat_to_rotmat, rotmat_to_quat


class PoseState(NamedTuple):
    quat: jnp.ndarray  # (4,) wxyz (not necessarily unit — normalized on use)
    trans: jnp.ndarray  # (3,)

    def to_c2w(self) -> jnp.ndarray:
        """(4, 4) camera-to-world (reference model.py:79-82)."""
        return construct_pose(quat_to_rotmat(self.quat), self.trans)

    @staticmethod
    def from_c2w(c2w: jnp.ndarray) -> "PoseState":
        return PoseState(quat=rotmat_to_quat(c2w[:3, :3]), trans=c2w[:3, 3])


def predict_next_pose(prev: PoseState, cur: PoseState) -> PoseState:
    """Constant-velocity extrapolation (reference model.py:59-77):
    q' = normalize(q_cur + (q_cur - q_prev)), t' = t_cur + (t_cur - t_prev).
    """
    q = normalize_quat(cur.quat + (cur.quat - prev.quat))
    t = cur.trans + (cur.trans - prev.trans)
    return PoseState(quat=q, trans=t)
