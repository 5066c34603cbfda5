"""SE(3) rigid transforms as 4x4 homogeneous matrices, batched + jit-safe.

The extrinsic matrix ``P`` maps world points to camera coordinates:
``x_cam = P @ [x_world, 1]``. This matches the reference's 4x4 "P" convention
(reference: Work/python_libs/transforms.py:156-198) and its TUM pose
conversions (transforms.py:245-288): a TUM pose row stores the camera center
and camera-to-world quaternion, i.e. the *inverse* of P.
"""

import jax.numpy as jnp

from mqslam_tpu.core import quat as _quat, so3 as _so3
from mqslam_tpu.core.smallmat import matmul_small, matvec_small

__all__ = [
    "identity", "from_R_t", "from_rvec_tvec", "to_rvec_tvec", "inv",
    "compose", "delta", "apply", "from_pose_tum", "to_pose_tum",
]


def identity(dtype=jnp.float32):
    return jnp.eye(4, dtype=dtype)


def from_R_t(R, t):
    """4x4 P from rotation [..., 3, 3] and translation [..., 3].

    transforms.py:156-168 (P_from_R_and_t, homogeneous form).
    """
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), batch + (4,)
    )
    return jnp.concatenate([top, bottom[..., None, :]], axis=-2)


def from_rvec_tvec(rvec, tvec):
    """4x4 P from (rvec, tvec) as produced by PnP. transforms.py:245-249."""
    return from_R_t(_so3.exp(rvec), tvec)


def to_rvec_tvec(P):
    """(rvec, tvec) from 4x4 P."""
    return _so3.log(P[..., :3, :3]), P[..., :3, 3]


def inv(P):
    """Closed-form rigid inverse: [R t]^-1 = [R^T, -R^T t]. transforms.py:171-181."""
    R = P[..., :3, :3]
    t = P[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return from_R_t(Rt, -matvec_small(Rt, t))


def compose(P2, P1):
    """P2 after P1 (matrix product, full f32 precision on TPU)."""
    return matmul_small(P2, P1)


def delta(P1, P2):
    """Relative transform taking frame of P1 to frame of P2: P2 @ P1^-1.

    transforms.py:184-197 (delta_P) — the odometry factor measurement.
    """
    return matmul_small(P2, inv(P1))


def apply(P, pts):
    """Apply P to 3D point(s) [..., 3]."""
    return matvec_small(P[..., :3, :3], pts) + P[..., :3, 3]


def from_pose_tum(q, center):
    """Extrinsic P from a TUM pose (camera center [...,3], quat xyzw [...,4]).

    TUM stores cam-to-world; P is world-to-cam: R = R(q)^T, t = -R^T c.
    transforms.py:252-269 (P_from_pose_TUM).
    """
    Rcw = _quat.to_matrix(_quat.normalize(q))  # cam-to-world
    R = jnp.swapaxes(Rcw, -1, -2)
    t = -matvec_small(R, center)
    return from_R_t(R, t)


def to_pose_tum(P):
    """(quat xyzw, camera center) of the TUM pose for extrinsic P.

    transforms.py:272-288 (pose_TUM_from_P).
    """
    Pi = inv(P)
    return _quat.from_matrix(Pi[..., :3, :3]), Pi[..., :3, 3]
