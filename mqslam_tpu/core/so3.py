"""SO(3): rotation-vector <-> rotation-matrix (Rodrigues), batched + jit-safe.

Replaces the reference's calls into ``cv2.Rodrigues``
(reference: Work/python_libs/cv2_helpers.py:25, used throughout slam2.py).
"""

import jax.numpy as jnp

from mqslam_tpu.core import quat as _quat
from mqslam_tpu.core.smallmat import matmul_small

__all__ = ["hat", "exp", "log", "rvec_from_matrix", "matrix_from_rvec",
           "delta_rvec"]

_EPS = 1e-12


def hat(v):
    """Skew-symmetric matrix [v]_x of vector(s) [..., 3] -> [..., 3, 3]."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def exp(rvec):
    """Rodrigues: rotation vector [..., 3] -> rotation matrix [..., 3, 3].

    Taylor-safe near zero angle (uses sinc-style guarded coefficients).
    """
    theta2 = jnp.sum(rvec * rvec, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-10
    # sin(t)/t and (1-cos(t))/t^2 with series fallbacks
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS))
    K = hat(rvec)
    I = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    return I + a[..., None, None] * K + b[..., None, None] * matmul_small(K, K)


def log(R):
    """Inverse Rodrigues: rotation matrix -> rotation vector (angle in [0, pi]).

    Routed through the quaternion double-cover for numerical stability at
    angles near 0 and pi (direct trace formula is ill-conditioned there).
    """
    return _quat.to_rvec(_quat.from_matrix(R))


# Aliases with the domain-specific names used around the codebase.
matrix_from_rvec = exp
rvec_from_matrix = log


def delta_rvec(r1, r2):
    """Rotation vector of the relative rotation taking r1 to r2.

    Semantics of transforms.py:143-153 (delta_rvec): exp(out) = exp(r2) exp(r1)^-1.
    """
    q1 = _quat.from_rvec(r1)
    q2 = _quat.from_rvec(r2)
    return _quat.to_rvec(_quat.delta(q1, q2))
