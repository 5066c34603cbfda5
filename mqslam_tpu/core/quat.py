"""Quaternion algebra, batched over leading dims.

Convention: quaternions are stored as ``(x, y, z, w)`` — the TUM trajectory
convention — in arrays of shape ``[..., 4]``. All functions are elementwise
over the batch and jit/vmap/grad-safe.

Semantics match the reference's quaternion toolkit
(reference: Work/python_libs/transforms.py:14-152) but are re-derived; unit
rotation quaternions act on points by conjugation q * p * q^-1.
"""

import jax.numpy as jnp

__all__ = [
    "identity", "normalize", "mult", "conj", "inv", "delta",
    "apply_to_point", "from_rvec", "to_rvec", "to_matrix", "from_matrix",
    "axis_angle_from_rvec",
]

_EPS = 1e-12


def identity(dtype=jnp.float32):
    """The identity rotation quaternion (0, 0, 0, 1)."""
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def normalize(q):
    """Normalize to unit length (safe at ~zero norm: returns identity)."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    safe = jnp.where(n > _EPS, q / jnp.maximum(n, _EPS), identity(q.dtype))
    return safe


def mult(q1, q2):
    """Hamilton product q1 * q2 (apply q2's rotation first, then q1's).

    Reference semantics: transforms.py:21-34 (mult_quat).
    """
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ], axis=-1)


def conj(q):
    """Conjugate (negate vector part). transforms.py:37-45."""
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def inv(q):
    """Inverse q^-1 = conj(q) / |q|^2. transforms.py:48-52."""
    n2 = jnp.sum(q * q, axis=-1, keepdims=True)
    return conj(q) / jnp.maximum(n2, _EPS)


def delta(q1, q2):
    """Relative rotation taking q1 to q2: q2 * q1^-1. transforms.py:55-65."""
    return mult(q2, inv(q1))


def apply_to_point(q, p):
    """Rotate point(s) p [..., 3] by unit quaternion(s) q [..., 4].

    Uses the expanded conjugation formula (no intermediate quaternion),
    semantics of transforms.py:68-80.
    """
    v = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(v, p)
    return p + w * t + jnp.cross(v, t)


def from_rvec(rvec):
    """Unit quaternion from rotation vector (axis * angle). transforms.py:83-97."""
    angle = jnp.linalg.norm(rvec, axis=-1, keepdims=True)
    half = 0.5 * angle
    # sinc-safe: sin(half)/angle -> 0.5 as angle -> 0
    k = jnp.where(angle > _EPS, jnp.sin(half) / jnp.maximum(angle, _EPS), 0.5)
    xyz = rvec * k
    w = jnp.cos(half)
    return jnp.concatenate([xyz, w], axis=-1)


def to_rvec(q):
    """Rotation vector from unit quaternion. transforms.py:100-119.

    Returns the minimal rotation (angle in [0, pi]) by flipping sign when w<0.
    """
    q = jnp.where(q[..., 3:4] < 0, -q, q)
    q = normalize(q)
    s = jnp.linalg.norm(q[..., :3], axis=-1, keepdims=True)
    w = q[..., 3:4]
    angle = 2.0 * jnp.arctan2(s, w)
    k = jnp.where(s > _EPS, angle / jnp.maximum(s, _EPS), 2.0)
    return q[..., :3] * k


def axis_angle_from_rvec(rvec):
    """(unit axis, angle) decomposition of a rotation vector.

    transforms.py:122-140; zero rotation maps to axis (0,0,1)? No — the
    reference returns the (unnormalized-safe) axis; we return z-axis for the
    degenerate zero-angle case so the axis is always unit.
    """
    angle = jnp.linalg.norm(rvec, axis=-1, keepdims=True)
    axis = jnp.where(
        angle > _EPS,
        rvec / jnp.maximum(angle, _EPS),
        jnp.array([0.0, 0.0, 1.0], dtype=rvec.dtype),
    )
    return axis, angle[..., 0]


def to_matrix(q):
    """3x3 rotation matrix from unit quaternion, shape [..., 3, 3]."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return r.reshape(r.shape[:-1] + (3, 3))


def from_matrix(R):
    """Unit quaternion from rotation matrix [..., 3, 3] (Shepperd's method).

    Branch-free: computes all four candidate quaternions and selects the one
    keyed by the largest of (trace, R00, R11, R22) — numerically stable for
    all rotations, jit-safe.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates (unnormalized), each valid when its pivot is largest.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20],
                   axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21],
                   axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11],
                   axis=-1)
    # candidates stacked as [..., 4(case), 4(wxyz)]
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)
    pivots = jnp.stack([tr, m00, m11, m22], axis=-1)
    case = jnp.argmax(pivots, axis=-1)
    sel = jnp.take_along_axis(
        cands, case[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]
    # sel is (w, x, y, z); reorder to (x, y, z, w) and normalize.
    q = jnp.stack([sel[..., 1], sel[..., 2], sel[..., 3], sel[..., 0]], axis=-1)
    q = jnp.where(q[..., 3:4] < 0, -q, q)
    return normalize(q)
