"""Full-precision products for tiny static matrices (3x3 / 4x4 / k x n).

On TPU, ``@`` / einsum lower to dot_general whose default precision downcasts
operands to bfloat16 on the MXU — catastrophic for pose chains and per-point
normal equations. These helpers express the contractions as broadcast
multiply+sum, which stays in f32 on the VPU and is faster than an MXU
round-trip at these sizes anyway. All broadcast over leading batch dims.
"""

import jax.numpy as jnp

__all__ = ["matmul_small", "matvec_small", "gram", "gram_rhs"]


def matmul_small(A, B):
    """C = A @ B for [..., m, k] x [..., k, n], k/m/n tiny and static."""
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def matvec_small(A, v):
    """y = A @ v for [..., m, k] x [..., k]."""
    return jnp.sum(A * v[..., None, :], axis=-1)


def gram(A):
    """A^T A for [..., k, n] row blocks."""
    return jnp.sum(A[..., :, :, None] * A[..., :, None, :], axis=-3)


def gram_rhs(A, b):
    """A^T b for [..., k, n] rows and [..., k] targets."""
    return jnp.sum(A * b[..., :, None], axis=-2)
