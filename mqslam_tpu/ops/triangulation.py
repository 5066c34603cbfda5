"""Batched two-view triangulation — the framework's first-class dense kernel.

Re-implements (TPU-first, fully batched, jit/vmap-safe) the four methods of the
reference study (reference: Work/python_libs/triangulation.py):

  * linear_eigen  — homogeneous DLT, smallest eigenvector of A^T A
                    (triangulation.py:6-25 via cv2.triangulatePoints)
  * linear_ls     — inhomogeneous 4x3 least squares (triangulation.py:31-94)
  * iterative_ls  — Hartley–Sturm depth-reweighted LS, fixed max 10 iterations
                    (triangulation.py:100-195; C kernel triangulation_c/
                    triangulation.c:104-161 — here one fori_loop over a frozen
                    convergence mask instead of OpenMP over points)
  * optimal       — epipolar-optimal correction + DLT. The reference uses the
                    HZ 12.5 6th-degree polynomial (cv2.correctMatches,
                    triangulation.py:198-232); polynomial root finding needs a
                    nonsymmetric eigensolver, which TPUs lack, so we use
                    Lindstrom's closed-form 2-iteration method ("Triangulation
                    Made Easy", CVPR 2010) which minimizes the same geometric
                    cost to machine precision — and has no NaN degeneracy for
                    purely-sideways motion (triangulation.py:226-229's
                    fallback is therefore unnecessary).

Inputs are normalized image coordinates ``u1, u2: [N, 2]`` and camera matrices
``P1, P2: [3+, 4]`` (only the first 3 rows are used, so 4x4 extrinsics work
directly). Status semantics follow the reference:

  linear_eigen/optimal: bool, False for non-finite/huge points
  linear_ls:            bool, always True
  iterative_ls:         int32 in {1, 0, -1, -2, -3}
                        (converged&front / non-converged / behind-1st /
                         behind-2nd / behind-both; triangulation.py:110-116 —
                        note the reference's *Python* variant can never emit 0
                        due to its `i < 10` loop-variable quirk at
                        triangulation.py:190; we follow the C variant's
                        documented semantics, triangulation.c:154-159.)
"""

from functools import partial

import jax
import jax.numpy as jnp

from mqslam_tpu.ops import linalg

__all__ = [
    "linear_eigen", "linear_ls", "iterative_ls", "optimal",
    "polynomial", "METHODS", "fundamental_from_P",
]


def _prep(P):
    """Normalize a camera matrix for per-point broadcasting.

    P: [..., 3+, 4] with batch dims broadcastable against the *pose/trial*
    batch of the image points (everything except their N axis). Returns
    [..., 1, 3, 4] — the inserted axis aligns with N so all row operations
    broadcast elementwise over points.
    """
    return P[..., None, :3, :4]


def _rows(u, Pp):
    """Per-point DLT rows for one camera (Pp pre-shaped by _prep).

    For image point (ux, uy): rows  ux*P[2,:] - P[0,:]  and  uy*P[2,:] - P[1,:]
    split into the 3-column part and the (negated) constant part.
    Returns (A [..., N, 2, 3], b [..., N, 2]).
    """
    ux = u[..., 0]  # [..., N]
    uy = u[..., 1]
    r0, r1, r2 = Pp[..., 0, :], Pp[..., 1, :], Pp[..., 2, :]  # [..., 1, 4]
    a0 = ux[..., None] * r2[..., :3] - r0[..., :3]  # [..., N, 3]
    a1 = uy[..., None] * r2[..., :3] - r1[..., :3]
    A = jnp.stack([a0, a1], axis=-2)  # [..., N, 2, 3]
    b0 = -(ux * r2[..., 3] - r0[..., 3])
    b1 = -(uy * r2[..., 3] - r1[..., 3])
    b = jnp.stack([b0, b1], axis=-1)  # [..., N, 2]
    return A, b


def _normal_eq(A1, b1, A2, b2, w1, w2):
    """Weighted normal equations from two cameras' 2x3 row blocks.

    N = sum_k w_k^2 A_k^T A_k   (3x3),   rhs = sum_k w_k^2 A_k^T b_k.
    Expressed with einsum over the tiny fixed dims; batch stays elementwise.
    """
    w1sq = (w1 * w1)[..., None, None]
    w2sq = (w2 * w2)[..., None, None]
    N = linalg.gram(A1) * w1sq + linalg.gram(A2) * w2sq
    rhs = (linalg.gram_rhs(A1, b1) * w1sq[..., 0]
           + linalg.gram_rhs(A2, b2) * w2sq[..., 0])
    return N, rhs


def _depth(Pp, x):
    """Depth of inhomogeneous 3D points x [..., N, 3] under camera Pp
    (pre-shaped by _prep): P[2,:3].x + P[2,3]."""
    return jnp.sum(Pp[..., 2, :3] * x, axis=-1) + Pp[..., 2, 3]


@partial(jax.jit, static_argnames=())
def linear_eigen(u1, P1, u2, P2, max_coordinate_value=1e16):
    """Homogeneous DLT: smallest eigenvector of the 4x4 A^T A per point.

    Matches cv2.triangulatePoints semantics (triangulation.py:6-25): solve
    min |A xh| s.t. |xh|=1, dehomogenize, flag huge/non-finite points False.
    """
    A1, b1 = _rows(u1, _prep(P1))
    A2, b2 = _rows(u2, _prep(P2))
    # Full homogeneous rows: [A | -b]
    rows = jnp.concatenate([
        jnp.concatenate([A1, -b1[..., None]], axis=-1),
        jnp.concatenate([A2, -b2[..., None]], axis=-1),
    ], axis=-2)  # [N, 4, 4]
    S = linalg.gram(rows)
    xh = linalg.eigh4x4_smallest(S)
    w = xh[..., 3]
    w_safe = jnp.where(jnp.abs(w) > 1e-30, w, 1e-30)
    x = xh[..., :3] / w_safe[..., None]
    # Points at infinity dehomogenize to ~1/eps(dtype) (the homogeneous w
    # component only vanishes to roundoff), so the reference's f64 cutoff of
    # 1e16 (triangulation.py:6,23) is scaled down for lower precisions:
    # f32 flags beyond ~8e5 — far above any finite scene coordinate.
    cutoff = min(max_coordinate_value, 0.1 / float(jnp.finfo(u1.dtype).eps))
    status = jnp.max(jnp.abs(x), axis=-1) <= cutoff
    status = jnp.logical_and(status, jnp.all(jnp.isfinite(x), axis=-1))
    return x, status


@jax.jit
def linear_ls(u1, P1, u2, P2):
    """Inhomogeneous linear LS (4 eqs, 3 unknowns) per point.

    triangulation.py:31-94; solved via closed-form symmetric 3x3 normal
    equations instead of a per-point SVD — elementwise over the batch.
    """
    A1, b1 = _rows(u1, _prep(P1))
    A2, b2 = _rows(u2, _prep(P2))
    one = jnp.ones(u1.shape[:-1], dtype=u1.dtype)
    N, rhs = _normal_eq(A1, b1, A2, b2, one, one)
    x = linalg.pinv_solve_sym(N, rhs)
    return x, jnp.ones(jnp.broadcast_shapes(u1.shape[:-1], x.shape[:-1]),
                       dtype=bool)


@partial(jax.jit, static_argnames=("iterations",))
def iterative_ls(u1, P1, u2, P2, tolerance=3e-5, iterations: int = 10):
    """Hartley–Sturm iterative LS with cumulative depth re-weighting.

    Replicates the reference's update exactly (triangulation.py:148-187 /
    triangulation.c:104-161): each non-converged iteration multiplies each
    camera's rows by 1/d_new (weights are cumulative products), convergence is
    |d_new - d| <= tolerance on both depths, max ``iterations`` solves.
    Per-point convergence freezing replaces the per-point `break`.
    """
    P1p = _prep(P1)
    P2p = _prep(P2)
    A1, b1 = _rows(u1, P1p)
    A2, b2 = _rows(u2, P2p)
    n_batch = jnp.broadcast_shapes(u1.shape[:-1], A1.shape[:-2])
    dt = u1.dtype

    x0 = jnp.zeros(n_batch + (3,), dtype=dt)
    d1_0 = jnp.ones(n_batch, dtype=dt)
    d2_0 = jnp.ones(n_batch, dtype=dt)
    w1_0 = jnp.ones(n_batch, dtype=dt)
    w2_0 = jnp.ones(n_batch, dtype=dt)
    conv0 = jnp.zeros(n_batch, dtype=bool)

    def body(_, state):
        x, d1, d2, w1, w2, conv = state
        N, rhs = _normal_eq(A1, b1, A2, b2, w1, w2)
        x_new = linalg.pinv_solve_sym(N, rhs)
        # Frozen (converged) points keep their solution.
        x = jnp.where(conv[..., None], x, x_new)
        d1_new = jnp.where(conv, d1, _depth(P1p, x))
        d2_new = jnp.where(conv, d2, _depth(P2p, x))
        # Convergence: the reference uses |delta depth| <= 3e-5 in float64
        # (triangulation.py:164-165). In float32 the depth jitter floor from
        # normal-equation roundoff is ~1e-4 relative at the study's working
        # depths, so an absolute 3e-5 would never trigger; add a dtype-aware
        # relative term (4.5e-13 relative in f64 — semantics unchanged there).
        eps_rel = 2048.0 * float(jnp.finfo(dt).eps)
        tol1 = tolerance + eps_rel * jnp.abs(d1_new)
        tol2 = tolerance + eps_rel * jnp.abs(d2_new)
        conv_now = jnp.logical_and(jnp.abs(d1_new - d1) <= tol1,
                                   jnp.abs(d2_new - d2) <= tol2)
        conv_next = jnp.logical_or(conv, conv_now)
        # Re-weight only points that keep iterating.
        upd = jnp.logical_not(conv_next)
        d1_safe = jnp.where(jnp.abs(d1_new) > 1e-30, d1_new, 1e-30)
        d2_safe = jnp.where(jnp.abs(d2_new) > 1e-30, d2_new, 1e-30)
        w1 = jnp.where(upd, w1 / d1_safe, w1)
        w2 = jnp.where(upd, w2 / d2_safe, w2)
        # Common row scaling doesn't change the LS solution; renormalize by
        # the larger weight so the cumulative products can neither underflow
        # (depths ~40 => w ~ 40^-10 after 10 non-converged iterations) nor
        # overflow (dividing by a tiny |w1| would blow up w2) in f32.
        scale = jnp.maximum(jnp.maximum(jnp.abs(w1), jnp.abs(w2)), 1e-30)
        w1 = w1 / scale
        w2 = w2 / scale
        return x, d1_new, d2_new, w1, w2, conv_next

    x, d1, d2, _, _, conv = jax.lax.fori_loop(
        0, iterations, body, (x0, d1_0, d2_0, w1_0, w2_0, conv0))

    front1 = d1 > 0
    front2 = d2 > 0
    status = (jnp.logical_and(conv, jnp.logical_and(front1, front2))
              ).astype(jnp.int32)
    status = status - jnp.logical_not(front1).astype(jnp.int32)
    status = status - 2 * jnp.logical_not(front2).astype(jnp.int32)
    return x, status


def fundamental_from_P(P1, P2):
    """Fundamental (= essential, in normalized coords) matrix from two camera
    matrices: F = [t]x R of the canonical relative pose P2 @ P1^-1.

    triangulation.py:211-216; constraint convention: u2h^T F u1h = 0.
    """
    # Rigid inverse of P1 (works for [3,4] or [4,4] inputs).
    R1 = P1[..., :3, :3]
    t1 = P1[..., :3, 3]
    R1T = jnp.swapaxes(R1, -1, -2)
    Rrel = linalg.matmul_small(P2[..., :3, :3], R1T)
    trel = P2[..., :3, 3] - linalg.matvec_small(Rrel, t1)
    tx, ty, tz = trel[..., 0], trel[..., 1], trel[..., 2]
    zero = jnp.zeros_like(tx)
    Tx = jnp.stack([
        jnp.stack([zero, -tz, ty], axis=-1),
        jnp.stack([tz, zero, -tx], axis=-1),
        jnp.stack([-ty, tx, zero], axis=-1),
    ], axis=-2)
    return linalg.matmul_small(Tx, Rrel)


def _optimal_correct(u1, u2, F):
    """Lindstrom niter2 epipolar correction of point pairs.

    Moves (u1, u2) the minimum summed squared distance onto the epipolar
    constraint u2h^T F u1h = 0 (to first order, two refinement steps —
    machine-precision optimal in practice). Replaces cv2.correctMatches.
    """
    # Map to the paper's convention x^T E x' = 0 with x = hom(u2), x' = hom(u1)
    E = F[..., None, :, :]  # align batch with the points' N axis
    x2 = u2  # "x" (2D part)
    x1 = u1  # "x'" (2D part)

    def Ex1(u):  # S E x' : (E @ hom(u1))[0:2]
        return linalg.matvec_small(E[..., :2, :2], u) + E[..., :2, 2]

    def ETx2(u):  # S E^T x : (E^T @ hom(u2))[0:2]
        return (linalg.matvec_small(jnp.swapaxes(E[..., :2, :2], -1, -2), u)
                + E[..., 2, :2])

    Ebar = E[..., :2, :2]
    n = Ex1(x1)      # derivative wrt x2 (2-vector)
    n_p = ETx2(x2)   # derivative wrt x1
    a = jnp.sum(n * linalg.matvec_small(Ebar, n_p), axis=-1)
    b = 0.5 * (jnp.sum(n * n, axis=-1) + jnp.sum(n_p * n_p, axis=-1))
    # epipolar residual c = x2h^T F x1h
    c = (jnp.sum(x2 * linalg.matvec_small(E[..., :2, :2], x1), axis=-1)
         + jnp.sum(x2 * E[..., :2, 2], axis=-1)
         + jnp.sum(x1 * E[..., 2, :2], axis=-1)
         + E[..., 2, 2])
    disc = jnp.maximum(b * b - a * c, 0.0)
    d = jnp.sqrt(disc)
    denom = b + d
    denom = jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
    lam = c / denom
    dx2 = lam[..., None] * n
    dx1 = lam[..., None] * n_p
    n2 = n - linalg.matvec_small(Ebar, dx1)
    n1 = n_p - linalg.matvec_small(jnp.swapaxes(Ebar, -1, -2), dx2)
    denom2 = jnp.sum(n2 * n2, axis=-1) + jnp.sum(n1 * n1, axis=-1)
    denom2 = jnp.where(jnp.abs(denom2) > 1e-30, denom2, 1e-30)
    lam = lam * 2.0 * d / denom2
    dx2 = lam[..., None] * n2
    dx1 = lam[..., None] * n1
    return x1 - dx1, x2 - dx2


@jax.jit
def optimal(u1, P1, u2, P2):
    """Optimal (epipolar-corrected) triangulation; DLT on corrected points.

    Reference pipeline triangulation.py:198-232 with the polynomial root
    solve replaced by Lindstrom niter2 (see module docstring).
    """
    F = fundamental_from_P(P1, P2)
    u1c, u2c = _optimal_correct(u1, u2, F)
    return linear_eigen(u1c, P1, u2c, P2)


# Reference-compatible name: the reference calls this method "polynomial".
polynomial = optimal

METHODS = {
    "linear_eigen": linear_eigen,
    "linear_ls": linear_ls,
    "iterative_ls": iterative_ls,
    "polynomial": optimal,
}
