"""SE(3) pose-graph optimization (GTSAM-style BetweenFactor graphs).

The reference's back-end expresses odometry and cross-camera constraints as
BetweenFactor<Pose3> edges inside the full BA graph (reference:
Work/SLAM/tools/bundle_adjustment/bundle_adjust.cpp:301-309,
DataStructures.hpp:35-41). Pose-graph optimization is the landmark-free
specialization of that graph — the standard back-end for loop closure
(frontend.loopclosure produces the edges). This module solves it natively:

TPU shape: every edge linearized concurrently (vmapped jacfwd of the
whitened Between residual in the body-frame chart), the Gauss-Newton system
applied matrix-free as per-edge 6x6 block products + segment-sums over pose
ids, solved by block-Jacobi-preconditioned CG, with Levenberg damping and a
monotone accept/reject outer loop. Poses update by manifold retraction
(ba.factors.retract_single), never by raw axis-angle addition.

All arrays are fixed capacity with validity masks, so growing graphs re-use
one compiled executable (pad N/E up front).
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.ops import segment_sum

from mqslam_tpu.core import so3
from mqslam_tpu.ba import factors
from mqslam_tpu.ops import linalg

__all__ = ["PoseGraph", "pgo_cost", "pgo_solve"]


class PoseGraph(NamedTuple):
    """Fixed-capacity pose graph. poses [N, 6] are cam-to-world
    (rvec, center) as everywhere in ba/; edges i->j carry the measured
    relative pose (meas_r, meas_t) with Between semantics
    R_i^T R_j ~ Exp(meas_r), R_i^T (c_j - c_i) ~ meas_t."""
    poses: jnp.ndarray        # [N, 6]
    pose_valid: jnp.ndarray   # [N] bool
    edge_i: jnp.ndarray       # [E] int32
    edge_j: jnp.ndarray       # [E] int32
    edge_meas_r: jnp.ndarray  # [E, 3]
    edge_meas_t: jnp.ndarray  # [E, 3]
    edge_inv_sigma: jnp.ndarray  # [E, 6] whitening (rot xyz, trans xyz)
    edge_valid: jnp.ndarray   # [E] bool
    # gauge prior (first pose by convention; any subset works)
    prior_mask: jnp.ndarray   # [N] bool
    prior_r: jnp.ndarray      # [N, 3]
    prior_t: jnp.ndarray      # [N, 3]
    prior_inv_sigma: jnp.ndarray  # [N, 6]


def _edge_residuals(g: PoseGraph, poses):
    pf = poses[g.edge_i]
    pt = poses[g.edge_j]
    r = factors.odo_residual(pf, pt, g.edge_meas_r, g.edge_meas_t,
                             g.edge_inv_sigma)
    return jnp.where(g.edge_valid[:, None], r, 0.0)


def _prior_residuals(g: PoseGraph, poses):
    r = factors.prior_pose_residual(poses, g.prior_r, g.prior_t,
                                    g.prior_inv_sigma)
    return jnp.where(g.prior_mask[:, None], r, 0.0)


def pgo_cost(g: PoseGraph, poses=None):
    """0.5 * sum of squared whitened residuals (GTSAM's error)."""
    poses = g.poses if poses is None else poses
    re = _edge_residuals(g, poses)
    rp = _prior_residuals(g, poses)
    return 0.5 * (jnp.sum(re * re) + jnp.sum(rp * rp))


def _linearize(g: PoseGraph, poses):
    pf = poses[g.edge_i]
    pt = poses[g.edge_j]
    Jf, Jt = factors.odo_residual_jac(pf, pt, g.edge_meas_r, g.edge_meas_t,
                                      g.edge_inv_sigma)  # [E, 6, 6] x2
    r = factors.odo_residual(pf, pt, g.edge_meas_r, g.edge_meas_t,
                             g.edge_inv_sigma)
    m = g.edge_valid[:, None, None]
    Jf = jnp.where(m, Jf, 0.0)
    Jt = jnp.where(m, Jt, 0.0)
    r = jnp.where(g.edge_valid[:, None], r, 0.0)

    Jp = factors.prior_pose_residual_jac(poses, g.prior_r, g.prior_t,
                                         g.prior_inv_sigma)  # [N, 6, 6]
    rp = factors.prior_pose_residual(poses, g.prior_r, g.prior_t,
                                     g.prior_inv_sigma)
    Jp = jnp.where(g.prior_mask[:, None, None], Jp, 0.0)
    rp = jnp.where(g.prior_mask[:, None], rp, 0.0)
    return Jf, Jt, r, Jp, rp


def _gram66(J):
    # broadcast+sum, not einsum: dot_general would round to bf16 on the MXU
    return jnp.sum(J[:, :, :, None] * J[:, :, None, :], axis=1)


def _make_Hv(g: PoseGraph, Jf, Jt, Jp, lam, diag):
    """Matrix-free damped GN operator on [N, 6] pose increments."""
    N = g.poses.shape[0]

    def Hv(v):
        vf = v[g.edge_i]
        vt = v[g.edge_j]
        Jv = (jnp.sum(Jf * vf[:, None, :], axis=-1)
              + jnp.sum(Jt * vt[:, None, :], axis=-1))     # [E, 6]
        out = segment_sum(jnp.sum(Jf * Jv[:, :, None], axis=-2),
                          g.edge_i, num_segments=N)
        out = out + segment_sum(jnp.sum(Jt * Jv[:, :, None], axis=-2),
                                g.edge_j, num_segments=N)
        Jpv = jnp.sum(Jp * v[:, None, :], axis=-1)
        out = out + jnp.sum(Jp * Jpv[:, :, None], axis=-2)
        return out + lam * diag * v

    return Hv


def _block_diag(g: PoseGraph, Jf, Jt, Jp):
    """[N, 6, 6] block diagonal of the GN matrix (for preconditioning)."""
    N = g.poses.shape[0]
    D = segment_sum(_gram66(Jf), g.edge_i, num_segments=N)
    D = D + segment_sum(_gram66(Jt), g.edge_j, num_segments=N)
    return D + _gram66(Jp)


def _pcg(Hv, b, Dd_blocks, iters):
    """Block-Jacobi preconditioned CG on the [N, 6] increment; the
    preconditioner solve is the closed-form SPD 6x6 (no inverse storage)."""
    def apply_M(r):
        return linalg.solve6x6_spd(Dd_blocks, r)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = apply_M(r0)
    p0 = z0

    def body(_, carry):
        x, r, z, p = carry
        Hp = Hv(p)
        rz = jnp.sum(r * z)
        alpha = rz / jnp.maximum(jnp.sum(p * Hp), 1e-30)
        x = x + alpha * p
        r2 = r - alpha * Hp
        z2 = apply_M(r2)
        beta = jnp.sum(r2 * z2) / jnp.maximum(rz, 1e-30)
        p = z2 + beta * p
        return x, r2, z2, p

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x0, r0, z0, p0))
    return x


def _retract_all(poses, delta, active):
    def one(p, d):
        R, c = factors.retract_single(p, d)
        return jnp.concatenate([so3.log(R), c])
    newp = jax.vmap(one)(poses, delta)
    return jnp.where(active[:, None], newp, poses)


@partial(jax.jit, static_argnames=("iters", "cg_iters"))
def pgo_solve(g: PoseGraph, iters: int = 20, cg_iters: int = 60,
              lam0: float = 1e-4):
    """Levenberg-damped Gauss-Newton over the pose graph.

    Returns (poses [N, 6], final_cost, lam). Invalid poses pass through
    unchanged; the gauge is fixed by the prior entries.
    """
    active = g.pose_valid

    def outer(carry, _):
        poses, lam, cost = carry
        Jf, Jt, r, Jp, rp = _linearize(g, poses)
        b = -(segment_sum(jnp.sum(Jf * r[:, :, None], axis=-2),
                          g.edge_i, num_segments=g.poses.shape[0])
              + segment_sum(jnp.sum(Jt * r[:, :, None], axis=-2),
                            g.edge_j, num_segments=g.poses.shape[0])
              + jnp.sum(Jp * rp[:, :, None], axis=-2))
        D = _block_diag(g, Jf, Jt, Jp)
        diag = jnp.diagonal(D, axis1=-2, axis2=-1)
        diag = jnp.maximum(diag, 1e-8)
        Hv = _make_Hv(g, Jf, Jt, Jp, lam, diag)
        Dd = (D + (lam * diag + 1e-8)[:, :, None]
              * jnp.eye(6, dtype=D.dtype))
        delta = _pcg(Hv, b, Dd, cg_iters)
        new_poses = _retract_all(poses, delta, active)
        new_cost = pgo_cost(g, new_poses)
        accept = new_cost < cost
        poses = jnp.where(accept, new_poses, poses)
        cost2 = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9),
                        jnp.minimum(lam * 4.0, 1e6))
        return (poses, lam, cost2), cost2

    cost0 = pgo_cost(g)
    (poses, lam, cost), _ = jax.lax.scan(
        outer, (g.poses, jnp.asarray(lam0, g.poses.dtype), cost0),
        None, length=iters)
    return poses, cost, lam
