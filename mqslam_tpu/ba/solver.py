"""Damped Gauss-Newton (LM) with matrix-free Schur complement + PCG.

The TPU replacement for GTSAM's elimination (reference: bundle_adjust.cpp:
320-348 LevenbergMarquardtOptimizer / iSAM updates): at each outer iteration
the problem is linearized once (vmapped factor Jacobians); landmarks are
marginalized implicitly — the reduced camera operator

    B v = (Hcc + lam D) v - Hcp (Hpp + lam Dp)^-1 Hpc v

is applied via per-observation gathers, 2x6 / 2x3 block products and
segment-sums, never materializing Hcp. The reduced system solves with
Jacobi-preconditioned CG; landmark increments come from closed-form damped
3x3 back-substitution. Every primitive here shards: observations/landmarks
split across devices, the segment-sums become psums over the mesh (see
mqslam_tpu.parallel).
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.ops import segment_sum

from mqslam_tpu.ba import factors
from mqslam_tpu.ba.problem import BAProblem, BAVariables
from mqslam_tpu.ops import linalg

__all__ = ["linearize", "solve_delta", "apply_delta", "compute_cost",
           "lm_solve", "ba_solve"]


# Tiny block contractions as broadcast+sum (full f32 on TPU — einsum forms
# would lower to bf16 dot_general, see core.smallmat).
def _Jv(J, v):
    """[N, k, d] x [N, d] -> [N, k]"""
    return jnp.sum(J * v[:, None, :], axis=-1)


def _JTr(J, r):
    """[N, k, d] x [N, k] -> [N, d]"""
    return jnp.sum(J * r[:, :, None], axis=-2)


def _JTJ(J):
    """[N, k, d] -> [N, d, d]"""
    return jnp.sum(J[:, :, :, None] * J[:, :, None, :], axis=1)


def _JTJ_diag(J):
    """[N, k, d] -> [N, d]"""
    return jnp.sum(J * J, axis=1)


class Linearization(NamedTuple):
    r_obs: jnp.ndarray      # [O, 2] whitened
    J_obs_pose: jnp.ndarray   # [O, 2, 6]
    J_obs_point: jnp.ndarray  # [O, 2, 3]
    r_odo: jnp.ndarray      # [Q, 6]
    J_odo_from: jnp.ndarray   # [Q, 6, 6]
    J_odo_to: jnp.ndarray     # [Q, 6, 6]
    r_pp: jnp.ndarray       # [Rp, 6]
    J_pp: jnp.ndarray         # [Rp, 6, 6]
    r_qp: jnp.ndarray       # [Rq, 3] point-prior residual
    cost: jnp.ndarray
    g_pose: jnp.ndarray     # [F, 6] gradient wrt poses
    g_point: jnp.ndarray    # [P, 3] gradient wrt points
    Hpp: jnp.ndarray        # [P, 3, 3] point blocks (undamped)
    diag_pose: jnp.ndarray  # [F, 6] diag of Hcc
    pose_free: jnp.ndarray  # [F] bool — optimized pose entries
    point_free: jnp.ndarray  # [P] bool


def _pose6(v: BAVariables):
    return jnp.concatenate([v.pose_r, v.pose_t], axis=-1)  # [F, 6]


def _gather_obs(problem: BAProblem, v: BAVariables):
    p6 = _pose6(v)[problem.obs_pose]
    pts = v.points[problem.obs_point]
    cal = problem.calibrations[problem.obs_cam]
    inv_sig = jnp.where(problem.obs_valid,
                        1.0 / jnp.maximum(problem.obs_sigma, 1e-12), 0.0)
    return p6, pts, cal, inv_sig[:, None]


def _residuals(problem: BAProblem, v: BAVariables):
    p6 = _pose6(v)
    p6o, pts, cal, inv_sig = _gather_obs(problem, v)
    r_obs = factors.obs_residual(p6o, pts, problem.obs_uv, cal, inv_sig)
    inv_odo = jnp.where(problem.odo_valid[:, None],
                        1.0 / jnp.maximum(problem.odo_sigma, 1e-12), 0.0)
    r_odo = factors.odo_residual(p6[problem.odo_from], p6[problem.odo_to],
                                 problem.odo_r, problem.odo_t, inv_odo)
    inv_pp = jnp.where(problem.prior_pose_valid[:, None],
                       1.0 / jnp.maximum(problem.prior_pose_sigma, 1e-12),
                       0.0)
    r_pp = factors.prior_pose_residual(p6[problem.prior_pose_idx],
                                       problem.prior_pose_r,
                                       problem.prior_pose_t, inv_pp)
    inv_qp = jnp.where(problem.prior_point_valid,
                       1.0 / jnp.maximum(problem.prior_point_sigma, 1e-12),
                       0.0)
    r_qp = (v.points[problem.prior_point_idx]
            - problem.prior_point_xyz) * inv_qp[:, None]
    return r_obs, r_odo, r_pp, r_qp


@jax.jit
def compute_cost(problem: BAProblem, v: BAVariables):
    r_obs, r_odo, r_pp, r_qp = _residuals(problem, v)
    return 0.5 * (jnp.sum(r_obs ** 2) + jnp.sum(r_odo ** 2)
                  + jnp.sum(r_pp ** 2) + jnp.sum(r_qp ** 2))


@partial(jax.jit, static_argnames=("axis_name",))
def linearize(problem: BAProblem, v: BAVariables,
              axis_name: str = None) -> Linearization:
    """Linearize all factors. With ``axis_name`` set (inside shard_map), the
    observation arrays are device-sharded: their segment-sums are partial and
    get psum'ed over the mesh axis; odometry/prior terms are replicated."""
    F = problem.n_poses
    P = problem.n_points
    p6 = _pose6(v)

    p6o, pts, cal, inv_sig = _gather_obs(problem, v)
    r_obs = factors.obs_residual(p6o, pts, problem.obs_uv, cal, inv_sig)
    Jp6, Jpt = factors.obs_residual_jac(p6o, pts, problem.obs_uv, cal,
                                        inv_sig)

    inv_odo = jnp.where(problem.odo_valid[:, None],
                        1.0 / jnp.maximum(problem.odo_sigma, 1e-12), 0.0)
    r_odo = factors.odo_residual(p6[problem.odo_from], p6[problem.odo_to],
                                 problem.odo_r, problem.odo_t, inv_odo)
    Jof, Jot = factors.odo_residual_jac(
        p6[problem.odo_from], p6[problem.odo_to], problem.odo_r,
        problem.odo_t, inv_odo)

    inv_pp = jnp.where(problem.prior_pose_valid[:, None],
                       1.0 / jnp.maximum(problem.prior_pose_sigma, 1e-12),
                       0.0)
    r_pp = factors.prior_pose_residual(p6[problem.prior_pose_idx],
                                       problem.prior_pose_r,
                                       problem.prior_pose_t, inv_pp)
    Jpp = factors.prior_pose_residual_jac(p6[problem.prior_pose_idx],
                                          problem.prior_pose_r,
                                          problem.prior_pose_t, inv_pp)

    inv_qp = jnp.where(problem.prior_point_valid,
                       1.0 / jnp.maximum(problem.prior_point_sigma, 1e-12),
                       0.0)
    r_qp = (v.points[problem.prior_point_idx]
            - problem.prior_point_xyz) * inv_qp[:, None]

    # observation partial aggregates (sharded under shard_map)
    cost_obs = 0.5 * jnp.sum(r_obs ** 2)
    g_pose_obs = segment_sum(_JTr(Jp6, r_obs), problem.obs_pose,
                             num_segments=F)
    g_point_obs = segment_sum(_JTr(Jpt, r_obs), problem.obs_point,
                              num_segments=P)
    Hpp_obs = segment_sum(_JTJ(Jpt), problem.obs_point, num_segments=P)
    diag_obs = segment_sum(_JTJ_diag(Jp6), problem.obs_pose, num_segments=F)
    if axis_name is not None:
        cost_obs, g_pose_obs, g_point_obs, Hpp_obs, diag_obs = jax.lax.psum(
            (cost_obs, g_pose_obs, g_point_obs, Hpp_obs, diag_obs),
            axis_name)

    cost = cost_obs + 0.5 * (jnp.sum(r_odo ** 2) + jnp.sum(r_pp ** 2)
                             + jnp.sum(r_qp ** 2))

    # gradients g = J^T r
    g_pose = g_pose_obs + segment_sum(
        _JTr(Jof, r_odo), problem.odo_from,
        num_segments=F)
    g_pose = g_pose + segment_sum(
        _JTr(Jot, r_odo), problem.odo_to,
        num_segments=F)
    g_pose = g_pose + segment_sum(
        _JTr(Jpp, r_pp), problem.prior_pose_idx,
        num_segments=F)
    g_point = g_point_obs + segment_sum(
        r_qp * jnp.where(problem.prior_point_valid,
                         1.0 / jnp.maximum(problem.prior_point_sigma,
                                           1e-12), 0.0)[:, None],
        problem.prior_point_idx, num_segments=P)

    # point blocks Hpp (incl. point priors) and pose diagonal
    w_qp = jnp.where(problem.prior_point_valid,
                     1.0 / jnp.maximum(problem.prior_point_sigma, 1e-12),
                     0.0) ** 2
    Hpp = Hpp_obs + segment_sum(
        w_qp[:, None, None] * jnp.eye(3)[None], problem.prior_point_idx,
        num_segments=P)

    diag_pose = diag_obs + segment_sum(
        _JTJ_diag(Jof), problem.odo_from,
        num_segments=F)
    diag_pose = diag_pose + segment_sum(
        _JTJ_diag(Jot), problem.odo_to,
        num_segments=F)
    diag_pose = diag_pose + segment_sum(
        _JTJ_diag(Jpp), problem.prior_pose_idx,
        num_segments=F)

    # free = has any constraint and is marked valid
    pose_free = problem.pose_valid
    point_free = problem.point_valid & (
        jnp.trace(Hpp, axis1=-2, axis2=-1) > 0)

    return Linearization(
        r_obs=r_obs, J_obs_pose=Jp6, J_obs_point=Jpt, r_odo=r_odo,
        J_odo_from=Jof, J_odo_to=Jot, r_pp=r_pp, J_pp=Jpp, r_qp=r_qp,
        cost=cost, g_pose=g_pose, g_point=g_point, Hpp=Hpp,
        diag_pose=diag_pose, pose_free=pose_free, point_free=point_free)


def _hcc_apply(problem: BAProblem, lin: Linearization, v, axis_name=None):
    """v [F, 6] -> Hcc v (projection + odometry + prior parts, undamped)."""
    F = problem.n_poses
    y = _Jv(lin.J_obs_pose, v[problem.obs_pose])
    out = segment_sum(_JTr(lin.J_obs_pose, y),
                      problem.obs_pose, num_segments=F)
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    yo = (_Jv(lin.J_odo_from, v[problem.odo_from])
          + _Jv(lin.J_odo_to, v[problem.odo_to]))
    out = out + segment_sum(_JTr(lin.J_odo_from, yo),
                            problem.odo_from, num_segments=F)
    out = out + segment_sum(_JTr(lin.J_odo_to, yo),
                            problem.odo_to, num_segments=F)
    yp = _Jv(lin.J_pp, v[problem.prior_pose_idx])
    out = out + segment_sum(_JTr(lin.J_pp, yp),
                            problem.prior_pose_idx, num_segments=F)
    return out


def _w_t_apply(problem: BAProblem, lin: Linearization, v, axis_name=None):
    """v [F, 6] -> Hpc v = W^T v [P, 3]."""
    z = _Jv(lin.J_obs_pose, v[problem.obs_pose])
    out = segment_sum(_JTr(lin.J_obs_point, z),
                      problem.obs_point, num_segments=problem.n_points)
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out


def _w_apply(problem: BAProblem, lin: Linearization, u, axis_name=None):
    """u [P, 3] -> Hcp u = W u [F, 6]."""
    w = _Jv(lin.J_obs_point, u[problem.obs_point])
    out = segment_sum(_JTr(lin.J_obs_pose, w),
                      problem.obs_pose, num_segments=problem.n_poses)
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out


@partial(jax.jit, static_argnames=("cg_iters", "axis_name"))
def solve_delta(problem: BAProblem, lin: Linearization, lam,
                cg_iters: int = 100, cg_tol: float = 1e-6,
                axis_name: str = None):
    """Solve the damped normal equations for (delta_pose, delta_point)."""
    pose_mask = lin.pose_free[:, None].astype(jnp.float32)
    point_mask = lin.point_free[:, None].astype(jnp.float32)

    # damped Hpp (Marquardt scaling) + closed-form inverse
    dp = jnp.diagonal(lin.Hpp, axis1=-2, axis2=-1)
    Hpp_d = lin.Hpp + (lam * jnp.maximum(dp, 1e-12))[..., None] * jnp.eye(
        3, dtype=jnp.float32)[None]

    def hpp_solve(t):
        return linalg.solve3x3_sym(Hpp_d, t) * point_mask

    diag_d = lin.diag_pose * (1.0 + lam)

    def B_apply(vv):
        vv = vv * pose_mask
        hv = _hcc_apply(problem, lin, vv, axis_name) + (lam * jnp.maximum(
            lin.diag_pose, 1e-12)) * vv
        corr = _w_apply(problem, lin,
                        hpp_solve(_w_t_apply(problem, lin, vv, axis_name)),
                        axis_name)
        return (hv - corr) * pose_mask

    # reduced RHS: -g_c + W Hpp^-1 g_p
    b = (-lin.g_pose + _w_apply(problem, lin, hpp_solve(lin.g_point),
                                axis_name))
    b = b * pose_mask

    # Jacobi preconditioner from the damped pose diagonal
    Minv = jnp.where(diag_d > 1e-12, 1.0 / jnp.maximum(diag_d, 1e-12), 1.0)

    def cg_body(_, state):
        x, r, z, p, rz, done = state
        Ap = B_apply(p)
        pAp = jnp.sum(p * Ap)
        alpha = jnp.where(pAp > 1e-30, rz / pAp, 0.0)
        x2 = x + alpha * p
        r2 = r - alpha * Ap
        z2 = Minv * r2
        rz2 = jnp.sum(r2 * z2)
        beta = jnp.where(rz > 1e-30, rz2 / rz, 0.0)
        p2 = z2 + beta * p
        done2 = done | (jnp.sum(r2 * r2) < cg_tol ** 2 * jnp.sum(b * b))
        keep = lambda new, old: jnp.where(done, old, new)
        return (keep(x2, x), keep(r2, r), keep(z2, z), keep(p2, p),
                jnp.where(done, rz, rz2), done2)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = Minv * r0
    p0 = z0
    rz0 = jnp.sum(r0 * z0)
    x, *_ = jax.lax.fori_loop(0, cg_iters, cg_body,
                              (x0, r0, z0, p0, rz0, jnp.array(False)))
    delta_pose = x * pose_mask

    # back-substitute landmarks: dp = -Hpp^-1 (g_p + W^T dc)
    delta_point = -hpp_solve(lin.g_point
                             + _w_t_apply(problem, lin, delta_pose,
                                          axis_name))
    return delta_pose, delta_point


@jax.jit
def apply_delta(v: BAVariables, delta_pose, delta_point) -> BAVariables:
    """Manifold update: poses retract in the body frame (matching the
    linearization chart in ba.factors), points update additively."""
    from mqslam_tpu.core import so3
    from mqslam_tpu.core.smallmat import matmul_small, matvec_small
    R = so3.exp(v.pose_r)
    Rn = matmul_small(R, so3.exp(delta_pose[:, :3]))
    return BAVariables(pose_r=so3.log(Rn),
                       pose_t=v.pose_t + matvec_small(R, delta_pose[:, 3:]),
                       points=v.points + delta_point)


def lm_solve(problem: BAProblem, v0: BAVariables = None, max_iters: int = 60,
             lam0: float = 1e-6, lam_up: float = 8.0, lam_down: float = 2.0,
             cg_iters: int = 1000, cg_tol: float = 1e-10, rtol: float = 0.0,
             verbose: bool = False):
    """Levenberg-Marquardt outer loop (host-controlled accept/reject).

    Accuracy note: weakly-constrained SLAM chains have long, nearly-flat
    valleys (monocular drift modes). Walking them to the right basin needs
    NEAR-EXACT Newton steps — with truncated CG (say 100 iterations / 1e-6
    tolerance) the solver stalls in a spurious minimum with ~20x worse ATE
    even though the cost looks converged. Hence the high default cg_iters /
    tight cg_tol and rtol=0 (run the full iteration budget); measured on the
    reference's SVO dump this reproduces GTSAM's basin (ATE 0.024 vs its
    0.022, same final cost to 4 digits).
    """
    v = v0 or problem.init
    lam = lam0
    cost = float(compute_cost(problem, v))
    history = [cost]
    for it in range(max_iters):
        lin = linearize(problem, v)
        improved = False
        for _ in range(6):  # lambda escalation attempts
            dc, dp = solve_delta(problem, lin, jnp.float32(lam),
                                 cg_iters=cg_iters, cg_tol=cg_tol)
            v_try = apply_delta(v, dc, dp)
            new_cost = float(compute_cost(problem, v_try))
            if new_cost < cost:
                v = v_try
                cost = new_cost
                lam = max(lam / lam_down, 1e-9)
                improved = True
                break
            lam = min(lam * lam_up, 1e6)
        history.append(cost)
        if verbose:
            print(f"LM iter {it}: cost={cost:.6e} lam={lam:.2e}")
        if not improved:
            break
        if rtol > 0 and len(history) > 2 and (
                history[-2] - history[-1]) < rtol * max(history[-2], 1e-30):
            break
    return v, history


# alias used by the package __init__
ba_solve = lm_solve
