"""Damped Gauss-Newton (LM) over a Schur-complement reduced camera system.

The TPU replacement for GTSAM's elimination (reference: bundle_adjust.cpp:
320-348 LevenbergMarquardtOptimizer / iSAM updates): at each outer iteration
the problem is linearized once (vmapped factor Jacobians) and landmarks are
marginalized. Two solvers share that linearization:

- ``solve_delta_dense`` (single-device default): materialize the reduced
  system S = Hcc + lam D - W (Hpp + lam Dp)^-1 W^T with one scatter and one
  MXU matmul, equilibrate, Cholesky-factor, refine — exact Newton steps in
  a handful of dense ops (~22 LM iterations/s on the reference's real SVO
  dump on one v5e core vs ~3.4 for the 1000-iteration CG path).
- ``solve_delta`` (matrix-free PCG): the reduced operator

      B v = (Hcc + lam D) v - Hcp (Hpp + lam Dp)^-1 Hpc v

  applied via per-observation gathers, 2x6 / 2x3 block products and
  segment-sums, never materializing Hcp; CG preconditioned with the exact
  per-pose 6x6 diagonal blocks of S. Every primitive here shards:
  observations/landmarks split across devices, the segment-sums become
  psums over the mesh (see mqslam_tpu.parallel) — this is the path the
  sharded multi-chip solver uses, and the fallback for trajectories too
  long to materialize S.

Landmark increments come from closed-form damped 3x3 back-substitution in
both paths.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.ops import segment_sum

from mqslam_tpu.ba import factors
from mqslam_tpu.ba.problem import BAProblem, BAVariables
from mqslam_tpu.ops import linalg

__all__ = ["linearize", "solve_delta", "solve_delta_dense", "apply_delta", "compute_cost",
           "lm_solve", "ba_solve"]


_HP = jax.lax.Precision.HIGHEST  # exact-f32 MXU passes for dense matmuls

# Auto-method gates for the dense-Schur path. Besides the [6F, 6F] reduced
# system, solve_delta_dense materializes two [F*P, 6, 3] f32 transients
# (W and WH) — O(F*P) memory regardless of F — so "auto" must also bound
# F*P or a landmark-heavy graph (e.g. F=600, P=100k => ~5 GB) would OOM a
# 16 GB chip even though 6F fits. 8Mi pairs keeps the pair of transients
# around 1.2 GB. The same bound keeps the flat int32 scatter index
# obs_pose * P + obs_point well inside 2^31.
_DENSE_MAX_POSE_DIM = 4096
_DENSE_MAX_FP = 8 * 1024 * 1024


def dense_method_ok(problem: "BAProblem") -> bool:
    """True when solve_delta_dense is safe/sensible for this problem size."""
    return (problem.n_poses * 6 <= _DENSE_MAX_POSE_DIM
            and problem.n_poses * problem.n_points <= _DENSE_MAX_FP)


def _auto_layout(problem: "BAProblem"):
    """Host-side packed-layout build for the CG path (ba/packed.py).

    Returns None — COO applies — when the problem's observation masks are
    traced (incremental BA runs under jit) or when the padded tables would
    blow past the build's ratio guard.  The gather-free banded grid
    (ba/banded.py) is preferred when it builds; the dual packed layout is
    the fallback for observation structures the grid can't host."""
    from mqslam_tpu.ba.packed import build_packed_layout
    from mqslam_tpu.ba.banded import build_banded_layout
    try:
        bl = build_banded_layout(problem.obs_pose, problem.obs_point,
                                 problem.obs_valid, problem.n_poses,
                                 problem.n_points)
        if bl is not None:
            return bl
        return build_packed_layout(problem.obs_pose, problem.obs_point,
                                   problem.obs_valid, problem.n_poses,
                                   problem.n_points)
    except (jax.errors.TracerArrayConversionError,
            jax.errors.ConcretizationTypeError):
        return None


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


@partial(jax.jit, static_argnames=("axis_name",))
def compute_cost(problem: BAProblem, v: BAVariables,
                 axis_name: str = None):
    r_obs, r_odo, r_pp, r_qp = _residuals(problem, v)
    c_obs = 0.5 * jnp.sum(r_obs ** 2)
    if axis_name is not None:  # obs arrays sharded: psum the partial sum
        c_obs = jax.lax.psum(c_obs, axis_name)
    return c_obs + 0.5 * (jnp.sum(r_odo ** 2)
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


def _hcc_rest(problem: BAProblem, lin: Linearization, v):
    """v [F, 6] -> (odometry + prior) part of Hcc v — O(F), layout-free."""
    F = problem.n_poses
    yo = (_Jv(lin.J_odo_from, v[problem.odo_from])
          + _Jv(lin.J_odo_to, v[problem.odo_to]))
    out = segment_sum(_JTr(lin.J_odo_from, yo),
                      problem.odo_from, num_segments=F)
    out = out + segment_sum(_JTr(lin.J_odo_to, yo),
                            problem.odo_to, num_segments=F)
    yp = _Jv(lin.J_pp, v[problem.prior_pose_idx])
    out = out + segment_sum(_JTr(lin.J_pp, yp),
                            problem.prior_pose_idx, num_segments=F)
    return out


def _hcc_apply(problem: BAProblem, lin: Linearization, v, axis_name=None):
    """v [F, 6] -> Hcc v (projection + odometry + prior parts, undamped)."""
    F = problem.n_poses
    y = _Jv(lin.J_obs_pose, v[problem.obs_pose])
    out = segment_sum(_JTr(lin.J_obs_pose, y),
                      problem.obs_pose, num_segments=F)
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out + _hcc_rest(problem, lin, v)


def _pad0(a):
    return jnp.concatenate([a, jnp.zeros((1,) + a.shape[1:], a.dtype)])


def pack_jacobians(lin: Linearization, layout):
    """Gather the per-observation Jacobians into the dual dense layout —
    ONCE per linearization (the gathers cost a few CG iterations;
    re-packing per solve attempt would give most of the win back).
    BOTH Jacobians land in BOTH layouts so every cross product contracts
    in place and only the [F, 6]/[P, 3] state vectors are ever
    gathered.

    The 5th entry is the per-pose observation Gram G_f = sum_k Jp^T Jp
    [F, 6, 6]: the CG iteration's Hcc-obs leg is EXACTLY G_f @ v_f, so
    precomputing it replaces two full reads of the 18.6 MB (corridor
    scale) Jp_f table per iteration with a 0.3 MB one — measured
    2.23 -> 1.55 ms/CG-iter at F=2048/O=370k."""
    Jp_f = _pad0(lin.J_obs_pose)[layout.fslot]      # [F, Kf, 2, 6]
    G = jnp.sum(Jp_f[:, :, :, :, None] * Jp_f[:, :, :, None, :],
                axis=(1, 2))                        # [F, 6, 6]
    return (Jp_f,
            _pad0(lin.J_obs_point)[layout.fslot],   # [F, Kf, 2, 3]
            _pad0(lin.J_obs_point)[layout.pslot],   # [P, Kp, 2, 3]
            _pad0(lin.J_obs_pose)[layout.pslot],    # [P, Kp, 2, 6]
            G)


# module-level jit: one compilation cache shared by every lm_solve call
_pack_jacobians_jit = jax.jit(pack_jacobians)


def _pack_dispatch(lin: Linearization, layout, axis_name=None):
    """Trace-context pack for whichever CG layout is in play: banded grid
    tables (single-device or sharded, ba/banded.py) or the dual packed
    layout."""
    from mqslam_tpu.ba.banded import (BandedLayout, pack_banded,
                                      ShardedBandedLayout,
                                      pack_banded_sharded)
    if isinstance(layout, ShardedBandedLayout):
        return pack_banded_sharded(lin, layout, axis_name)
    if isinstance(layout, BandedLayout):
        return pack_banded(lin, layout)
    return pack_jacobians(lin, layout)


# module-level jit: one compilation per (layout structure)
pack_for_layout = jax.jit(_pack_dispatch, static_argnames=())


def _packed_ops(problem: BAProblem, lin: Linearization, layout,
                packedJ=None):
    """Dense closure applies for the CG hot loop over the packed layout
    (ba/packed.py).

    Every apply is broadcast+sum (full-f32 VPU, bandwidth-bound) plus at
    most one gather of the small replicated [F, 6]/[P, 3] state vector
    (pid_f/fid_p row ids); no scatter-adds and no per-observation
    permutations (an earlier form permuted flat [O, 2] tensors between
    the layouts — that gather alone was ~3.3 ms of a 3.98 ms CG
    iteration at F=2048).  Padding slots index appended zero rows and
    contribute nothing.
    """
    from mqslam_tpu.ba.packed import apply_chunked

    pad0 = _pad0
    Jp_f, Jt_f, Jt_p, Jp_p, G = (pack_jacobians(lin, layout)
                                 if packedJ is None else packedJ)

    def hcc_obs_v(v):                            # [F, 6] -> [F, 6]
        return jnp.sum(G * v[:, None, :], axis=-1)

    def gather_f(v):                             # v[fid_p] -> [P, Kp, 6]
        if layout.wg_fid is not None:            # pack-row form, ~9x
            return apply_chunked(layout.wg_fid, v)
        return pad0(v)[layout.fid_p]

    def gather_p(u):                             # u[pid_f] -> [F, Kf, d]
        if layout.wg_pid is not None:
            return apply_chunked(layout.wg_pid, u)
        return pad0(u)[layout.pid_f]

    def wt_from_v(v):                            # [F, 6] -> [P, 3]
        vp = gather_f(v)                                 # [P, Kp, 6]
        z_pm = jnp.sum(Jp_p * vp[:, :, None, :], axis=-1)  # [P, Kp, 2]
        return jnp.sum(Jt_p * z_pm[..., None], axis=(1, 2))

    def w_apply(u):                              # [P, 3] -> [F, 6]
        uf = gather_p(u)                                 # [F, Kf, 3]
        w_f = jnp.sum(Jt_f * uf[:, :, None, :], axis=-1)   # [F, Kf, 2]
        return jnp.sum(Jp_f * w_f[..., None], axis=(1, 2))

    def precond_obs_blocks(Hpp_inv):             # -> [F, 6, 6]
        Hj = pad0(Hpp_inv)[layout.pid_f]                     # [F, Kf, 3, 3]
        A = jnp.sum(Jp_f[:, :, :, :, None] * Jt_f[:, :, :, None, :],
                    axis=2)                                  # [F, Kf, 6, 3]
        AH = jnp.sum(A[:, :, :, :, None] * Hj[:, :, None, :, :],
                     axis=3)                                 # [F, Kf, 6, 3]
        AHA = jnp.sum(AH[:, :, :, None, :] * A[:, :, None, :, :],
                      axis=-1)                               # [F, Kf, 6, 6]
        return G - jnp.sum(AHA, axis=1)          # JJ term == the Gram

    return hcc_obs_v, wt_from_v, w_apply, precond_obs_blocks


def _packed_ops_rows(problem: BAProblem, lin: Linearization, layout,
                     packedJ=None):
    """Packed applies for a per-device compact layout (one shard of
    ba.packed.ShardedPackedLayout, leading axis squeezed).

    Identical dense math to _packed_ops, but the tables cover only this
    device's Fd poses / Pd landmarks: replicated [F, 6]/[P, 3] vectors are
    gathered down through the row maps, partial results scatter-add back
    through them ([Fd, 6] rows — 2-3 orders smaller than the COO form's
    per-observation scatters).  Outputs are PARTIAL sums: the caller psums
    over the mesh axis.  Also valid single-device (psum = identity).
    """
    pad0 = _pad0
    F = problem.n_poses
    P = problem.n_points
    Jp_f, Jt_f, Jt_p, Jp_p, G = (pack_jacobians(lin, layout)
                                 if packedJ is None else packedJ)

    def scat_f(part):                            # [Fd, x] -> [F, x] partial
        return jnp.zeros((F + 1,) + part.shape[1:], part.dtype).at[
            layout.rows_f].add(part)[:F]

    def scat_p(part):                            # [Pd, x] -> [P, x] partial
        return jnp.zeros((P + 1,) + part.shape[1:], part.dtype).at[
            layout.rows_p].add(part)[:P]

    def hcc_obs_v(v):                            # [F, 6] -> [F, 6] partial
        vloc = pad0(v)[layout.rows_f]            # [Fd, 6] (local Gram)
        return scat_f(jnp.sum(G * vloc[:, None, :], axis=-1))

    def wt_from_v(v):                            # [F, 6] -> [P, 3]
        vp = pad0(v)[layout.fid_p]               # [Pd, Kp, 6] (global ids)
        z_pm = jnp.sum(Jp_p * vp[:, :, None, :], axis=-1)
        return scat_p(jnp.sum(Jt_p * z_pm[..., None], axis=(1, 2)))

    def w_apply(u):                              # [P, 3] -> [F, 6]
        uf = pad0(u)[layout.pid_f]               # [Fd, Kf, 3] (global ids)
        w_f = jnp.sum(Jt_f * uf[:, :, None, :], axis=-1)
        return scat_f(jnp.sum(Jp_f * w_f[..., None], axis=(1, 2)))

    def precond_obs_blocks(Hpp_inv):             # -> [F, 6, 6]
        Hj = pad0(Hpp_inv)[layout.pid_f]                     # [Fd,Kf,3,3]
        A = jnp.sum(Jp_f[:, :, :, :, None] * Jt_f[:, :, :, None, :],
                    axis=2)                                  # [Fd,Kf,6,3]
        AH = jnp.sum(A[:, :, :, :, None] * Hj[:, :, None, :, :], axis=3)
        AHA = jnp.sum(AH[:, :, :, None, :] * A[:, :, None, :, :], axis=-1)
        return scat_f(G - jnp.sum(AHA, axis=1))  # JJ term == local Gram

    return hcc_obs_v, wt_from_v, w_apply, precond_obs_blocks


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
                axis_name: str = None, layout=None, packedJ=None):
    """Solve the damped normal equations for (delta_pose, delta_point).

    Returns (delta_pose, delta_point, cg_iters_used). The reduced camera
    system is solved by CG preconditioned with its exact per-pose 6x6
    diagonal blocks (block Jacobi): for BA each (pose, point) pair carries
    one observation, so diag_blk(S)_i = sum_obs Jp^T Jp + odo/prior blocks
    + damping - sum_obs A (Hpp+lam Dp)^-1 A^T with A = Jp^T Jpt is exact,
    and CG converges in a fraction of the scalar-Jacobi iteration count.
    The loop exits early once ||r|| <= cg_tol * ||b|| (while_loop — unlike
    a masked fori, converged solves stop paying matvecs).
    """
    # Layout dispatch: the global-table PackedLayout is single-device; a
    # squeezed ShardedPackedLayout shard (row-mapped compact tables) is the
    # packed form for sharded solves — its partial outputs psum over the
    # mesh axis, one collective per matvec leg, same as the COO form.
    from mqslam_tpu.ba.banded import (BandedLayout, banded_hooks,
                                      ShardedBandedLayout,
                                      banded_hooks_sharded)
    has_rows = layout is not None and hasattr(layout, "rows_f")
    is_sbanded = isinstance(layout, ShardedBandedLayout)
    assert layout is None or has_rows or is_sbanded \
        or axis_name is None, \
        ("global packed layout is single-device; shard with "
         "ba.packed.build_sharded_packed_layout or "
         "ba.banded.build_sharded_banded_layout for axis_name solves")
    psum_ = ((lambda x: jax.lax.psum(x, axis_name))
             if axis_name is not None else (lambda x: x))
    pose_mask = lin.pose_free[:, None].astype(jnp.float32)
    point_mask = lin.point_free[:, None].astype(jnp.float32)
    F = problem.n_poses

    # damped Hpp (Marquardt scaling) + closed-form inverse
    dp = jnp.diagonal(lin.Hpp, axis1=-2, axis2=-1)
    Hpp_d = lin.Hpp + (lam * jnp.maximum(dp, 1e-12))[..., None] * jnp.eye(
        3, dtype=jnp.float32)[None]

    def hpp_solve(t):
        return linalg.solve3x3_sym(Hpp_d, t) * point_mask

    # damped per-landmark inverse: used by the block-Jacobi preconditioner
    # in every path and by the banded hooks' grid copy
    Hpp_inv = linalg.inv3x3(Hpp_d) * point_mask[..., None]  # [P, 3, 3]

    is_banded = isinstance(layout, BandedLayout) or is_sbanded
    if is_banded:
        if is_sbanded:
            assert axis_name is not None, \
                "sharded banded layout requires a mesh axis"
            hooks = banded_hooks_sharded(problem, lin, layout, packedJ,
                                         Hpp_inv, axis_name)
        else:
            assert axis_name is None, "banded layout is single-device"
            hooks = banded_hooks(problem, lin, layout, packedJ, Hpp_inv)

        def B_apply(vv):
            vv = vv * pose_mask
            hv = (hooks.hcc(vv) + _hcc_rest(problem, lin, vv)
                  + (lam * jnp.maximum(lin.diag_pose, 1e-12)) * vv)
            return (hv - hooks.corr(vv)) * pose_mask

        b = -lin.g_pose + hooks.w_full(hpp_solve(lin.g_point))
    elif layout is not None:
        _ops = _packed_ops_rows if has_rows else _packed_ops
        _hcc_obs, _wt_v, _w_ap, _pre_obs = _ops(
            problem, lin, layout, packedJ)

        def B_apply(vv):
            vv = vv * pose_mask
            hv = (psum_(_hcc_obs(vv)) + _hcc_rest(problem, lin, vv)
                  + (lam * jnp.maximum(lin.diag_pose, 1e-12)) * vv)
            corr = psum_(_w_ap(hpp_solve(psum_(_wt_v(vv)))))
            return (hv - corr) * pose_mask

        b = -lin.g_pose + psum_(_w_ap(hpp_solve(lin.g_point)))
    else:
        def B_apply(vv):
            vv = vv * pose_mask
            hv = _hcc_apply(problem, lin, vv, axis_name) + (
                lam * jnp.maximum(lin.diag_pose, 1e-12)) * vv
            corr = _w_apply(problem, lin,
                            hpp_solve(_w_t_apply(problem, lin, vv,
                                                 axis_name)),
                            axis_name)
            return (hv - corr) * pose_mask

        # reduced RHS: -g_c + W Hpp^-1 g_p
        b = (-lin.g_pose + _w_apply(problem, lin, hpp_solve(lin.g_point),
                                    axis_name))
    b = b * pose_mask

    # ---- block-Jacobi preconditioner: exact 6x6 diagonal blocks of B ----
    # Exactness (and hence guaranteed SPD-ness) of these blocks relies on at
    # most ONE observation per (pose, point) pair — then
    # sum_obs A Hpp^-1 A^T == W_fp Hpp^-1 W_fp^T blockwise. This is an
    # invariant of the BA data model (each landmark is measured once per
    # frame) enforced by ba.validate.validate_data_integrity; with
    # duplicates the preconditioner degrades but CG itself stays correct.
    eye6 = jnp.eye(6, dtype=jnp.float32)
    if is_banded:
        blk = hooks.pre()
    elif layout is not None:
        blk = psum_(_pre_obs(Hpp_inv))
    else:
        # per-observation W block A = Jp^T Jpt [O, 6, 3] and its Schur
        # correction A Hpp_j^-1 A^T (elementwise contractions: full f32)
        A = jnp.sum(lin.J_obs_pose[:, :, :, None]
                    * lin.J_obs_point[:, :, None, :], axis=1)
        Hj = Hpp_inv[problem.obs_point]
        AH = jnp.sum(A[:, :, :, None] * Hj[:, None, :, :], axis=2)
        AHA = jnp.sum(AH[:, :, None, :] * A[:, None, :, :],
                      axis=3)  # [O, 6, 6]
        blk = segment_sum(_JTJ(lin.J_obs_pose) - AHA, problem.obs_pose,
                          num_segments=F)
        if axis_name is not None:
            blk = jax.lax.psum(blk, axis_name)
    blk = blk + segment_sum(_JTJ(lin.J_odo_from), problem.odo_from,
                            num_segments=F)
    blk = blk + segment_sum(_JTJ(lin.J_odo_to), problem.odo_to,
                            num_segments=F)
    blk = blk + segment_sum(_JTJ(lin.J_pp), problem.prior_pose_idx,
                            num_segments=F)
    blk = blk + (lam * jnp.maximum(lin.diag_pose, 1e-12))[:, :, None] * eye6
    blk = jnp.where(lin.pose_free[:, None, None], blk, eye6[None])

    def Minv_apply(rr):
        return linalg.solve6x6_spd(blk, rr) * pose_mask

    bb = jnp.sum(b * b)

    def cg_cond(state):
        it, x, r, z, p, rz = state
        return (it < cg_iters) & (jnp.sum(r * r) > cg_tol ** 2 * bb)

    def cg_body(state):
        it, x, r, z, p, rz = state
        Ap = B_apply(p)
        pAp = jnp.sum(p * Ap)
        alpha = jnp.where(pAp > 1e-30, rz / pAp, 0.0)
        x2 = x + alpha * p
        r2 = r - alpha * Ap
        z2 = Minv_apply(r2)
        rz2 = jnp.sum(r2 * z2)
        beta = jnp.where(rz > 1e-30, rz2 / rz, 0.0)
        p2 = z2 + beta * p
        return it + 1, x2, r2, z2, p2, rz2

    z0 = Minv_apply(b)
    it, x, *_ = jax.lax.while_loop(
        cg_cond, cg_body,
        (jnp.int32(0), jnp.zeros_like(b), b, z0, z0, jnp.sum(b * z0)))
    delta_pose = x * pose_mask

    # back-substitute landmarks: dp = -Hpp^-1 (g_p + W^T dc)
    if is_banded:
        wt_dc = hooks.wt_full(delta_pose)
    elif layout is not None:
        wt_dc = psum_(_wt_v(delta_pose))
    else:
        wt_dc = _w_t_apply(problem, lin, delta_pose, axis_name)
    delta_point = -hpp_solve(lin.g_point + wt_dc)
    return delta_pose, delta_point, it


@jax.jit
def solve_delta_dense(problem: BAProblem, lin: Linearization, lam):
    """Direct dense-Schur solve of the damped normal equations.

    The TPU-idiomatic fast path for single-device problems: with F poses the
    reduced camera system S is only [6F, 6F] — materialize it with one
    scatter of the per-observation W blocks plus one MXU matmul
    (W Hpp^-1 W^T), Cholesky-factor, and solve exactly. Replaces ~10^3
    latency-bound CG iterations (gather + segment-sum per matvec) with
    ~50 dense ops; on the reference's real SVO dump (F=186, P=1046,
    O=7.5k) one LM iteration drops from ~300 ms to single-digit ms.
    GTSAM's elimination (bundle_adjust.cpp:320-329) plays this role in the
    reference. Used automatically by lm_solve when 6F <= 4096; the
    matrix-free CG path remains for sharded / very-long-trajectory solves.
    """
    F = problem.n_poses
    P = problem.n_points
    # the flat scatter index below is int32; shapes are static so this is
    # a trace-time check (lm_solve's "auto" stays far below via dense_method_ok)
    assert F * P < 2 ** 31, (
        f"dense path scatter index overflows int32 (F*P = {F * P}); "
        "use method='cg'")
    n = F * 6
    pose_mask = lin.pose_free[:, None].astype(jnp.float32)
    point_mask = lin.point_free[:, None].astype(jnp.float32)

    dp = jnp.diagonal(lin.Hpp, axis1=-2, axis2=-1)
    Hpp_d = lin.Hpp + (lam * jnp.maximum(dp, 1e-12))[..., None] * jnp.eye(
        3, dtype=jnp.float32)[None]

    def hpp_solve(t):
        return linalg.solve3x3_sym(Hpp_d, t) * point_mask

    Hpp_inv = linalg.inv3x3(Hpp_d) * point_mask[..., None]  # [P, 3, 3]

    # dense W [F, P, 6, 3] from per-observation blocks A = Jp^T Jpt
    A = jnp.sum(lin.J_obs_pose[:, :, :, None]
                * lin.J_obs_point[:, :, None, :], axis=1)
    W = jnp.zeros((F * P, 6, 3), jnp.float32).at[
        problem.obs_pose * P + problem.obs_point].add(A).reshape(F, P, 6, 3)
    WH = jnp.einsum("fpab,pbc->fpac", W, Hpp_inv, precision=_HP)
    S2 = jnp.einsum("fpac,gpbc->fagb", WH, W,
                    precision=_HP).reshape(n, n)

    # dense Hcc: per-pose diagonal blocks + odometry cross blocks
    Hd = segment_sum(_JTJ(lin.J_obs_pose), problem.obs_pose, num_segments=F)
    Hd = Hd + segment_sum(_JTJ(lin.J_odo_from), problem.odo_from,
                          num_segments=F)
    Hd = Hd + segment_sum(_JTJ(lin.J_odo_to), problem.odo_to,
                          num_segments=F)
    Hd = Hd + segment_sum(_JTJ(lin.J_pp), problem.prior_pose_idx,
                          num_segments=F)
    cross = jnp.sum(lin.J_odo_from[:, :, :, None]
                    * lin.J_odo_to[:, :, None, :], axis=1)  # [Q, 6, 6]
    Hcc = jnp.zeros((F * F, 6, 6), jnp.float32)
    Hcc = Hcc.at[jnp.arange(F) * (F + 1)].add(Hd)
    Hcc = Hcc.at[problem.odo_from * F + problem.odo_to].add(cross)
    Hcc = Hcc.at[problem.odo_to * F + problem.odo_from].add(
        jnp.swapaxes(cross, -1, -2))
    Hcc = Hcc.reshape(F, F, 6, 6).transpose(0, 2, 1, 3).reshape(n, n)

    # damped reduced system; fixed poses become identity rows/cols
    free6 = jnp.repeat(lin.pose_free, 6)
    diag6 = (lam * jnp.maximum(lin.diag_pose, 1e-12)).reshape(n)
    S = Hcc - S2
    S = jnp.where(free6[:, None] & free6[None, :], S, 0.0)
    S = S + jnp.diag(jnp.where(free6, diag6, 1.0))

    b = (-lin.g_pose + _w_apply(problem, lin, hpp_solve(lin.g_point)))
    b = (b * pose_mask).reshape(n)

    # Jacobi equilibration: factor D^-1/2 S D^-1/2 (condition number drops
    # by the scale spread between rotation/translation blocks — matters for
    # an f32 Cholesky on a monocular-BA system)
    d = jnp.sqrt(jnp.maximum(jnp.diagonal(S), 1e-30))
    Ssc = S / (d[:, None] * d[None, :])
    L = jnp.linalg.cholesky(Ssc)

    def cho_solve(rhs):
        y = jax.scipy.linalg.solve_triangular(L, rhs / d, lower=True)
        return jax.scipy.linalg.solve_triangular(L, y, lower=True,
                                                 trans=1) / d

    x = cho_solve(b)
    # iterative-refinement passes absorb f32 factorization roundoff
    for _ in range(2):
        r = b - jnp.matmul(S, x, precision=_HP)
        x = x + cho_solve(r)

    delta_pose = x.reshape(F, 6) * pose_mask
    delta_point = -hpp_solve(lin.g_point
                             + _w_t_apply(problem, lin, delta_pose))
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
             method: str = "auto", verbose: bool = False, layout="auto"):
    """Levenberg-Marquardt outer loop (host-controlled accept/reject).

    method: "dense" (direct dense-Schur Cholesky, see solve_delta_dense),
    "cg" (matrix-free Schur + PCG), or "auto" — dense whenever both the
    reduced camera system (6F) and the dense path's O(F*P) W transients fit
    comfortably (dense_method_ok).

    Accuracy note: weakly-constrained SLAM chains have long, nearly-flat
    valleys (monocular drift modes). Walking them to the right basin needs
    NEAR-EXACT Newton steps — with truncated CG (say 100 iterations / 1e-6
    tolerance) the solver stalls in a spurious minimum with ~20x worse ATE
    even though the cost looks converged. The dense path solves exactly;
    the CG path keeps the high default cg_iters / tight cg_tol and rtol=0
    (run the full iteration budget). Measured on the reference's SVO dump
    both land in GTSAM's basin (same final cost to 4 digits; within its
    flat valley the f32 stopping ATE wanders ~0.022-0.030 — the f64
    finishing pass, ba/polish64.py, settles either to 0.02145 vs GTSAM's
    0.021598).
    """
    if method == "auto":
        method = "dense" if dense_method_ok(problem) else "cg"
    if layout == "auto":
        layout = _auto_layout(problem) if method == "cg" else None
    v = v0 or problem.init
    lam = lam0
    cost = float(compute_cost(problem, v))
    history = [cost]
    for it in range(max_iters):
        lin = linearize(problem, v)
        pJ = (pack_for_layout(lin, layout)
              if layout is not None and method != "dense" else None)
        improved = False
        for _ in range(6):  # lambda escalation attempts
            if method == "dense":
                dc, dp = solve_delta_dense(problem, lin, jnp.float32(lam))
            else:
                dc, dp, _ = solve_delta(problem, lin, jnp.float32(lam),
                                        cg_iters=cg_iters, cg_tol=cg_tol,
                                        layout=layout, packedJ=pJ)
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


@partial(jax.jit, static_argnames=("max_iters", "max_retries", "method",
                                   "cg_iters", "axis_name"))
def _lm_device_loop(problem: BAProblem, v0: BAVariables, max_iters: int,
                    lam0, lam_up, lam_down, max_retries: int, method: str,
                    cg_iters: int, cg_tol, layout=None,
                    axis_name: str = None):
    assert axis_name is None or method == "cg", \
        "the sharded device loop is CG-only (dense needs global W)"

    def solve(lin, lam, packedJ=None):
        if method == "dense":
            return solve_delta_dense(problem, lin, lam)
        dc, dp, _ = solve_delta(problem, lin, lam, cg_iters=cg_iters,
                                cg_tol=cg_tol, layout=layout,
                                packedJ=packedJ, axis_name=axis_name)
        return dc, dp

    def v_where(pred, a: BAVariables, b: BAVariables) -> BAVariables:
        return jax.tree_util.tree_map(
            lambda x, y: jnp.where(pred, x, y), a, b)

    def attempt_cond(st):
        k, _, accepted, *_ = st
        return (k < max_retries) & ~accepted

    def outer_body(st):
        it, v, lam, cost, _, hist = st
        lin = linearize(problem, v, axis_name=axis_name)
        # pack once per linearization; the attempt loop reuses it
        pJ = (_pack_dispatch(lin, layout, axis_name)
              if layout is not None and method != "dense" else None)

        def attempt_body(st2):
            k, lam, accepted, v, cost = st2
            dc, dp = solve(lin, lam, pJ)
            v_try = apply_delta(v, dc, dp)
            new_cost = compute_cost(problem, v_try, axis_name=axis_name)
            ok = new_cost < cost
            v = v_where(ok, v_try, v)
            cost = jnp.where(ok, new_cost, cost)
            lam = jnp.where(ok, jnp.maximum(lam / lam_down, 1e-9),
                            jnp.minimum(lam * lam_up, 1e6))
            return k + 1, lam, accepted | ok, v, cost

        _, lam, accepted, v, cost = jax.lax.while_loop(
            attempt_cond, attempt_body,
            (jnp.int32(0), lam, jnp.bool_(False), v, cost))
        hist = hist.at[it + 1].set(cost)
        return it + 1, v, lam, cost, accepted, hist

    def outer_cond(st):
        it, _, _, _, improving, _ = st
        return (it < max_iters) & improving

    cost0 = compute_cost(problem, v0, axis_name=axis_name)
    hist = jnp.full(max_iters + 1, jnp.nan, jnp.float32).at[0].set(cost0)
    it, v, _, cost, _, hist = jax.lax.while_loop(
        outer_cond, outer_body,
        (jnp.int32(0), v0, jnp.float32(lam0), cost0, jnp.bool_(True), hist))
    return v, hist, it


def lm_solve_device(problem: BAProblem, v0: BAVariables = None,
                    max_iters: int = 60, lam0: float = 1e-6,
                    lam_up: float = 8.0, lam_down: float = 2.0,
                    max_retries: int = 6, cg_iters: int = 1000,
                    cg_tol: float = 1e-10, method: str = "auto",
                    layout="auto"):
    """lm_solve with the ENTIRE outer loop on device (lax.while_loop).

    Same LM policy as lm_solve (linearize once per outer iteration, up to
    ``max_retries`` lambda-escalation solve attempts against that
    linearization, multiplicative lambda schedule, stop when no attempt
    improves) but zero host round-trips: one dispatch runs all iterations.
    On a tunneled TPU backend the host loop pays ~30-45 ms of RTT + sync
    per iteration (~22 LM iterations/s on the reference's real SVO dump);
    this path is bounded by the solver math instead. The cost trajectory
    can differ from lm_solve only through f32 accept-comparison roundoff
    (host compares Python floats, this compares on-device f32 — same
    values).

    Returns (v, history_list, n_iters) with history trimmed to the
    accepted-iteration prefix, matching lm_solve's history semantics.
    """
    if method == "auto":
        method = "dense" if dense_method_ok(problem) else "cg"
    if layout == "auto":
        layout = _auto_layout(problem) if method == "cg" else None
    v = v0 or problem.init
    v, hist, it = _lm_device_loop(problem, v, max_iters,
                                  jnp.float32(lam0), jnp.float32(lam_up),
                                  jnp.float32(lam_down), max_retries, method,
                                  cg_iters, jnp.float32(cg_tol),
                                  layout=layout)
    # ONE bulk transfer: per-element float(h) fetches would each pay the
    # tunneled backend's ~30 ms round-trip and dominate the whole solve
    hist_np, n = jax.device_get((hist, it))
    n = int(n)
    return v, [float(h) for h in hist_np[:n + 1]], n


# alias used by the package __init__
ba_solve = lm_solve
