"""Step-batched incremental bundle adjustment.

Replicates the step semantics of the reference's incremental modes
(reference: bundle_adjust.cpp:245-366 performBundleAdjustment with
iSAM1/iSAM2): factors and variables activate step by step, newly-activated
variables start from the front-end estimates while already-active ones keep
their optimized values, and a few damped-GN iterations run per step (the
iSAM update role). A full-batch LM runs when the second landmark batch
arrives (fullOptimizeAtSecondPoints3DBatch, :320-329).

TPU shape: ONE padded problem with per-element activation steps; per-step
masking is traced data, so the whole incremental run reuses a single
compiled (linearize, solve) pair — no recompilation as the graph grows.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from mqslam_tpu.ba import solver as bs
from mqslam_tpu.ba.problem import BAProblem

__all__ = ["activation_steps", "incremental_solve",
           "incremental_solve_device"]


def activation_steps(data, problem: BAProblem):
    """(obs_step [O], odo_step [Q], pose_step [F], point_step [P]) int arrays:
    the step at which each factor/variable enters the graph."""
    C = data.nr_cameras
    S = data.nr_steps
    NEVER = np.iinfo(np.int32).max

    pose_valid = np.asarray(problem.pose_valid)
    point_valid = np.asarray(problem.point_valid)
    P_n = len(data.points3D)

    obs_steps = []
    for c in range(C):
        for s in range(min(S, len(data.point2D3D_assocs[c]))):
            for (f_idx, p2d, p3d) in data.point2D3D_assocs[c][s]:
                f_idx, p3d = int(f_idx), int(p3d)
                if f_idx >= S or not pose_valid[c * S + f_idx]:
                    continue
                if p3d >= P_n or not point_valid[p3d]:
                    continue
                obs_steps.append(s)
    O = problem.obs_uv.shape[0]
    obs_step = np.full(O, NEVER, np.int32)
    obs_step[:len(obs_steps)] = obs_steps

    odo_steps = []
    for s in range(min(S, len(data.odometry_assocs))):
        for (fc, ff, tc, tf) in data.odometry_assocs[s]:
            if ff >= S or tf >= S:
                continue
            if not (pose_valid[fc * S + ff] and pose_valid[tc * S + tf]):
                continue
            odo_steps.append(s)
    Q = problem.odo_r.shape[0]
    odo_step = np.full(Q, NEVER, np.int32)
    odo_step[:len(odo_steps)] = odo_steps

    F = problem.n_poses
    pose_step = np.array([f % S for f in range(F)], np.int32)

    point_step = np.full(problem.n_points, NEVER, np.int32)
    for s in range(S):
        for idx in data.point3D_added_idxs[s]:
            if idx < problem.n_points:
                point_step[idx] = s
    return (jnp.asarray(obs_step), jnp.asarray(odo_step),
            jnp.asarray(pose_step), jnp.asarray(point_step))


def incremental_solve(data, problem: BAProblem, use_odometry=True,
                      iters_per_step=2, full_lm_iters=10,
                      cg_iters=300, lam0=1e-4, verbose=False,
                      max_steps=None, method="auto"):
    """Run the step-batched incremental BA. Returns (variables, cost_history).

    Mirrors the reference's control flow: full LM when the second landmark
    batch appears (and at the final step), incremental updates otherwise.
    ``max_steps`` truncates the run (testing hook). ``method`` as in
    lm_solve — per-step masks are traced data, so the dense path too reuses
    one compiled (linearize, solve) pair across all steps.

    Real-data note: the reference's iSAM1/iSAM2 modes throw
    IndeterminantLinearSystemException on its own slam2 dumps and the
    thesis fell back to full batch LM (bundle_adjustment/ReadMe.txt "for
    the moment, the incremental approaches fail"). This step-batched
    masked-LM formulation COMPLETES on the same real SVO dump (~2 min on a
    v5e, one compiled linearize/solve pair reused for every step) and with
    the exact dense per-step solves reaches ATE 0.027 m — the accuracy
    class of the full batch result (0.021), from the 0.395 m front-end
    input. (The truncated-CG per-step variant stalled at 0.234 m; exact
    Newton steps matter even more incrementally than in batch.)
    """
    if method == "auto":
        method = "dense" if bs.dense_method_ok(problem) else "cg"
    obs_step, odo_step, pose_step, point_step = activation_steps(data,
                                                                 problem)
    S = data.nr_steps
    base_odo_valid = problem.odo_valid if use_odometry else \
        jnp.zeros_like(problem.odo_valid)

    def masked(s):
        return problem._replace(
            obs_valid=problem.obs_valid & (obs_step <= s),
            odo_valid=base_odo_valid & (odo_step <= s),
            pose_valid=problem.pose_valid & (pose_step <= s),
            point_valid=problem.point_valid & (point_step <= s))

    # steps with new landmark batches (for the full-LM trigger)
    batch_steps = [s for s in range(S) if data.point3D_added_idxs[s]]
    second_batch = batch_steps[1] if len(batch_steps) > 1 else None

    if max_steps is not None:
        S = min(S, max_steps)
    v = problem.init
    lam = lam0
    cost = None
    history = []
    for s in range(S):
        ps = masked(s)
        n_iters = full_lm_iters if (s == second_batch or s == S - 1) \
            else iters_per_step
        cost = float(bs.compute_cost(ps, v))
        for _ in range(n_iters):
            lin = bs.linearize(ps, v)
            accepted = False
            for _ in range(5):
                if method == "dense":
                    dc, dp = bs.solve_delta_dense(ps, lin, jnp.float32(lam))
                else:
                    dc, dp, _ = bs.solve_delta(ps, lin, jnp.float32(lam),
                                               cg_iters=cg_iters,
                                               cg_tol=1e-10)
                v_try = bs.apply_delta(v, dc, dp)
                nc = float(bs.compute_cost(ps, v_try))
                if nc < cost:
                    v, cost = v_try, nc
                    lam = max(lam / 2.0, 1e-9)
                    accepted = True
                    break
                lam = min(lam * 8.0, 1e6)
            if not accepted:
                break
        history.append(cost)
        if verbose and (s % 10 == 0 or s == S - 1):
            print(f"incremental step {s}: cost={cost:.4e}")
    return v, history


@partial(jax.jit, static_argnames=("n_steps", "iters_per_step",
                                   "full_lm_iters", "max_retries", "method",
                                   "cg_iters"))
def _incremental_device_loop(problem: BAProblem, steps, v0, n_steps: int,
                             second_batch, iters_per_step: int,
                             full_lm_iters: int, lam0,
                             max_retries: int, method: str, cg_iters: int,
                             cg_tol):
    obs_step, odo_step, pose_step, point_step, base_odo_valid = steps

    def solve(ps, lin, lam):
        if method == "dense":
            return bs.solve_delta_dense(ps, lin, lam)
        dc, dp, _ = bs.solve_delta(ps, lin, lam, cg_iters=cg_iters,
                                   cg_tol=cg_tol)
        return dc, dp

    def v_where(pred, a, b):
        return jax.tree_util.tree_map(
            lambda x, y: jnp.where(pred, x, y), a, b)

    def step_body(s, carry):
        v, lam, hist = carry
        ps = problem._replace(
            obs_valid=problem.obs_valid & (obs_step <= s),
            odo_valid=base_odo_valid & (odo_step <= s),
            pose_valid=problem.pose_valid & (pose_step <= s),
            point_valid=problem.point_valid & (point_step <= s))
        n_iters = jnp.where((s == second_batch) | (s == n_steps - 1),
                            full_lm_iters, iters_per_step)
        cost = bs.compute_cost(ps, v)

        def lm_cond(st):
            it, _, _, _, improving = st
            return (it < n_iters) & improving

        def lm_body(st):
            it, v, lam, cost, _ = st
            lin = bs.linearize(ps, v)

            def att_cond(st2):
                k, _, accepted, *_ = st2
                return (k < max_retries) & ~accepted

            def att_body(st2):
                k, lam, accepted, v, cost = st2
                dc, dp = solve(ps, lin, lam)
                v_try = bs.apply_delta(v, dc, dp)
                nc = bs.compute_cost(ps, v_try)
                ok = nc < cost
                v = v_where(ok, v_try, v)
                cost = jnp.where(ok, nc, cost)
                lam = jnp.where(ok, jnp.maximum(lam / 2.0, 1e-9),
                                jnp.minimum(lam * 8.0, 1e6))
                return k + 1, lam, accepted | ok, v, cost

            _, lam, accepted, v, cost = jax.lax.while_loop(
                att_cond, att_body,
                (jnp.int32(0), lam, jnp.bool_(False), v, cost))
            return it + 1, v, lam, cost, accepted

        _, v, lam, cost, _ = jax.lax.while_loop(
            lm_cond, lm_body,
            (jnp.int32(0), v, lam, cost, jnp.bool_(True)))
        return v, lam, hist.at[s].set(cost)

    hist0 = jnp.full(n_steps, jnp.nan, jnp.float32)
    v, _, hist = jax.lax.fori_loop(
        0, n_steps, step_body, (v0, jnp.float32(lam0), hist0))
    return v, hist


def incremental_solve_device(data, problem: BAProblem, use_odometry=True,
                             iters_per_step=2, full_lm_iters=10,
                             cg_iters=300, lam0=1e-4, max_steps=None,
                             method="auto", max_retries=5, cg_tol=1e-10):
    """incremental_solve with the ENTIRE step schedule on device.

    Same step semantics (per-step activation masks, full LM at the second
    landmark batch and the final step, accept/reject with multiplicative
    lambda carried across steps) but zero host round-trips: one dispatch
    runs every step's masked linearize/solve/accept ladder inside nested
    lax.while/fori loops.  On a tunneled TPU backend the host-driven loop
    pays ~30-45 ms RTT for every compute_cost/solve call — hundreds of
    calls over the reference's 186-step dump (~2 min wall); this runs
    bounded by solver math (measured ~11x faster on that dump).

    Masks are traced data, so the whole schedule reuses ONE compiled
    (linearize, solve) pair — no recompilation as the graph grows;
    reference step semantics: bundle_adjust.cpp:245-366.
    Returns (variables, cost_history list, per step)."""
    if method == "auto":
        method = "dense" if bs.dense_method_ok(problem) else "cg"
    obs_step, odo_step, pose_step, point_step = activation_steps(data,
                                                                 problem)
    S = data.nr_steps
    base_odo_valid = problem.odo_valid if use_odometry else \
        jnp.zeros_like(problem.odo_valid)
    batch_steps = [s for s in range(S) if data.point3D_added_idxs[s]]
    second_batch = batch_steps[1] if len(batch_steps) > 1 else -1
    if max_steps is not None:
        S = min(S, max_steps)
    v, hist = _incremental_device_loop(
        problem, (obs_step, odo_step, pose_step, point_step,
                  base_odo_valid),
        problem.init, S, jnp.int32(second_batch), iters_per_step,
        full_lm_iters, lam0, max_retries, method, cg_iters,
        jnp.float32(cg_tol))
    hist_np = jax.device_get(hist)  # one bulk transfer
    return v, [float(h) for h in hist_np]
