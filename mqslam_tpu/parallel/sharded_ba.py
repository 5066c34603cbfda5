"""Sharded bundle adjustment over a jax.sharding.Mesh.

One LM iteration (linearize + Schur-CG solve) runs inside a single shard_map
region: the projection-factor arrays are split along the mesh's ``data``
axis, every segment-sum over poses/landmarks becomes a partial sum followed
by a psum over ICI, and the CG loop itself iterates on fully-replicated
[F, 6] pose vectors, so per-iteration collective traffic is O(poses +
landmarks) — independent of the number of observations per device.

Multi-agent mapping: each agent's (camera's) factors are just rows of the
same observation arrays (the flattened cam*S+frame pose indexing), so
cross-agent joint BA shards identically — agents' factors interleave over
devices and the shared reduced camera system is assembled by the same psums
(configs #4/#5 of BASELINE.json).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mqslam_tpu.ba import solver as ba_solver
from mqslam_tpu.ba.problem import BAProblem, BAVariables

__all__ = ["pad_problem_for_shards", "shard_problem_for_mesh",
           "build_layout_for_mesh", "make_sharded_lm_iteration",
           "sharded_lm_solve", "sharded_lm_solve_device"]

_OBS_FIELDS = ("obs_uv", "obs_pose", "obs_cam", "obs_point", "obs_sigma",
               "obs_valid")


def _obs_spec(axis: str):
    """PartitionSpec pytree matching BAProblem: obs arrays sharded, rest
    replicated."""
    specs = {}
    for field in BAProblem._fields:
        specs[field] = P(axis) if field in _OBS_FIELDS else P()
    init_spec = BAVariables(P(), P(), P())
    specs["init"] = init_spec
    return BAProblem(**specs)


def pad_problem_for_shards(problem: BAProblem, n: int) -> BAProblem:
    """Pad the observation arrays to a multiple of ``n`` (inert padding).
    Host-local — safe to call on the replicated pre-placement problem in
    multi-process runs."""
    O = problem.obs_uv.shape[0]
    O_pad = ((O + n - 1) // n) * n
    if O_pad == O:
        return problem
    pad = O_pad - O

    def pad0(a):
        cfg = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, cfg)

    problem = problem._replace(
        **{f: pad0(getattr(problem, f)) for f in _OBS_FIELDS})
    return problem._replace(
        obs_valid=problem.obs_valid.at[O:].set(False),
        obs_sigma=problem.obs_sigma.at[O:].set(1.0))


def shard_problem_for_mesh(problem: BAProblem, mesh: Mesh,
                           axis: str = "data") -> BAProblem:
    """Pad the observation arrays to a multiple of the mesh axis size and
    place them with the sharded layout (other leaves replicated)."""
    problem = pad_problem_for_shards(problem, mesh.shape[axis])
    specs = _obs_spec(axis)
    return jax.tree_util.tree_map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)),
        problem, specs)


def build_layout_for_mesh(problem: BAProblem, mesh: Mesh,
                          axis: str = "data"):
    """Per-device compact packed layout for a problem already padded to
    the mesh axis size, placed with the shard axis on the mesh.

    The index arrays must be process-locally fetchable: pass the PADDED
    pre-placement problem (pad_problem_for_shards) in multi-process runs —
    a globally-sharded problem's obs arrays span non-addressable devices.
    Returns None when the packed tables would blow past the ratio guard
    (degenerate observation distributions) — COO applies then."""
    from mqslam_tpu.ba.packed import build_sharded_packed_layout

    n = mesh.shape[axis]
    layout = build_sharded_packed_layout(
        np.asarray(problem.obs_pose), np.asarray(problem.obs_point),
        np.asarray(problem.obs_valid), problem.n_poses, problem.n_points, n)
    if layout is None:
        return None
    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), layout)


def build_banded_for_mesh(problem: BAProblem, mesh: Mesh,
                          axis: str = "data"):
    """Sharded BANDED grid for the mesh: gather-free pose-block CG legs
    with one psum per matvec (ba/banded.py).  The grid requires the
    observation arrays permuted into device-major base-pose blocks, so on
    success this returns (placed_layout, permuted_padded_problem); None
    when the grid builder refuses (fall back to the packed layout)."""
    from mqslam_tpu.ba.banded import (build_sharded_banded_layout,
                                      permute_obs)

    n = mesh.shape[axis]
    out = build_sharded_banded_layout(
        np.asarray(problem.obs_pose), np.asarray(problem.obs_point),
        np.asarray(problem.obs_valid), problem.n_poses, problem.n_points,
        n)
    if out is None:
        return None
    layout, perm, valid = out
    pp = permute_obs(problem, perm, valid)
    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh),
                                  layout), pp


def make_sharded_lm_iteration(mesh: Mesh, cg_iters: int = 200,
                              cg_tol: float = 1e-10, axis: str = "data",
                              with_layout: bool = False,
                              layout_example=None):
    """Build the jitted sharded LM iteration
    (problem, vars, lam[, layout]) -> (delta_pose, delta_point, cost).

    With ``with_layout``, the iteration takes a ShardedPackedLayout whose
    leading axis is split over the mesh: each device squeezes its shard and
    runs the dense row-mapped packed matvecs (solver._packed_ops_rows)
    instead of the per-observation gather/scatter COO form — the same psum
    pattern, ~75x less scatter traffic per CG iteration at corridor scale
    (see ba/packed.py)."""
    specs = _obs_spec(axis)
    var_spec = BAVariables(P(), P(), P())

    if with_layout:
        if layout_example is not None:
            layout_specs = jax.tree_util.tree_map(lambda _: P(axis),
                                                  layout_example)
        else:
            from mqslam_tpu.ba.packed import ShardedPackedLayout
            layout_specs = ShardedPackedLayout(
                *([P(axis)] * len(ShardedPackedLayout._fields)))

        def _iteration(problem, v, lam, layout):
            layout = jax.tree_util.tree_map(lambda a: a[0], layout)
            lin = ba_solver.linearize(problem, v, axis_name=axis)
            dc, dp, _ = ba_solver.solve_delta(problem, lin, lam,
                                              cg_iters=cg_iters,
                                              cg_tol=cg_tol,
                                              axis_name=axis, layout=layout)
            return dc, dp, lin.cost

        sharded = jax.shard_map(
            _iteration, mesh=mesh,
            in_specs=(specs, var_spec, P(), layout_specs),
            out_specs=(P(), P(), P()),
            check_vma=False)
        return jax.jit(sharded)

    def _iteration(problem, v, lam):
        lin = ba_solver.linearize(problem, v, axis_name=axis)
        dc, dp, _ = ba_solver.solve_delta(problem, lin, lam,
                                          cg_iters=cg_iters, cg_tol=cg_tol,
                                          axis_name=axis)
        return dc, dp, lin.cost

    sharded = jax.shard_map(
        _iteration, mesh=mesh,
        in_specs=(specs, var_spec, P()),
        out_specs=(P(), P(), P()),
        check_vma=False)
    return jax.jit(sharded)


def _sharded_cost(mesh: Mesh, axis: str = "data"):
    specs = _obs_spec(axis)
    var_spec = BAVariables(P(), P(), P())

    def _cost(problem, v):
        r_obs, r_odo, r_pp, r_qp = ba_solver._residuals(problem, v)
        c_obs = jax.lax.psum(0.5 * jnp.sum(r_obs ** 2), axis)
        return c_obs + 0.5 * (jnp.sum(r_odo ** 2) + jnp.sum(r_pp ** 2)
                              + jnp.sum(r_qp ** 2))

    return jax.jit(jax.shard_map(_cost, mesh=mesh,
                                 in_specs=(specs, var_spec),
                                 out_specs=P(), check_vma=False))


def sharded_lm_solve(problem: BAProblem, mesh: Mesh, max_iters: int = 40,
                     lam0: float = 1e-6, cg_iters: int = 1000,
                     axis: str = "data", verbose: bool = False,
                     layout="auto"):
    """LM outer loop over the sharded iteration (host accept/reject).

    Semantics match ba.solver.lm_solve; computation shards over ``mesh``.
    ``layout="auto"`` builds the per-device packed layout (dense matvecs,
    no per-observation scatters in the CG loop) and falls back to COO when
    the layout build bails out; pass ``layout=None`` to force COO.
    """
    padded = pad_problem_for_shards(problem, mesh.shape[axis])
    if layout == "auto":
        # build from the replicated pre-placement arrays: a global sharded
        # array is not host-fetchable in multi-process runs.  The banded
        # grid (gather-free legs) is preferred; it permutes the obs order
        # into device-major base-pose blocks, so it replaces the problem.
        out = build_banded_for_mesh(padded, mesh, axis)
        if out is not None:
            layout, padded = out
        else:
            layout = build_layout_for_mesh(padded, mesh, axis)
    problem = shard_problem_for_mesh(padded, mesh, axis)
    lm_iter = make_sharded_lm_iteration(mesh, cg_iters=cg_iters, axis=axis,
                                        with_layout=layout is not None,
                                        layout_example=layout)
    cost_fn = _sharded_cost(mesh, axis)

    def iterate(v, lam):
        if layout is not None:
            return lm_iter(problem, v, jnp.float32(lam), layout)
        return lm_iter(problem, v, jnp.float32(lam))

    v = problem.init
    lam = lam0
    cost = float(cost_fn(problem, v))
    history = [cost]
    for it in range(max_iters):
        improved = False
        for _ in range(6):
            dc, dp, _ = iterate(v, lam)
            v_try = ba_solver.apply_delta(v, dc, dp)
            nc = float(cost_fn(problem, v_try))
            if nc < cost:
                v, cost = v_try, nc
                lam = max(lam / 2.0, 1e-9)
                improved = True
                break
            lam = min(lam * 8.0, 1e6)
        history.append(cost)
        if verbose:
            print(f"sharded LM iter {it}: cost={cost:.6e} lam={lam:.2e}")
        if not improved:
            break
    return v, history


def sharded_lm_solve_device(problem: BAProblem, mesh: Mesh,
                            max_iters: int = 40, lam0: float = 1e-6,
                            lam_up: float = 8.0, lam_down: float = 2.0,
                            max_retries: int = 6, cg_iters: int = 1000,
                            cg_tol: float = 1e-10, axis: str = "data",
                            layout="auto"):
    """sharded_lm_solve with the ENTIRE LM outer loop on device.

    One shard_map dispatch runs every iteration: linearize + packed/COO
    Schur-CG solve + accept/reject, with the psum'ed global cost driving
    identical accept decisions on every device (the multi-chip analog of
    ba.solver.lm_solve_device — the host-driven sharded loop pays a full
    host round-trip per solve attempt). CG-only (the dense path needs the
    global W). Returns (v, history_list, n_iters) like lm_solve_device.
    """
    padded = pad_problem_for_shards(problem, mesh.shape[axis])
    if layout == "auto":
        out = build_banded_for_mesh(padded, mesh, axis)
        if out is not None:
            layout, padded = out
        else:
            layout = build_layout_for_mesh(padded, mesh, axis)
    problem_s = shard_problem_for_mesh(padded, mesh, axis)
    specs = _obs_spec(axis)
    var_spec = BAVariables(P(), P(), P())

    if layout is not None:
        layout_specs = jax.tree_util.tree_map(lambda _: P(axis), layout)

        def _solve(problem, v0, lay):
            lay = jax.tree_util.tree_map(lambda a: a[0], lay)
            return ba_solver._lm_device_loop(
                problem, v0, max_iters, jnp.float32(lam0),
                jnp.float32(lam_up), jnp.float32(lam_down), max_retries,
                "cg", cg_iters, jnp.float32(cg_tol), layout=lay,
                axis_name=axis)

        fn = jax.jit(jax.shard_map(
            _solve, mesh=mesh,
            in_specs=(specs, var_spec, layout_specs),
            out_specs=(var_spec, P(), P()),
            check_vma=False))
        v, hist, it = fn(problem_s, problem_s.init, layout)
    else:
        def _solve(problem, v0):
            return ba_solver._lm_device_loop(
                problem, v0, max_iters, jnp.float32(lam0),
                jnp.float32(lam_up), jnp.float32(lam_down), max_retries,
                "cg", cg_iters, jnp.float32(cg_tol), axis_name=axis)

        fn = jax.jit(jax.shard_map(
            _solve, mesh=mesh,
            in_specs=(specs, var_spec),
            out_specs=(var_spec, P(), P()),
            check_vma=False))
        v, hist, it = fn(problem_s, problem_s.init)

    hist_np, n = jax.device_get((hist, it))
    n = int(n)
    return v, [float(h) for h in hist_np[:n + 1]], n
