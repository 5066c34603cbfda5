"""Per-stage device timing of one corridor-scale BA iteration (scan-slope).

Separates linearize / preconditioner build / CG matvec / full solve_delta
at production sizes to find what bounds the CG path.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from mqslam_tpu.ba import synthetic, solver

print("backend:", jax.default_backend(), flush=True)

N1, N2 = 3, 10


def scan_slope(fn, *args):
    def make(N):
        @jax.jit
        def scanned(*a):
            def body(c, _):
                out = fn(*jax.tree_util.tree_map(
                    lambda x: x * (1 + c * 1e-30)
                    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                    else x, a))
                s = sum(jnp.sum(l) * 1e-30
                        for l in jax.tree_util.tree_leaves(out)
                        if jnp.issubdtype(l.dtype, jnp.floating))
                return c + s, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
            return c
        return scanned
    ts = {}
    for N in (N1, N2):
        f = make(N)
        np.asarray(f(*args))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            best = min(best, time.perf_counter() - t0)
        ts[N] = best
    return (ts[N2] - ts[N1]) / (N2 - N1)


for F in (512, 2048):
    problem, v_true = synthetic.generate_corridor_problem(nr_frames=F,
                                                          points_per_frame=24)
    O = int(np.asarray(problem.obs_valid).sum())
    v = problem.init
    lin = jax.jit(solver.linearize)(problem, v)
    jax.block_until_ready(lin.cost)
    lam = jnp.float32(1e-4)

    t_lin = scan_slope(lambda vv: solver.linearize(problem, vv), v)
    t_cost = scan_slope(lambda vv: solver.compute_cost(problem, vv), v)

    vv6 = jnp.ones((problem.n_poses, 6), jnp.float32)
    t_hcc = scan_slope(lambda x: solver._hcc_apply(problem, lin, x), vv6)
    t_wt = scan_slope(lambda x: solver._w_t_apply(problem, lin, x), vv6)
    uu3 = jnp.ones((problem.n_points, 3), jnp.float32)
    t_w = scan_slope(lambda x: solver._w_apply(problem, lin, x), uu3)

    t_solve25 = scan_slope(
        lambda l: solver.solve_delta(problem, lin, l, cg_iters=25,
                                     cg_tol=0.0)[0], lam)
    print(f"F={F} O={O}: linearize {t_lin*1e3:8.2f} ms | cost "
          f"{t_cost*1e3:6.2f} | hcc {t_hcc*1e3:6.2f} | w_t {t_wt*1e3:6.2f}"
          f" | w {t_w*1e3:6.2f} | solve25 {t_solve25*1e3:8.2f} ms",
          flush=True)

    # ---- packed path ----
    from mqslam_tpu.ba.packed import build_packed_layout
    layout = build_packed_layout(problem.obs_pose, problem.obs_point,
                                 problem.obs_valid, problem.n_poses,
                                 problem.n_points)
    pJ = jax.jit(solver.pack_jacobians)(lin, layout)
    jax.block_until_ready(pJ[0])
    t_pack = scan_slope(lambda l: solver.pack_jacobians(l, layout), lin)

    def packed_pieces(v6):
        zf, hcc_obs, wt_v, w_ap, pre_obs = solver._packed_ops(
            problem, lin, layout, pJ)
        return hcc_obs(zf(v6)), wt_v(v6)
    t_zh = scan_slope(packed_pieces, vv6)

    def packed_w(u3):
        zf, hcc_obs, wt_v, w_ap, pre_obs = solver._packed_ops(
            problem, lin, layout, pJ)
        return w_ap(u3)
    t_pw = scan_slope(packed_w, uu3)

    def packed_pre(l):
        from mqslam_tpu.ops import linalg
        dp_ = jnp.diagonal(lin.Hpp, axis1=-2, axis2=-1)
        Hpp_d = lin.Hpp + (l * jnp.maximum(dp_, 1e-12))[..., None] \
            * jnp.eye(3)[None]
        Hpp_inv = linalg.inv3x3(Hpp_d)
        zf, hcc_obs, wt_v, w_ap, pre_obs = solver._packed_ops(
            problem, lin, layout, pJ)
        return pre_obs(Hpp_inv)
    t_pre = scan_slope(packed_pre, lam)

    t_psolve = scan_slope(
        lambda l: solver.solve_delta(problem, lin, l, cg_iters=25,
                                     cg_tol=0.0, layout=layout,
                                     packedJ=pJ)[0], lam)
    print(f"   packed: pack {t_pack*1e3:6.2f} | z+hcc+wt {t_zh*1e3:6.2f}"
          f" | w {t_pw*1e3:6.2f} | precond {t_pre*1e3:6.2f}"
          f" | solve25 {t_psolve*1e3:8.2f} ms", flush=True)
