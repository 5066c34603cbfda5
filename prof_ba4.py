"""Corridor-scale BA on the real TPU: CG-path LM iterations/s vs problem size.

The real SVO dump (F~60, P~700) measures small-graph latency; this measures
the production regime BASELINE.json's north star names (thousands of frames,
1e5 landmarks) where the matrix-free Schur/PCG path is the only option.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import numpy as np
import jax
import jax.numpy as jnp

from mqslam_tpu.ba import synthetic, solver

print("backend:", jax.default_backend(), flush=True)

for F, ppf in ((512, 24), (2048, 24), (4096, 24)):
    t0 = time.perf_counter()
    problem, v_true = synthetic.generate_corridor_problem(nr_frames=F,
                                                          points_per_frame=ppf)
    tb = time.perf_counter() - t0
    O = int(np.asarray(problem.obs_valid).sum())
    P = int(problem.n_points)
    n_it = 10
    t0 = time.perf_counter()
    v, hist, nit = solver.lm_solve_device(problem, max_iters=n_it,
                                          method="cg", cg_iters=25)
    jax.block_until_ready(v.pose_r)
    tc = time.perf_counter() - t0
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        v, hist, nit = solver.lm_solve_device(problem, max_iters=n_it,
                                              method="cg", cg_iters=25)
        jax.block_until_ready(v.pose_r)
        best = min(best, time.perf_counter() - t0)
    print(f"F={F:5d} P={P:6d} O={O:7d} build {tb:5.1f}s compile+run {tc:6.1f}s"
          f"  {nit/best:6.2f} LM iters/s  cost {hist[0]:.3e} -> {hist[-1]:.3e}",
          flush=True)
