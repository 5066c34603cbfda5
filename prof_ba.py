"""Measure BA LM iterations/s + accuracy on the real SVO dump with the
block-Jacobi CG at several tolerances (TPU)."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".cache", "jax"))
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from mqslam_tpu.ba import problem as bp, solver as bs
from mqslam_tpu.io import ba_info, tum
from mqslam_tpu.eval import ate as ate_mod
from mqslam_tpu.core import so3, quat

print("backend:", jax.default_backend())
SVO = "/root/reference/Work/SLAM/datasets/SVO/sin2_tex2_h1_v8_d"
data = ba_info.load_ba_data(SVO, "slam2", nr_cameras=1, fps=50)
prob = bp.problem_from_ba_data(data)
prob = prob._replace(odo_valid=jnp.zeros_like(prob.odo_valid))
gt = tum.load_trajectory(os.path.join(SVO, "traj_groundtruth.txt"))
valid = np.asarray(prob.pose_valid)
ts = (np.flatnonzero(valid) + 1) / 50.0


def traj_of(vv):
    R = so3.exp(jnp.asarray(np.asarray(vv.pose_r)[valid]))
    q = np.asarray(quat.from_matrix(R))
    return tum.CamTrajectory(ts, np.asarray(vv.pose_t)[valid], q)


# how many CG iterations does one typical solve use now?
lin = bs.linearize(prob, prob.init)
for tol in (1e-10, 1e-6, 3e-6, 1e-5):
    dc, dp, it = bs.solve_delta(prob, lin, jnp.float32(1e-6),
                                cg_iters=1500, cg_tol=tol)
    print(f"tol={tol:g}: cg_used={int(it)}")

for tol in (1e-10, 3e-6, 1e-5):
    t0 = time.perf_counter()
    v, hist = bs.lm_solve(prob, max_iters=40, cg_iters=1500, cg_tol=tol)
    dt = time.perf_counter() - t0
    res = ate_mod.evaluate_ate(traj_of(v), gt, max_difference=0.011)
    print(f"tol={tol:g}: {len(hist)-1} LM iters in {dt:.1f}s "
          f"({(len(hist)-1)/dt:.2f} it/s) cost={hist[-1]:.6e} "
          f"ATE={res.rmse:.5f}")
    from mqslam_tpu.ba.polish64 import polish64
    v2, h64 = polish64(prob, v, max_iters=12)
    res2 = ate_mod.evaluate_ate(traj_of(v2), gt, max_difference=0.011)
    print(f"   after polish64: cost={h64[-1]:.6e} ATE={res2.rmse:.5f} "
          f"(golden 0.021598)")
