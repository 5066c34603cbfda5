"""Why is _lm_device_loop 6x slower than its stage sum?  Compare:
  (a) lm_solve_device as-is (nested while_loop, early exits)
  (b) same policy but scan-based: fixed max_iters, ONE solve attempt per
      iteration, masked accept + lambda schedule
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import numpy as np
import jax
import jax.numpy as jnp

from mqslam_tpu.ba import problem as bp, solver as bs
from mqslam_tpu.io import ba_info

svo = "/root/reference/Work/SLAM/datasets/SVO/sin2_tex2_h1_v8_d"
data = ba_info.load_ba_data(svo, "slam2", nr_cameras=1, fps=50)
prob = bp.problem_from_ba_data(data)
prob = prob._replace(odo_valid=jnp.zeros_like(prob.odo_valid))
print("backend:", jax.default_backend())
MAX_ITERS = 15


@jax.jit
def lm_scan(problem, v0):
    def body(carry, _):
        v, lam, cost = carry
        lin = bs.linearize(problem, v)
        dc, dp = bs.solve_delta_dense(problem, lin, lam)
        v_try = bs.apply_delta(v, dc, dp)
        new_cost = bs.compute_cost(problem, v_try)
        ok = new_cost < cost
        v = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), v_try, v)
        cost = jnp.where(ok, new_cost, cost)
        lam = jnp.where(ok, jnp.maximum(lam / 2.0, 1e-9),
                        jnp.minimum(lam * 8.0, 1e6))
        return (v, lam, cost), cost
    c0 = bs.compute_cost(problem, v0)
    (v, _, cost), hist = jax.lax.scan(
        body, (v0, jnp.float32(1e-6), c0), None, length=MAX_ITERS)
    return v, hist


def timeit(name, f, *a):
    out = jax.block_until_ready(f(*a))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best*1e3:9.1f} ms total "
          f"({best*1e3/MAX_ITERS:7.2f} ms/iter)")
    return out


v0 = prob.init
out_w = timeit("while-loop lm_solve_device",
               lambda: bs._lm_device_loop(prob, v0, MAX_ITERS,
                                          jnp.float32(1e-6),
                                          jnp.float32(8.0), jnp.float32(2.0),
                                          6, "dense", 1000,
                                          jnp.float32(1e-10)))
out_s = timeit("scan lm (1 attempt/iter)", lm_scan, prob, v0)
print("while final cost:", float(out_w[1][int(out_w[2])]))
print("scan  final cost:", float(out_s[1][-1]))
