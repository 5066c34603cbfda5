"""Per-component DEVICE timing of one LM iteration on the real SVO dump.

Scan-slope methodology (see prof_multi.py): each stage is scanned N1 and
N2 times inside one executable; (t2-t1)/(N2-N1) cancels dispatch + RTT.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".cache", "jax"))
import numpy as np
import jax
import jax.numpy as jnp

from mqslam_tpu.ba import problem as bp, solver as bs
from mqslam_tpu.io import ba_info

svo = "/root/reference/Work/SLAM/datasets/SVO/sin2_tex2_h1_v8_d"
data = ba_info.load_ba_data(svo, "slam2", nr_cameras=1, fps=50)
prob = bp.problem_from_ba_data(data)
prob = prob._replace(odo_valid=jnp.zeros_like(prob.odo_valid))
print("backend:", jax.default_backend(),
      " F =", prob.n_poses, " P =", prob.n_points,
      " obs =", int(prob.obs_valid.sum()))

v0 = prob.init
lin0 = bs.linearize(prob, v0)
lam = jnp.float32(1e-4)

N1, N2 = 4, 24


def make(fn, args, N):
    def scanned(*a):
        def body(c, _):
            out = fn(*a, c)
            leaves = [jnp.asarray(l) for l in jax.tree_util.tree_leaves(out)]
            s = sum(jnp.sum(jnp.where(jnp.isfinite(l), l, 0.0)) * 1e-30
                    for l in leaves if jnp.issubdtype(l.dtype, jnp.floating))
            return c + s * 1e-7, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
        return c
    return jax.jit(scanned)


def bench(name, fn, *args):
    ts = {}
    for N in (N1, N2):
        f = make(fn, args, N)
        jax.block_until_ready(f(*args))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, time.perf_counter() - t0)
        ts[N] = best
    ms = (ts[N2] - ts[N1]) / (N2 - N1) * 1e3
    print(f"{name:34s} {ms:8.3f} ms/iter")
    return ms


# stage 1: linearize (perturb v by c so scan doesn't fold)
def st_linearize(prob, v, c):
    v2 = v._replace(pose_t=v.pose_t + c * 1e-9)
    return bs.linearize(prob, v2)

# stage 2: dense solve (perturb lam)
def st_dense(prob, lin, c):
    return bs.solve_delta_dense(prob, lin, lam + c * 1e-9)

# stage 3: cost eval
def st_cost(prob, v, c):
    v2 = v._replace(pose_t=v.pose_t + c * 1e-9)
    return bs.compute_cost(prob, v2)

# stage 4: apply delta
dc0 = jnp.zeros((prob.n_poses, 6), jnp.float32)
dp0 = jnp.zeros((prob.n_points, 3), jnp.float32)
def st_apply(v, dc, dp, c):
    return bs.apply_delta(v, dc + c * 1e-9, dp)


t_lin = bench("linearize", st_linearize, prob, v0)
t_dense = bench("solve_delta_dense", st_dense, prob, lin0)
t_cost = bench("compute_cost", st_cost, prob, v0)
t_apply = bench("apply_delta", st_apply, v0, dc0, dp0)
print(f"{'SUM (1 linearize + 1 solve + 1 cost)':34s} "
      f"{t_lin + t_dense + t_cost + t_apply:8.3f} ms")
