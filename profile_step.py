"""Per-component DEVICE timing via scan-slope (N1 vs N2 iterations).

Carry is injected as x * (1 + c) (not foldable), and the timed quantity is
the difference between two scan lengths, so dispatch latency and argument
transfer cancel exactly.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".cache", "jax"))
import numpy as np
import jax
import jax.numpy as jnp

from mqslam_tpu.core import camera as cam_mod, se3
from mqslam_tpu.frontend import tracker as trk
from mqslam_tpu.ops import features, homography, lk, pnp
from mqslam_tpu.ops import triangulation as tri
import __graft_entry__ as ge

print("backend:", jax.default_backend())
cal, config, _ = ge._tracker_setup()
state = ge._example_state(config, trk)
rng = np.random.RandomState(1)
prev_img = jnp.asarray(rng.rand(480, 640).astype(np.float32) * 255.0)
new_img = jnp.asarray(rng.rand(480, 640).astype(np.float32) * 255.0)

N1, N2 = 8, 40


def _inject(x, c):
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.floating):
        return x * (1.0 + c)
    return x


def make(fn, args, N):
    def scanned(*a):
        def body(c, _):
            out = fn(*jax.tree_util.tree_map(lambda x: _inject(x, c), a))
            leaves = [jnp.asarray(l) for l in jax.tree_util.tree_leaves(out)]
            s = sum(jnp.sum(jnp.where(jnp.isfinite(l), l, 0.0))
                    for l in leaves if jnp.issubdtype(l.dtype, jnp.floating))
            return s * 1e-37, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
        return c
    return jax.jit(scanned)


def bench(name, fn, *args):
    ts = {}
    for N in (N1, N2):
        f = make(fn, args, N)
        r = np.asarray(f(*args))
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            best = min(best, time.perf_counter() - t0)
        ts[N] = best
    per = (ts[N2] - ts[N1]) / (N2 - N1)
    print(f"{name:30s} {per*1e3:8.3f} ms/iter")
    return per


key = jax.random.PRNGKey(0)
k_ransac = jax.random.PRNGKey(1)

step_fn, _, _ = trk.make_step(cal, config)
bench("full step", lambda s, p, q: step_fn(s, p, q), state, prev_img, new_img)

bench("lk_track", lambda p, q, uv: lk.lk_track(
    p, q, uv, state.active, win=config.lk_win, levels=config.lk_levels),
    prev_img, new_img, state.cur_uv)

bench("build_pyramid x2", lambda p, q: (lk.build_pyramid(p, 3),
                                        lk.build_pyramid(q, 3)),
      prev_img, new_img)

new_uv = state.cur_uv
tri_alive = state.active & state.triangulated
track_objp = state.objp[state.objp_idx]
bench("pnp_ransac", lambda o, u: pnp.pnp_ransac(
    o, u, cal, tri_alive, k_ransac, n_hyp=config.ransac_hypotheses,
    reproj_threshold=config.max_pnp_reproj_error), track_objp, new_uv)

inlier = tri_alive
bench("pnp_refine(10)", lambda o, u: pnp.pnp_refine(
    o, u, cal, jnp.zeros(3), jnp.zeros(3), valid=inlier, iters=10),
    track_objp, new_uv)

base_n = np.asarray(cam_mod.undistort_points(state.base_uv, cal))
bench("fit_homography+cond", lambda a, b: homography.homography_condition(
    homography.fit_homography(a, b, inlier)), base_n, base_n)

P_k = se3.from_rvec_tvec(state.rvec_keyfr, state.tvec_keyfr)
P_c = se3.from_rvec_tvec(state.rvec, state.tvec)
bench("iterative_ls x2", lambda a, b: (tri.iterative_ls(a, P_k, b, P_c),
                                       tri.iterative_ls(a, P_k, b, P_c)),
      base_n, base_n)

bench("detect_corners(refill)", lambda img: features.detect_corners(
    img, max_corners=config.max_tracks,
    quality_level=config.corner_quality_level,
    cell=config.coverage_radius, existing=state.cur_uv,
    existing_valid=state.active), new_img)
