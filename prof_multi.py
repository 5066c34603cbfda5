"""Per-component DEVICE timing of the A-agent atlas step (scan-slope).

Same methodology as profile_step.py: carry injection + two scan lengths so
dispatch latency and argument transfer cancel; numbers are pure device time
per iteration.  Breaks the multi-agent runner body into its stages to show
where the aggregate-frames/s budget goes as A grows.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".cache", "jax"))
import numpy as np
import jax
import jax.numpy as jnp

from mqslam_tpu.core import camera as cam_mod
from mqslam_tpu.frontend import tracker as trk
from mqslam_tpu.ops import lk, pnp, homography
import __graft_entry__ as ge

A = int(sys.argv[1]) if len(sys.argv) > 1 else 8
print("backend:", jax.default_backend(), " A =", A)

cal, config, _ = ge._tracker_setup()
state1 = ge._example_state(config, trk)
K = config.max_tracks
pad = lk.lk_pad(config.lk_win)

states = jax.tree_util.tree_map(
    lambda a: jnp.broadcast_to(a[None], (A,) + a.shape), state1)
rng = np.random.RandomState(1)
imgs_a = jnp.asarray(rng.rand(A, 480, 640).astype(np.float32) * 255.0)
imgs_b = jnp.asarray(rng.rand(A, 480, 640).astype(np.float32) * 255.0)

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
        np.asarray(f(*args))
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            best = min(best, time.perf_counter() - t0)
        ts[N] = best
    per = (ts[N2] - ts[N1]) / (N2 - N1)
    print(f"{name:34s} {per*1e3:8.3f} ms/iter   "
          f"({per*1e3/A:6.3f} ms/agent)")
    return per


step_fn, _, step_pyr = trk.make_step(cal, config)
post_flow = step_pyr.post_flow
vpost = jax.vmap(post_flow)
vrefill = jax.vmap(lambda s, img: trk._refill(s, img, config))


def atlas_pyramid(imgs):
    pyrs = jax.vmap(lambda im: tuple(lk.build_pyramid(
        im, config.lk_levels, pad=pad)))(imgs)
    return tuple(l.reshape(l.shape[0] * l.shape[1], l.shape[2])
                 for l in pyrs)


atlas_a = atlas_pyramid(imgs_a)
atlas_b = atlas_pyramid(imgs_b)
agent_ids = jnp.repeat(jnp.arange(A, dtype=jnp.int32), K)
uv_flat = states.cur_uv.reshape(A * K, 2)
act_flat = states.active.reshape(A * K)

bench("atlas_pyramid", atlas_pyramid, imgs_b)

bench("atlas LK (A*K tracks)",
      lambda pa, pb, uv: lk.lk_track_pyr(
          tuple(pa), tuple(pb), uv, act_flat, win=config.lk_win,
          prepad=True, atlas_agents=agent_ids, atlas_tiles=A),
      list(atlas_a), list(atlas_b), uv_flat)

# flow outputs to feed post stages
new_uv, st_of, err_of = lk.lk_track_pyr(
    atlas_a, atlas_b, uv_flat, act_flat, win=config.lk_win, prepad=True,
    atlas_agents=agent_ids, atlas_tiles=A)
Hp0 = atlas_b[0].shape[0] // A
tiles0 = atlas_b[0].reshape(A, Hp0, atlas_b[0].shape[1])

bench("vmapped post_flow", lambda s, t, uv, st, er: vpost(
    s, t, uv.reshape(A, K, 2), st.reshape(A, K), er.reshape(A, K)),
      states, tiles0, new_uv, st_of, err_of)

# post_flow sub-stages, vmapped over A
track_objp = jax.vmap(lambda s: s.objp[s.objp_idx])(states)
tri_alive = states.active & states.triangulated
keys = jax.random.split(jax.random.PRNGKey(1), A)

bench("  vmapped pnp_ransac",
      lambda o, u, k: jax.vmap(lambda oo, uu, kk: pnp.pnp_ransac(
          oo, uu, cal, tri_alive[0], kk, n_hyp=config.ransac_hypotheses,
          reproj_threshold=config.max_pnp_reproj_error))(o, u, k),
      track_objp, new_uv.reshape(A, K, 2), keys)

bench("  vmapped pnp_refine(10)",
      lambda o, u: jax.vmap(lambda oo, uu: pnp.pnp_refine(
          oo, uu, cal, jnp.zeros(3), jnp.zeros(3), valid=tri_alive[0],
          iters=10))(o, u),
      track_objp, new_uv.reshape(A, K, 2))

bench("  vmapped homography",
      lambda a, b: jax.vmap(lambda x, y: homography.homography_condition(
          homography.fit_homography(x, y, tri_alive[0])))(a, b),
      states.base_uv, new_uv.reshape(A, K, 2))

bench("vmapped refill", vrefill, states, imgs_b)
