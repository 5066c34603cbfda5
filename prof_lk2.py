"""lk_track_pyr timing + accuracy vs matmul precision and iteration split.

Times the full atlas LK call (T=3072) under HIGHEST / HIGH / DEFAULT
einsum precision and reports flow deviation vs the HIGHEST reference on a
realistic rendered pair — to decide whether the 6-pass f32 matmuls are
buying anything.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".cache", "jax"))
import numpy as np
import jax
import jax.numpy as jnp

from mqslam_tpu.ops import lk
from mqslam_tpu.frontend import synthetic

print("backend:", jax.default_backend())

A, K = 8, 384
win = 21
pad = lk.lk_pad(win)
rng = np.random.RandomState(0)

# realistic pair: rendered textured plane with a small camera shift
tex = synthetic.make_texture(rng)
P0, P1 = np.eye(4), np.eye(4)
P1[:3, 3] = [-0.035, -0.02, 0.008]
imgs = synthetic.render_plane_sequence(np.stack([P0, P1]), tex,
                                       size=(640, 480), f=500.0,
                                       plane_z=4.0)
atlas_a = np.concatenate([np.pad(imgs[0], pad, mode="edge")] * A, 0)
atlas_b = np.concatenate([np.pad(imgs[1], pad, mode="edge")] * A, 0)
pyr_a, pyr_b = [], []
ia, ib = imgs[0], imgs[1]
for l in range(3):
    pyr_a.append(jnp.asarray(np.concatenate(
        [np.pad(ia, pad, mode="edge")] * A, 0)))
    pyr_b.append(jnp.asarray(np.concatenate(
        [np.pad(ib, pad, mode="edge")] * A, 0)))
    if l < 2:
        ia = np.asarray(lk._pyrdown(jnp.asarray(ia)))
        ib = np.asarray(lk._pyrdown(jnp.asarray(ib)))

pts1 = np.stack([rng.uniform(40, 600, K), rng.uniform(40, 440, K)],
                1).astype(np.float32)
pts = jnp.asarray(np.tile(pts1, (A, 1)))
valid = jnp.ones(A * K, bool)
agent_ids = jnp.repeat(jnp.arange(A, dtype=jnp.int32), K)

N1, N2 = 4, 16


def timed(fn, *args):
    out = jax.block_until_ready(fn(*args))
    ts = {}
    for N in (N1, N2):
        def run(*a):
            def body(c, _):
                o = fn(a[0] + c * 1e-6, *a[1:])
                return c + jnp.sum(o[0]) * 1e-37, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
            return c
        f = jax.jit(run)
        np.asarray(f(pts, *args[1:]))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(pts, *args[1:]))
            best = min(best, time.perf_counter() - t0)
        ts[N] = best
    return out, (ts[N2] - ts[N1]) / (N2 - N1)


results = {}
for prec_name, prec in (("HIGHEST", jax.lax.Precision.HIGHEST),
                        ("HIGH", jax.lax.Precision.HIGH),
                        ("DEFAULT", jax.lax.Precision.DEFAULT)):
    lk._HP = prec
    for iters in (30, 8):
        fn = lambda p, it=iters: lk.lk_track_pyr(
            tuple(pyr_a), tuple(pyr_b), p, valid, win=win, iters=it,
            prepad=True, atlas_agents=agent_ids, atlas_tiles=A)
        # fresh jit cache per precision (lk_track_pyr is jitted at module
        # level on (prev, next, pts, ...) — partial trace closes over _HP)
        fn = jax.jit(fn)
        (q, st, err), per = timed(fn, pts)
        results[(prec_name, iters)] = (np.asarray(q), np.asarray(st), per)
        print(f"prec={prec_name:8s} iters={iters:2d}: {per*1e3:7.3f} ms  "
              f"tracked={int(np.asarray(st).sum())}/{A*K}", flush=True)

q_ref, st_ref, _ = results[("HIGHEST", 30)]
for key, (q, st, per) in results.items():
    both = st_ref & st
    dq = np.abs(q - q_ref)[both]
    print(f"{key}: max|dflow|={dq.max():.5f}px  "
          f"mean={dq.mean():.6f}px  n={both.sum()}")
