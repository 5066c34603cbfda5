"""LK internals timing vs track count (scan-slope device timing).

Separates the cost of the three LK phases — patch extraction, template
window setup, and the Newton window einsums — to show which one breaks
scaling at atlas track counts (A*K = 3072).
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".cache", "jax"))
import numpy as np
import jax
import jax.numpy as jnp

from mqslam_tpu.ops import lk

print("backend:", jax.default_backend())

N1, N2 = 8, 40
win, margin = 21, 7
r = win // 2
PJ = win + 2 * (margin + 1) + 1   # template patch side (margin_j = margin+1)
PI = win + 2 * margin + 1


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
    print(f"{name:42s} {per*1e3:8.3f} ms/iter", flush=True)
    return per


rng = np.random.RandomState(0)
A = 8
pad = lk.lk_pad(win)
img1 = jnp.asarray(rng.rand(480 + 2 * pad, 640 + 2 * pad)
                   .astype(np.float32) * 255.0)
imgA = jnp.asarray(rng.rand(A * (480 + 2 * pad), 640 + 2 * pad)
                   .astype(np.float32) * 255.0)

for T, img, tag in ((384, img1, "T=384"), (3072, imgA, "T=3072 atlas")):
    corners = jnp.asarray(np.stack([
        rng.randint(0, img.shape[0] - PJ, T),
        rng.randint(0, img.shape[1] - PJ, T)], 1).astype(np.int32))
    bench(f"extract_patches PJ ({tag})",
          lambda c, img=img: lk._extract_patches(img, c, PJ), corners)
    bench(f"extract_patches PI ({tag})",
          lambda c, img=img: lk._extract_patches(img, c, PI), corners)

    patchJ = jnp.asarray(rng.rand(T, PJ, PJ).astype(np.float32))
    patchI = jnp.asarray(rng.rand(T, PI, PI).astype(np.float32))
    ay = jnp.asarray(rng.rand(T).astype(np.float32) * 4)
    ax = jnp.asarray(rng.rand(T).astype(np.float32) * 4)

    bench(f"window einsum pair x1 ({tag})",
          lambda a, b: lk._window(patchI, a, b, win), ay, ax)
    bench(f"window_multi C=3 ({tag})",
          lambda a, b: lk._window_multi(
              jnp.stack([patchJ, patchJ, patchJ], 1), a, b, win), ay, ax)

    # 8 chained window samples (the head Newton phase shape)
    def head8(a, b):
        def body(c, _):
            w = lk._window(patchI, a + c, b + c, win)
            return jnp.sum(w) * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=8)
        return c
    bench(f"8 chained window samples ({tag})", head8, ay, ax)
