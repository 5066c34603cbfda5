"""Stage-level LK profile at A=8 atlas sizes (T=3072, realistic imagery):
extraction (DMA) vs template-window setup vs Newton loops.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import numpy as np
import jax
import jax.numpy as jnp

from mqslam_tpu.ops import lk
from mqslam_tpu.ops import extract_pallas as ep
from mqslam_tpu.frontend import synthetic

print("backend:", jax.default_backend())
A, K = 8, 384
T = A * K
win = 21
margin = 7
r = win // 2
P = win + 2 * margin + 1   # 36
PJ = win + 2 * 1 + 1       # 24
pad = lk.lk_pad(win)
rng = np.random.RandomState(0)

tex = synthetic.make_texture(rng)
P0, P1 = np.eye(4), np.eye(4)
P1[:3, 3] = [-0.035, -0.02, 0.008]
imgs = synthetic.render_plane_sequence(np.stack([P0, P1]), tex,
                                       size=(640, 480), f=500.0, plane_z=4.0)
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
valid = jnp.ones(T, bool)
agent_ids = jnp.repeat(jnp.arange(A, dtype=jnp.int32), K)

N1, N2 = 4, 16


def bench(name, fn, x0, *rest):
    ts = {}
    for N in (N1, N2):
        @jax.jit
        def run(x, *a):
            def body(c, _):
                o = fn(x + c * 1e-9, *a)
                leaves = [jnp.asarray(l) for l in
                          jax.tree_util.tree_leaves(o)]
                s = sum(jnp.sum(jnp.where(jnp.isfinite(l), l, 0.0)) * 1e-30
                        for l in leaves
                        if jnp.issubdtype(l.dtype, jnp.floating))
                return c + s * 1e-7, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
            return c
        jax.block_until_ready(run(x0, *rest))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(x0, *rest))
            best = min(best, time.perf_counter() - t0)
        ts[N] = best
    ms = (ts[N2] - ts[N1]) / (N2 - N1) * 1e3
    print(f"{name:40s} {ms:8.3f} ms", flush=True)
    return ms


full = lambda p: lk.lk_track_pyr(tuple(pyr_a), tuple(pyr_b), p, valid,
                                 win=win, prepad=True,
                                 atlas_agents=agent_ids, atlas_tiles=A)
bench("full LK (iters=30, head8+tail)", full, pts)

full8 = lambda p: lk.lk_track_pyr(tuple(pyr_a), tuple(pyr_b), p, valid,
                                  win=win, iters=8, prepad=True,
                                  atlas_agents=agent_ids, atlas_tiles=A)
bench("full LK (iters=8: head only)", full8, pts)

# extraction: 6 DMA patch pulls (3 template PJ + 3 search P)
def _pad_tiles(img):
    H, W = img.shape
    Hp = -(-H // 8) * 8
    Wp = max(-(-W // 128) * 128, 256)
    if (Hp, Wp) != (H, W):
        img = jnp.pad(img, ((0, Hp - H), (0, Wp - W)), mode="edge")
    return img

JsP = [_pad_tiles(l) for l in pyr_a]
IsP = [_pad_tiles(l) for l in pyr_b]

def extract_all(p):
    outs = []
    for lvl in range(3):
        off = agent_ids * (JsP[lvl].shape[0] // A)
        p_l = p / (2.0 ** lvl) + pad
        cJ = jnp.stack([jnp.floor(p_l[:, 1]).astype(jnp.int32) - r - 1 + off,
                        jnp.floor(p_l[:, 0]).astype(jnp.int32) - r - 1],
                       axis=1)
        outs.append(ep.extract_patches_dma(JsP[lvl], cJ, PJ))
        cI = jnp.stack([
            jnp.floor(p_l[:, 1]).astype(jnp.int32) - r - margin + off,
            jnp.floor(p_l[:, 0]).astype(jnp.int32) - r - margin], axis=1)
        outs.append(ep.extract_patches_dma(IsP[lvl], cI, P))
    return [o[0] for o in outs]
bench("6x DMA patch extraction", extract_all, pts)

# template windows: one _window_multi over 3 levels x 3 channels
pJs = extract_all(pts)[0::2]
pJ_flat = jnp.concatenate([pj for pj in pJs], axis=0)  # [3T, PJr, PJc]
ay = jnp.zeros(3 * T, jnp.float32) + 1.3
ax = jnp.zeros(3 * T, jnp.float32) + 1.7
def template_windows(pJf):
    dxP = jnp.pad(0.5 * (pJf[:, :, 2:] - pJf[:, :, :-2]),
                  ((0, 0), (0, 0), (1, 1)))
    dyP = jnp.pad(0.5 * (pJf[:, 2:, :] - pJf[:, :-2, :]),
                  ((0, 0), (1, 1), (0, 0)))
    return lk._window_multi(jnp.stack([pJf, dxP, dyP], axis=1), ay, ax, win,
                            prec=jax.lax.Precision.DEFAULT)
bench("template windows (3 lvl x 3 chan)", template_windows, pJ_flat)

# one Newton window sample at T tracks (the per-iteration inner cost)
pI = extract_all(pts)[1]
ay1 = jnp.zeros(T, jnp.float32) + 3.2
ax1 = jnp.zeros(T, jnp.float32) + 3.7
def one_window(pIx):
    return lk._window(pIx, ay1, ax1, win, jax.lax.Precision.DEFAULT)
bench("one Newton window sample (T)", one_window, pI)

# pyramid build for comparison
bench("atlas pyramid build (A imgs)",
      lambda im: jax.vmap(lambda i: tuple(lk.build_pyramid(
          i, 3, pad=pad)))(im),
      jnp.asarray(np.stack([imgs[1]] * A)))
