"""Does the tiled-LK iters=0 floor scale with per-agent tile HEIGHT?

The kernel's per-track compact() does dynamic-sublane slices
``tile[j, pl.ds(iy, rows), :]`` on the [C, Ht, 128] VMEM tile.  If Mosaic
lowers a dynamic sublane offset as a full-column rotate, per-track cost is
O(Ht), not O(rows) — and shrinking Ht (more, shorter agent tiles) or
8-aligning iy would cut the floor.  Measure: level-0-only 3072-track call
at iters=0/30, same image content, atlas_tiles = 1 / 4 / 8 / 16
(Ht = 488 / 122 / 61 / 31 + pad)."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")

from mqslam_tpu.ops import lk
from mqslam_tpu.frontend import synthetic

print("backend:", jax.default_backend(), flush=True)

rng = np.random.RandomState(1)
tex = synthetic.make_texture(rng)
P0, P1 = np.eye(4), np.eye(4)
P1[:3, 3] = [-0.035, -0.02, 0.008]
imgs = synthetic.render_plane_sequence(np.stack([P0, P1]), tex,
                                       size=(640, 480), f=500.0,
                                       plane_z=4.0)
T = 3072
n_scan = 30


def scan_ms(fn, pts, repeats=3):
    @jax.jit
    def run(p0):
        def body(p, _):
            q, st, err = fn(p)
            return p + 0.001 * (q - p), None
        p, _ = jax.lax.scan(body, p0, None, length=n_scan)
        return p
    jax.block_until_ready(run(pts))
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(pts))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / n_scan


pad = lk.lk_pad()
for A in (1, 4, 8, 16):
    # A vertically-stacked copies of the same scene, 480/A rows each:
    # same track count, same work, only the per-agent tile height changes
    Hs = 480 // A
    img_a = np.concatenate([imgs[0][i * Hs:(i + 1) * Hs] for i in range(A)],
                           axis=0)
    img_b = np.concatenate([imgs[1][i * Hs:(i + 1) * Hs] for i in range(A)],
                           axis=0)
    pyr_a = (lk.build_pyramid(jnp.asarray(imgs[0]), 1, pad=pad)[0],)
    pyr_b = (lk.build_pyramid(jnp.asarray(imgs[1]), 1, pad=pad)[0],)
    if A > 1:
        # pre-padded per-agent pyramids stacked (atlas mode)
        pa = [lk.build_pyramid(jnp.asarray(imgs[0][i * Hs:(i + 1) * Hs]),
                               1, pad=pad)[0] for i in range(A)]
        pb = [lk.build_pyramid(jnp.asarray(imgs[1][i * Hs:(i + 1) * Hs]),
                               1, pad=pad)[0] for i in range(A)]
        pyr_a = (jnp.concatenate(pa, axis=0),)
        pyr_b = (jnp.concatenate(pb, axis=0),)
    K = T // A
    pts_list, ag = [], []
    for i in range(A):
        pts_list.append(np.stack(
            [rng.uniform(40, 600, K),
             rng.uniform(20, Hs - 20 if A > 1 else 440, K)], 1))
        ag.extend([i] * K)
    pts = jnp.asarray(np.concatenate(pts_list), jnp.float32)
    agents = jnp.asarray(ag, jnp.int32)
    kw = dict(prepad=True, impl="tiled")
    if A > 1:
        kw.update(atlas_tiles=A, atlas_agents=agents,
                  atlas_contiguous=True)
    for iters in (30, 0):
        ms = scan_ms(lambda p, it=iters: lk.lk_track_pyr(
            pyr_a, pyr_b, p, iters=it, **kw), pts)
        print(f"A={A:2d} (Ht~{Hs}+pad) iters={iters:2d}: {ms:7.3f} ms",
              flush=True)
