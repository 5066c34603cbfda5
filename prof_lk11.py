"""Tiled-LK TB sweep: is the per-grid-step overhead (T/TB programs) a
big slice of the iters=0 floor?  Level-0-only calls at T=3072."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")

from mqslam_tpu.ops import lk
from mqslam_tpu.ops import lk_tile_pallas as tp
from mqslam_tpu.frontend import synthetic

print("backend:", jax.default_backend(), flush=True)

rng = np.random.RandomState(1)
tex = synthetic.make_texture(rng)
P0, P1 = np.eye(4), np.eye(4)
P1[:3, 3] = [-0.035, -0.02, 0.008]
imgs = synthetic.render_plane_sequence(np.stack([P0, P1]), tex,
                                       size=(640, 480), f=500.0, plane_z=4.0)
pad = lk.lk_pad()
pyr_a = (lk.build_pyramid(jnp.asarray(imgs[0]), 1, pad=pad)[0],)
pyr_b = (lk.build_pyramid(jnp.asarray(imgs[1]), 1, pad=pad)[0],)
T = 3072
pts = jnp.asarray(np.stack(
    [rng.uniform(40, 600, T), rng.uniform(40, 440, T)], 1), jnp.float32)

n_scan = 30


def scan_ms(fn, repeats=3):
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


import mqslam_tpu.ops.lk_tile_pallas as tmod
orig = tmod.lk_level_tiled

for TB in (8, 16, 32):
    tmod_fn = partial(orig, TB=TB)

    def patched(*args, **kw):
        kw["TB"] = TB
        return orig(*args, **kw)

    tmod.lk_level_tiled = patched
    # also patch the name the driver imported
    import mqslam_tpu.ops.lk as lkmod
    for iters in (30, 0):
        ms = scan_ms(lambda p, it=iters: lk.lk_track_pyr(
            pyr_a, pyr_b, p, prepad=True, impl="tiled", iters=it))
        print(f"TB={TB:2d} iters={iters:2d}: {ms:7.3f} ms", flush=True)
tmod.lk_level_tiled = orig
