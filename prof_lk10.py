"""Gen-5 tiled-LK verification on TPU: parity + per-call latency vs gen-4."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")

from mqslam_tpu.ops import lk
from mqslam_tpu.frontend import synthetic

print("backend:", jax.default_backend(), flush=True)

rng = np.random.RandomState(1)
tex = synthetic.make_texture(rng)
P0, P1 = np.eye(4), np.eye(4)
P1[:3, 3] = [-0.035, -0.02, 0.008]
imgs = synthetic.render_plane_sequence(np.stack([P0, P1]), tex,
                                       size=(640, 480), f=500.0, plane_z=4.0)
pad = lk.lk_pad()
pyr_a = tuple(lk.build_pyramid(jnp.asarray(imgs[0]), 3, pad=pad))
pyr_b = tuple(lk.build_pyramid(jnp.asarray(imgs[1]), 3, pad=pad))

T = 3072
pts = jnp.asarray(np.stack(
    [rng.uniform(40, 600, T), rng.uniform(40, 440, T)], 1), jnp.float32)
a_x, s_x, e_x = jax.jit(partial(lk.lk_track_pyr, prepad=True, impl="xla",
                                precision="highest", dma_extract=False))(
    pyr_a, pyr_b, pts)
a_t, s_t, e_t = jax.jit(partial(lk.lk_track_pyr, prepad=True,
                                impl="tiled"))(pyr_a, pyr_b, pts)
ok = np.asarray(s_x) & np.asarray(s_t)
dev = np.abs(np.asarray(a_t)[ok] - np.asarray(a_x)[ok])
print(f"parity tiled vs xla-highest: status agree "
      f"{(np.asarray(s_x) == np.asarray(s_t)).mean():.4f}, "
      f"max dev {dev.max():.4f} px, mean {dev.mean():.6f} px", flush=True)

n_scan = 30


def scan_ms(fn, pts_T, repeats=3):
    @jax.jit
    def run(p0):
        def body(p, _):
            q, st, err = fn(p)
            return p + 0.001 * (q - p), None
        p, _ = jax.lax.scan(body, p0, None, length=n_scan)
        return p
    jax.block_until_ready(run(pts_T))
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(pts_T))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / n_scan


for Tt in (384, 3072):
    pts_T = jnp.asarray(np.stack(
        [rng.uniform(40, 600, Tt), rng.uniform(40, 440, Tt)], 1),
        jnp.float32)
    for name, kw in (
            ("fused bf16", dict(impl="fused", store_dtype="bfloat16")),
            ("tiled     ", dict(impl="tiled"))):
        ms = scan_ms(lambda p, kw=kw: lk.lk_track_pyr(
            pyr_a, pyr_b, p, prepad=True, **kw), pts_T)
        print(f"T={Tt:5d} {name}: {ms:7.3f} ms/call (3-level)", flush=True)

pts_T = jnp.asarray(np.stack(
    [rng.uniform(40, 600, 3072), rng.uniform(40, 440, 3072)], 1),
    jnp.float32)
for iters in (30, 0):
    ms = scan_ms(lambda p, it=iters: lk.lk_track_pyr(
        (pyr_a[0],), (pyr_b[0],), p, prepad=True, impl="tiled",
        iters=it), pts_T)
    print(f"level-0 T=3072 iters={iters:2d} tiled: {ms:7.3f} ms",
          flush=True)

# atlas-mode A=8 (the multi-agent shape): 8 tiles, 384 tracks each
A, K = 8, 384
atlas_a = tuple(jnp.concatenate([l] * A, axis=0) for l in pyr_a)
atlas_b = tuple(jnp.concatenate([l] * A, axis=0) for l in pyr_b)
agents = jnp.repeat(jnp.arange(A, dtype=jnp.int32), K)
pts_flat = jnp.concatenate([pts_T[:K]] * A, axis=0)
for name, kw in (
        ("fused bf16", dict(impl="fused", store_dtype="bfloat16")),
        ("tiled     ", dict(impl="tiled"))):
    ms = scan_ms(lambda p, kw=kw: lk.lk_track_pyr(
        atlas_a, atlas_b, p, prepad=True, atlas_agents=agents,
        atlas_tiles=A, atlas_contiguous=True, **kw), pts_flat)
    print(f"atlas A=8 T=3072 {name}: {ms:7.3f} ms/call (3-level)",
          flush=True)
