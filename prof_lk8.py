"""Round-5 fused-LK verification on TPU: parity + per-call latency.

1. Parity: fused f32 (shifted-copy strips) vs XLA-highest on identical f32
   pyramids — round-4 bar is 0.0000 px max deviation.
2. bf16 store: fused bf16 vs fused f32 flow deviation (production store).
3. Latency: per-call time of xla / fused-f32 / fused-bf16 at T=384, 3072,
   plus the fused level-0-only call at iters=30 vs iters=0 (template+DMA
   floor vs Newton loop cost).
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")

from mqslam_tpu.ops import lk, lk_fused_pallas as fp
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

# ---- parity ----
T = 3072
pts = jnp.asarray(np.stack(
    [rng.uniform(40, 600, T), rng.uniform(40, 440, T)], 1), jnp.float32)
a_x, s_x, e_x = jax.jit(partial(lk.lk_track_pyr, prepad=True, impl="xla",
                                precision="highest", dma_extract=False))(
    pyr_a, pyr_b, pts)
a_f, s_f, e_f = jax.jit(partial(lk.lk_track_pyr, prepad=True, impl="fused",
                                store_dtype="float32"))(pyr_a, pyr_b, pts)
a_b, s_b, e_b = jax.jit(partial(lk.lk_track_pyr, prepad=True, impl="fused",
                                store_dtype="bfloat16"))(pyr_a, pyr_b, pts)
ok = np.asarray(s_x) & np.asarray(s_f)
dev = np.abs(np.asarray(a_f)[ok] - np.asarray(a_x)[ok])
print(f"parity fused-f32 vs xla-highest: status agree "
      f"{(np.asarray(s_x) == np.asarray(s_f)).mean():.4f}, "
      f"max dev {dev.max():.4f} px, mean {dev.mean():.6f} px", flush=True)
okb = ok & np.asarray(s_b)
devb = np.abs(np.asarray(a_b)[okb] - np.asarray(a_f)[okb])
print(f"bf16-store vs fused-f32: status agree "
      f"{(np.asarray(s_b) == np.asarray(s_f)).mean():.4f}, "
      f"max dev {devb.max():.4f} px, mean {devb.mean():.6f} px", flush=True)

# ---- latency ----
n_scan = 30


def scan_ms(fn, repeats=3):
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
            ("xla       ", dict(impl="xla")),
            ("fused f32 ", dict(impl="fused", store_dtype="float32")),
            ("fused bf16", dict(impl="fused", store_dtype="bfloat16"))):
        ms = scan_ms(lambda p, kw=kw: lk.lk_track_pyr(
            pyr_a, pyr_b, p, prepad=True, **kw))
        print(f"T={Tt:5d} {name}: {ms:7.3f} ms/call (3-level)", flush=True)

# ---- level-0-only fused call: iters sweep (template+DMA floor) ----
pts_T = jnp.asarray(np.stack(
    [rng.uniform(40, 600, 3072), rng.uniform(40, 440, 3072)], 1),
    jnp.float32)
for iters in (30, 0):
    for dt_name in ("float32", "bfloat16"):
        ms = scan_ms(lambda p, it=iters, d=dt_name: lk.lk_track_pyr(
            (pyr_a[0],), (pyr_b[0],), p, prepad=True, impl="fused",
            iters=it, store_dtype=d))
        print(f"level-0 T=3072 iters={iters:2d} {dt_name}: {ms:7.3f} ms",
              flush=True)
