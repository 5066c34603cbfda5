"""LK impl shootout: xla vs pallas vs fused, per-call device latency.

Same scan-inside-jit methodology as bench.bench_lk_impls (the tunneled
backend's ~30 ms round-trip floor swamps per-call host timing).
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".cache", "jax"))
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

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

n_scan = 30
for T in (384, 3072):
    pts = jnp.asarray(np.stack(
        [rng.uniform(40, 600, T), rng.uniform(40, 440, T)], 1), jnp.float32)

    for impl in ("xla", "pallas", "fused"):
        @partial(jax.jit, static_argnames=("impl",))
        def run(p0, impl):
            def body(p, _):
                q, st, err = lk.lk_track_pyr(pyr_a, pyr_b, p, prepad=True,
                                             impl=impl)
                return p + 0.001 * (q - p), err
            p, errs = jax.lax.scan(body, p0, jnp.arange(n_scan))
            return p, errs

        try:
            t0 = time.perf_counter()
            jax.block_until_ready(run(pts, impl))
            tc = time.perf_counter() - t0
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(run(pts, impl))
                best = min(best, time.perf_counter() - t0)
            print(f"T={T:5d} {impl:8s} {best*1e3/n_scan:8.3f} ms/call"
                  f"   (compile {tc:.1f}s)", flush=True)
        except Exception as e:
            print(f"T={T:5d} {impl:8s} FAILED: {type(e).__name__}: {e}",
                  flush=True)
