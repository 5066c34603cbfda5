import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".cache", "jax"))
import numpy as np, jax, jax.numpy as jnp
from mqslam_tpu.ops import lk

img = jnp.asarray(np.random.RandomState(0).rand(480, 640).astype(np.float32))

N = 100
def bench(name, fn, *args):
    def scanned(*a):
        def body(c, _):
            out = fn(a[0] + c * 0, *a[1:])
            leaves = jax.tree_util.tree_leaves(out)
            return c + sum(jnp.sum(l) for l in leaves) * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
        return c
    f = jax.jit(scanned)
    jax.block_until_ready(f(*args))
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {(best-0.024)/N*1e3:8.4f} ms/iter")

bench("build_pyramid(conv)", lambda x: lk.build_pyramid(x, 3), img)
bench("pyrdown(conv) x1", lk._pyrdown, img)

def pyrdown_shift(img):
    # 5-tap binomial [1,4,6,4,1]/16, separable, via padded shifts.
    k = (1.0, 4.0, 6.0, 4.0, 1.0)
    p = jnp.pad(img, ((2, 2), (0, 0)), mode="reflect")
    H = img.shape[0]
    v = sum(k[i] * jax.lax.dynamic_slice_in_dim(p, i, H, 0)
            for i in range(5)) / 16.0
    p = jnp.pad(v, ((0, 0), (2, 2)), mode="reflect")
    W = img.shape[1]
    h = sum(k[i] * jax.lax.dynamic_slice_in_dim(p, i, W, 1)
            for i in range(5)) / 16.0
    return h[::2, ::2]

def pyrdown_shift_dec(img):
    # decimate-first on rows via reshape to halve work
    k = (1.0, 4.0, 6.0, 4.0, 1.0)
    H, W = img.shape
    p = jnp.pad(img, ((2, 2), (0, 0)), mode="reflect")
    v = sum(k[i] * p[i:i + H:2] if False else k[i] * jax.lax.slice_in_dim(p, i, i + H, 2, 0)
            for i in range(5)) / 16.0   # [H/2, W]
    p = jnp.pad(v, ((0, 0), (2, 2)), mode="reflect")
    h = sum(k[i] * jax.lax.slice_in_dim(p, i, i + W, 2, 1)
            for i in range(5)) / 16.0
    return h

out_conv = np.asarray(lk._pyrdown(img))
out_s = np.asarray(pyrdown_shift(img))
out_d = np.asarray(pyrdown_shift_dec(img))
print("match shift:", np.abs(out_conv - out_s).max())
print("match dec:  ", np.abs(out_conv - out_d).max())

bench("pyrdown(shift)", pyrdown_shift, img)
bench("pyrdown(shift+dec)", pyrdown_shift_dec, img)

def build3(f, x):
    p1 = f(x); p2 = f(p1)
    return (x, p1, p2)
bench("build_pyramid(shift+dec)", lambda x: build3(pyrdown_shift_dec, x), img)
