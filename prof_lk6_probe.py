"""TPU probe for the round-5 LK strip redesign.

Questions:
  1. Does Mosaic accept HBM->VMEM DMA of a bf16 [ROWS, 128] block with a
     dynamic 16-aligned sublane offset?  With an 8-aligned offset?
  2. Does in-kernel astype(bf16 -> f32) of a strip lower?
  3. Timing: per-call latency of 3072 strip copies at [48, 256] f32 (round-4
     shape) vs [64, 128] bf16 (round-5 shape), DMA-only kernels.
"""
import functools, os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")


def make_dma_kernel(ROWS, COLS, TB, align):
    def _kernel(c_ref, img_ref, out_ref, strip, sem):
        def dma(t):
            y0 = pl.multiple_of(c_ref[t, 0], align)
            x0 = pl.multiple_of(c_ref[t, 1], 128)
            return pltpu.make_async_copy(
                img_ref.at[pl.ds(y0, ROWS), pl.ds(x0, COLS)],
                strip.at[t], sem.at[t])
        for t in range(TB):
            dma(t).start()
        for t in range(TB):
            dma(t).wait()
            out_ref[t, 0] = jnp.sum(strip[t].astype(jnp.float32))
    return _kernel


@functools.partial(jax.jit, static_argnames=("ROWS", "COLS", "TB", "align",
                                             "dtype"))
def run_dma(img, corners, ROWS, COLS, TB, align, dtype):
    T = corners.shape[0]
    kernel = make_dma_kernel(ROWS, COLS, TB, align)
    out = pl.pallas_call(
        kernel,
        grid=(T // TB,),
        in_specs=[
            pl.BlockSpec((TB, 2), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((TB, 1), lambda b: (b, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((TB, ROWS, COLS), dtype),
            pltpu.SemaphoreType.DMA((TB,)),
        ],
        out_shape=jax.ShapeDtypeStruct((T, 1), jnp.float32),
    )(corners, img)
    return out


def scan_time(fn, n_scan=30, repeats=3):
    @jax.jit
    def scanned():
        def body(c, _):
            return c + fn()[0, 0] * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n_scan)
        return c

    jax.block_until_ready(scanned())
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(scanned())
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / n_scan


def main():
    print("backend:", jax.default_backend(), flush=True)
    H, W = 4160, 768  # atlas-ish level-0 size, 16-row / 128-lane aligned
    rng = np.random.RandomState(0)
    img_f32 = jnp.asarray(rng.rand(H, W).astype(np.float32))
    img_bf16 = img_f32.astype(jnp.bfloat16)
    T, TB = 3072, 8
    cy = rng.randint(0, (H - 64) // 16, T) * 16
    cx = rng.randint(0, (W - 256) // 128, T) * 128
    corners = jnp.asarray(np.stack([cy, cx], 1).astype(np.int32))

    # 1. bf16 DMA, 16-aligned rows
    for name, img, ROWS, COLS, align, dtype in (
            ("f32  [48,256] a8 (round-4 shape)", img_f32, 48, 256, 8,
             jnp.float32),
            ("bf16 [64,128] a16 (round-5 shape)", img_bf16, 64, 128, 16,
             jnp.bfloat16),
            ("bf16 [48,128] a16 (template shape)", img_bf16, 48, 128, 16,
             jnp.bfloat16),
            ("bf16 [48,128] a8  (8-aligned rows?)", img_bf16, 48, 128, 8,
             jnp.bfloat16),
            ("f32  [48,128] a8  (f32 narrow)", img_f32, 48, 128, 8,
             jnp.float32),
    ):
        try:
            c = corners if align == 16 else \
                jnp.asarray(np.stack([rng.randint(0, (H - 64) // 8, T) * 8,
                                      cx], 1).astype(np.int32))
            t0 = time.perf_counter()
            out = jax.block_until_ready(
                run_dma(img, c, ROWS, COLS, TB, align, dtype))
            compile_s = time.perf_counter() - t0
            ms = scan_time(lambda i=img, cc=c, R=ROWS, C=COLS, a=align,
                           d=dtype: run_dma(i, cc, R, C, TB, a, d))
            gb = T * ROWS * COLS * np.dtype(
                "float32" if dtype == jnp.float32 else "uint16").itemsize / 1e9
            print(f"{name}: {ms:.3f} ms/call  ({gb*1e3:.1f} MB moved, "
                  f"{gb/ms*1e3:.0f} GB/s; compile {compile_s:.0f}s)",
                  flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            print(f"{name}: FAILED {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
