"""TPU probe #2: DMA scheduling for the LK strip kernel.

The byte probe (prof_lk6_probe) showed per-call DMA time is FLAT in bytes
(151 MB and 38 MB both ~1.5 ms): the kernel is descriptor/issue bound.
Questions:
  1. Does a larger TB (fewer, wider programs) cut the floor?
  2. Does cross-program double-buffering (prefetch block b+1's strips
     during block b's wait) cut it?
  3. What does ONE huge DMA per program achieve (bandwidth sanity)?
"""
import functools, os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
ROWS, COLS = 64, 128


def make_plain(TB):
    def _kernel(c_ref, img_ref, out_ref, strip, sem):
        def dma(t):
            y0 = pl.multiple_of(c_ref[t, 0], 8)
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


@functools.partial(jax.jit, static_argnames=("TB",))
def run_plain(img, corners, TB):
    T = corners.shape[0]
    out = pl.pallas_call(
        make_plain(TB),
        grid=(T // TB,),
        in_specs=[
            pl.BlockSpec((TB, 2), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((TB, 1), lambda b: (b, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((TB, ROWS, COLS), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((TB,)),
        ],
        out_shape=jax.ShapeDtypeStruct((T, 1), jnp.float32),
    )(corners, img)
    return out


def make_db(TB):
    """Double-buffered: full corner table prefetched in SMEM; program b
    waits on slot b%2 (started by program b-1) and starts slot (b+1)%2."""
    def _kernel(c_ref, img_ref, out_ref, strip, sem):
        b = pl.program_id(0)
        nb = pl.num_programs(0)

        def dma(slot, blk, t):
            y0 = pl.multiple_of(c_ref[blk * TB + t, 0], 8)
            x0 = pl.multiple_of(c_ref[blk * TB + t, 1], 128)
            return pltpu.make_async_copy(
                img_ref.at[pl.ds(y0, ROWS), pl.ds(x0, COLS)],
                strip.at[slot, t], sem.at[slot, t])

        @pl.when(b == 0)
        def _():
            for t in range(TB):
                dma(0, 0, t).start()

        @pl.when(b + 1 < nb)
        def _():
            for t in range(TB):
                dma((b + 1) % 2, b + 1, t).start()

        for t in range(TB):
            dma(b % 2, b, t).wait()
            out_ref[t, 0] = jnp.sum(strip[b % 2, t].astype(jnp.float32))
    return _kernel


@functools.partial(jax.jit, static_argnames=("TB",))
def run_db(img, corners, TB):
    T = corners.shape[0]
    out = pl.pallas_call(
        make_db(TB),
        grid=(T // TB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # full corner table
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((TB, 1), lambda b: (b, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((2, TB, ROWS, COLS), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, TB)),
        ],
        out_shape=jax.ShapeDtypeStruct((T, 1), jnp.float32),
    )(corners, img)
    return out


def make_big(TB):
    def _kernel(c_ref, img_ref, out_ref, strip, sem):
        y0 = pl.multiple_of(c_ref[0, 0], 8)
        dma = pltpu.make_async_copy(
            img_ref.at[pl.ds(y0, TB * ROWS), :], strip, sem)
        dma.start()
        dma.wait()
        for t in range(TB):
            out_ref[t, 0] = jnp.sum(strip[t * ROWS].astype(jnp.float32))
    return _kernel


@functools.partial(jax.jit, static_argnames=("TB",))
def run_big(img, corners, TB):
    T = corners.shape[0]
    out = pl.pallas_call(
        make_big(TB),
        grid=(T // TB,),
        in_specs=[
            pl.BlockSpec((TB, 2), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((TB, 1), lambda b: (b, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((TB * ROWS, 768), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
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
    H, W = 4160, 768
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(H, W).astype(np.float32)).astype(jnp.bfloat16)
    T = 3072
    cy = rng.randint(0, (H - 64) // 8, T) * 8
    cx = rng.randint(0, (W - 128) // 128, T) * 128
    corners = jnp.asarray(np.stack([cy, cx], 1).astype(np.int32))

    for name, runner, TBs in (
            ("plain", run_plain, (8, 16, 32)),
            ("dbuf ", run_db, (8, 16, 32)),
            ("1-big", run_big, (8, 32)),
    ):
        for TB in TBs:
            try:
                t0 = time.perf_counter()
                jax.block_until_ready(runner(img, corners, TB))
                comp = time.perf_counter() - t0
                ms = scan_time(lambda r=runner, tb=TB: r(img, corners, tb))
                print(f"{name} TB={TB:3d}: {ms:7.3f} ms/call  "
                      f"(compile {comp:.0f}s)", flush=True)
            except Exception as e:
                msg = str(e).split("\n")[0][:160]
                print(f"{name} TB={TB:3d}: FAILED {type(e).__name__}: {msg}",
                      flush=True)


if __name__ == "__main__":
    main()
