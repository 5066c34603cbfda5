"""TPU probe #4: VMEM-resident tile kernel — representative per-track cost.

f32 tiles (bf16 dynamic sublane slicing crashes Mosaic — prof_lk9b), grid
over A=8 agents with per-agent [C, Ht, 128] tile blocks auto-pipelined.
Per track, the work the real kernel would do at iters=0:
  - search "compaction": 2-tile concat [64, 256], dynamic roll, store 128
  - template slab: [25, 256] concat + roll + lerp + static rolls + sums
Times the whole 3072-track pass to bound the no-DMA redesign's floor.
"""
import functools, os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")

C, Ht = 6, 520        # lane tiles, per-agent tile rows
K, TB = 384, 8
A = 8
SROWS, W2 = 64, 23


def _kernel(idx_ref, tileJ_ref, tileI_ref, out_ref, pIc):
    def blk(b, _):
        for u in range(TB):
            t = b * TB + u
            j = idx_ref[t, 0]
            iy = idx_ref[t, 1]
            rx = idx_ref[t, 2]
            # search compaction: [SROWS, 256] concat + dynamic roll -> 128
            sA = tileI_ref[j, pl.ds(iy, SROWS), :]
            sB = tileI_ref[j + 1, pl.ds(iy, SROWS), :]
            comb = jnp.concatenate([sA, sB], axis=1)
            pIc[u] = pltpu.roll(comb, -rx, 1)[:, :128]
            # template slab: [W2+2, 256] concat + roll + lerp + sums
            tA = tileJ_ref[j, pl.ds(iy, W2 + 2), :]
            tB = tileJ_ref[j + 1, pl.ds(iy, W2 + 2), :]
            tcomb = pltpu.roll(jnp.concatenate([tA, tB], axis=1), -rx,
                               1)[:, :128]
            slab = 0.63 * tcomb[:-1] + 0.37 * tcomb[1:]
            s1 = pltpu.roll(slab, 127, 1)
            C0 = 0.3 * slab + 0.7 * s1
            out_ref[t, 0] = (jnp.sum(C0[:21]) + jnp.sum(pIc[u][:21])
                             + jnp.sum(C0[:21] * C0[:21]))
        return 0
    jax.lax.fori_loop(0, K // TB, blk, 0, unroll=False)


@jax.jit
def run(tilesJ, tilesI, idx):
    return pl.pallas_call(
        _kernel,
        grid=(A,),
        in_specs=[
            pl.BlockSpec((K, 3), lambda a: (a, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((C, Ht, 128), lambda a: (0, a, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Ht, 128), lambda a: (0, a, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, 1), lambda a: (a, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((TB, SROWS, 128), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((A * K, 1), jnp.float32),
    )(idx, tilesJ, tilesI)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    tilesJ = jnp.asarray(rng.rand(C, A * Ht, 128).astype(np.float32))
    tilesI = jnp.asarray(rng.rand(C, A * Ht, 128).astype(np.float32))
    idx = jnp.asarray(np.stack([rng.randint(0, C - 1, A * K),
                                rng.randint(0, Ht - SROWS - 2, A * K),
                                rng.randint(0, 128, A * K)], 1)
                      .astype(np.int32))
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(tilesJ, tilesI, idx))
    print(f"compiled+ran in {time.perf_counter() - t0:.0f}s; "
          f"out[5]={float(out[5, 0]):.2f}", flush=True)

    @jax.jit
    def scanned(x):
        def body(c, _):
            return c + run(tilesJ, tilesI, x)[0, 0] * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=30)
        return c
    jax.block_until_ready(scanned(idx))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(scanned(idx))
        best = min(best, time.perf_counter() - t0)
    print(f"3072 tracks x (compaction+template-ish) VMEM-resident: "
          f"{best / 30 * 1e3:.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
