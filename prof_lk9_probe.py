"""TPU probe #3: VMEM-resident tile addressing for the LK kernel.

Can Mosaic lower ``arr[j, pl.ds(iy, R), :]`` on a 3D VMEM ref with BOTH a
dynamic leading index j (lane-tile select) and a dynamic sublane start iy?
If yes, the per-track strip DMAs (6144 descriptors/call, the measured
1.6 ms floor) can be replaced by ONE pipelined tile fetch per agent and
pure-VPU window reads.

Also times: 3072 tracks x (2 slab loads + dynamic roll + lerp) from a
VMEM-resident [C, H, 128] tile, grid over 8 agents, to bound the
compute-side cost of the redesign.
"""
import functools, os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")

C, Hp, W2 = 12, 520, 23  # lane tiles (2 copies x 6), agent tile rows
K, TB = 384, 8           # tracks per agent, tracks per inner block
A = 8


def _kernel(idx_ref, tile_ref, out_ref):
    def blk(b, _):
        for u in range(TB):
            t = b * TB + u
            j = idx_ref[t, 0]
            iy = idx_ref[t, 1]
            rx = idx_ref[t, 2]
            fy = 0.37
            rows0 = tile_ref[j, pl.ds(iy, W2), :]
            rows1 = tile_ref[j, pl.ds(iy + 1, W2), :]
            slab = (1.0 - fy) * rows0.astype(jnp.float32) \
                + fy * rows1.astype(jnp.float32)
            s0 = pltpu.roll(slab, -rx, 1)
            out_ref[t, 0] = jnp.sum(s0[:21])
        return 0
    jax.lax.fori_loop(0, K // TB, blk, 0, unroll=False)


@jax.jit
def run(tiles, idx):
    return pl.pallas_call(
        _kernel,
        grid=(A,),
        in_specs=[
            pl.BlockSpec((K, 3), lambda a: (a, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((C, Hp, 128), lambda a: (0, a, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, 1), lambda a: (a, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((A * K, 1), jnp.float32),
    )(idx, tiles)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    tiles = jnp.asarray(rng.rand(C, A * Hp, 128).astype(np.float32)
                        ).astype(jnp.bfloat16)
    idx = np.stack([rng.randint(0, C, A * K),
                    rng.randint(0, Hp - W2 - 2, A * K),
                    rng.randint(0, 64, A * K)], 1).astype(np.int32)
    idx = jnp.asarray(idx)
    try:
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(tiles, idx))
        print(f"dynamic-leading-index VMEM load: OK "
              f"(compile {time.perf_counter() - t0:.0f}s)", flush=True)
        # numeric check vs numpy
        tn = np.asarray(tiles.astype(jnp.float32))
        i0 = np.asarray(idx)
        a0 = 0
        t_chk = 5
        j, iy, rx = i0[t_chk]
        slab = (1 - 0.37) * tn[j, iy:iy + W2] + 0.37 * tn[j, iy + 1:iy + 1 + W2]
        ref = np.roll(slab, -rx, axis=1)[:21].sum()
        got = float(np.asarray(out)[t_chk, 0])
        print(f"numeric: got {got:.3f} ref {ref:.3f}", flush=True)

        @jax.jit
        def scanned(x):
            def body(c, _):
                return c + run(tiles, x)[0, 0] * 1e-30, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=30)
            return c
        jax.block_until_ready(scanned(idx))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(scanned(idx))
            best = min(best, time.perf_counter() - t0)
        print(f"3072 tracks x 2-slab-load+roll+lerp: {best / 30 * 1e3:.3f} "
              f"ms/call", flush=True)
    except Exception as e:
        print(f"FAILED {type(e).__name__}: {str(e)[:500]}", flush=True)


if __name__ == "__main__":
    main()
