"""Minimal isolation of the dynamic-leading-index VMEM load.

prof_lk9 crashed the remote Mosaic compiler (HTTP 500, no diagnostics).
Bisect: (a) dynamic leading index alone, static sublane; (b) static
leading, dynamic sublane (known-good per the strip kernel); (c) both
dynamic; (d) both dynamic + f32 instead of bf16; each as a tiny kernel.
"""
import functools, os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")

C, Hp = 4, 256


def make_kernel(mode):
    def _kernel(idx_ref, tile_ref, out_ref):
        j = idx_ref[0, 0]
        iy = idx_ref[0, 1]
        if mode == "dyn_lead":
            rows = tile_ref[j, 0:23, :]
        elif mode == "dyn_sub":
            rows = tile_ref[1, pl.ds(iy, 23), :]
        else:
            rows = tile_ref[j, pl.ds(iy, 23), :]
        out_ref[0, 0] = jnp.sum(rows.astype(jnp.float32))
    return _kernel


@functools.partial(jax.jit, static_argnames=("mode", "dtype"))
def run(tiles, idx, mode, dtype):
    return pl.pallas_call(
        make_kernel(mode),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((8, 2), lambda a: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 1), lambda a: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((8, 1), jnp.float32),
    )(idx, tiles.astype(dtype))


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    tiles = jnp.asarray(rng.rand(C, Hp, 128).astype(np.float32))
    idx = jnp.asarray(np.array([[2, 40]] * 8, np.int32))
    for mode in ("dyn_sub", "dyn_lead", "both"):
        for dtype in (jnp.float32, jnp.bfloat16):
            try:
                out = jax.block_until_ready(run(tiles, idx, mode, dtype))
                tn = np.asarray(tiles.astype(dtype).astype(jnp.float32))
                iy = 40 if mode != "dyn_lead" else 0
                j = 1 if mode == "dyn_sub" else 2
                ref = tn[j, iy:iy + 23].sum()
                print(f"{mode} {np.dtype(dtype).name}: OK "
                      f"got {float(out[0, 0]):.2f} ref {ref:.2f}",
                      flush=True)
            except Exception as e:
                print(f"{mode} {np.dtype(dtype).name}: FAILED "
                      f"{type(e).__name__}: {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
