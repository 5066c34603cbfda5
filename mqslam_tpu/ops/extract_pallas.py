"""Pallas patch-extraction kernel: per-track DMA gather of patches.

The XLA formulation of patch extraction (ops/lk.py ``_extract_patches``)
gathers whole row strips [T, P, W] and selects columns with a one-hot
einsum.  At atlas track counts (A*K = 3072 on a 4128x676 atlas) that
materializes ~300 MB of strips per call and runs at gather-engine speed —
measured as the dominant cost of the whole LK call.

A patch copy is not vector compute; it is 2-D rectangular DMA.  Mosaic
requires DMA slice shapes/offsets aligned to the (8, 128) f32 tile, so each
track copies an aligned [48, 256] strip that covers its patch
(HBM -> VMEM, all copies in a block in flight at once), then compacts the
columns with an exact dynamic lane-roll (``tpu.dynamic_rotate``) and a
static slice.  The row sub-offset (corner - aligned start, in [0, 8)) is
*not* compacted: the kernel returns the aligned row corner, and callers
fold the residual into the window's fractional row anchor — the banded
interpolation downstream handles any in-patch offset.

Corner coordinates ride in scalar prefetch (SMEM) so DMA descriptors are
computed before the body runs.  Fills the role of the reference's compiled
hot-loop kernels (reference: Work/python_libs/triangulation_c — native
"speed-of-light" versions of the inner loops).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["extract_patches_dma", "ROWS_CAP", "dma_extract_supported"]

ROWS_CAP = 48          # strip rows: 8-aligned, >= 8-residual + P(<=38) rows
_STRIP_COLS = 256      # strip cols: two lane tiles cover any 128-residual


def dma_extract_supported(H: int, W: int) -> bool:
    """Image large enough for the aligned strip copies."""
    return H >= ROWS_CAP and W >= _STRIP_COLS


def _clamped_corners(cy, cx, H, W, P):
    """Clamp corners and derive tile-aligned strip origins.

    The clamp caps are chosen so the residuals stay inside the strip even
    when H/W are not tile-multiples: rows cy - y0 <= ROWS_CAP - P, cols
    cx - x0 <= _STRIP_COLS - P.  (This tightens the bottom/right clamp by
    up to 7/127 px vs the XLA path's H-P/W-P — only tracks that are
    already out of bounds, and therefore status-rejected, can differ.)
    """
    y0_max = ((H - ROWS_CAP) // 8) * 8
    x0_max = ((W - _STRIP_COLS) // 128) * 128
    cy = jnp.clip(cy, 0, min(H - P, y0_max + ROWS_CAP - P))
    cx = jnp.clip(cx, 0, min(W - P, x0_max + _STRIP_COLS - P))
    y0 = jnp.minimum((cy // 8) * 8, y0_max)
    x0 = jnp.minimum((cx // 128) * 128, x0_max)
    return cy, cx, y0, x0


def _kernel(corner_ref, img_ref, out_ref, strip, sem, *, TB, P, H, W):
    def src(t):
        cy, cx, y0, x0 = _clamped_corners(
            corner_ref[t, 0], corner_ref[t, 1], H, W, P)
        y0 = pl.multiple_of(y0, 8)
        x0 = pl.multiple_of(x0, 128)
        return cx - x0, pltpu.make_async_copy(
            img_ref.at[pl.ds(y0, ROWS_CAP), pl.ds(x0, _STRIP_COLS)],
            strip.at[t], sem.at[t])

    def start(t, _):
        src(t)[1].start()
        return 0

    jax.lax.fori_loop(0, TB, start, 0, unroll=True)

    def finish(t, _):
        rx, dma = src(t)
        dma.wait()
        out_ref[t] = pltpu.roll(strip[t], -rx, 1)[:, :P]
        return 0

    jax.lax.fori_loop(0, TB, finish, 0, unroll=True)


@functools.partial(jax.jit, static_argnames=("P", "TB", "interpret"))
def extract_patches_dma(img, corner_yx, P: int, TB: int = 16,
                        interpret: bool = False):
    """Per-track patches at integer corners [T, 2] (y, x), clamped.

    Returns (patches [T, ROWS_CAP, P], cy [T], cx [T]) where ``cy`` is the
    8-aligned row corner actually used (callers add ``corner_row - cy`` to
    the fractional row anchor; it is in [0, 8), or up to 10 at the bottom
    clamp) and ``cx`` is the exact clamped column corner.  Column semantics
    match ``_extract_patches``; rows deliver extra valid context below the
    requested window.
    """
    H, W = img.shape
    assert dma_extract_supported(H, W), (H, W)
    T = corner_yx.shape[0]
    cy, cx, y0, _ = _clamped_corners(
        corner_yx[:, 0].astype(jnp.int32),
        corner_yx[:, 1].astype(jnp.int32), H, W, P)
    Tp = ((T + TB - 1) // TB) * TB
    corners = jnp.zeros((Tp, 2), jnp.int32)
    corners = corners.at[:T, 0].set(cy).at[:T, 1].set(cx)

    patches = pl.pallas_call(
        functools.partial(_kernel, TB=TB, P=P, H=H, W=W),
        grid=(Tp // TB,),
        in_specs=[
            pl.BlockSpec((TB, 2), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((TB, ROWS_CAP, P), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TB, ROWS_CAP, _STRIP_COLS), img.dtype),
            pltpu.SemaphoreType.DMA((TB,)),
        ],
        out_shape=jax.ShapeDtypeStruct((Tp, ROWS_CAP, P), img.dtype),
        interpret=interpret,
    )(corners, img)
    return patches[:T], y0, cx
