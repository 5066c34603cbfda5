"""Fused Pallas TPU kernel: DMA patch extraction + LK Newton loop.

Third-generation LK hot path (after the banded-matmul XLA form, ops/lk.py,
and the per-track fused-Newton kernel, ops/lk_pallas.py).  Fills the role
of the reference's compiled hot-loop kernels (reference:
Work/python_libs/triangulation_c — native "speed-of-light" inner loops)
for the front-end's dominant op, cv2.calcOpticalFlowPyrLK
(reference: Work/SLAM/application/own/slam2.py:381).

Why fused: the XLA path extracts patches with a Pallas DMA kernel
(ops/extract_pallas.py), round-trips them through HBM, and re-streams the
whole [T, 48, P] patch tensor from HBM on EVERY Newton iteration of the
whole-batch while_loop.  The per-track kernel (ops/lk_pallas.py) keeps
patches in VMEM but launches one tiny program per track, so program
overhead dominates.  This kernel does both jobs at once, TB tracks per
program:

  1. each program issues 2*TB aligned strip DMAs (template + search image,
     HBM -> VMEM) with all copies in flight together;
  2. columns are compacted with a dynamic lane-roll (DMA offsets must be
     128-aligned on the lane axis; the roll absorbs the residual);
  3. template windows/gradients and the whole Newton iteration run
     in-core on VMEM-resident patches — each image byte is read from HBM
     exactly once per level, and the loop exits as soon as the program's
     TB tracks have all converged (group early exit).

Window sampling inside the kernel is a dynamic sublane slice + row lerp
(Mosaic supports dynamic slicing on the sublane axis only) followed by a
dynamic lane-roll + column lerp on the full 128-lane tile — all VPU work.
(A banded-matrix matmul per sample was the original form; its
[win, 128] x [128, win] products used ~3% of an MXU pass and made the
Newton loop the A=8 front-end's dominant cost — see _samp.)
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mqslam_tpu.ops.extract_pallas import ROWS_CAP, _STRIP_COLS

__all__ = ["lk_level_fused"]

_COMPACT = 128  # compacted patch lane width (one lane tile)


def _rows_at(pc, t, iy, fy, win):
    """Row-interpolated [win, COMPACT] slab at integer row iy + fraction
    fy (dynamic sublane slice + lerp)."""
    rows0 = pc[t, pl.ds(iy, win), :]
    rows1 = pc[t, pl.ds(iy + 1, win), :]
    return (1.0 - fy) * rows0 + fy * rows1


def _samp(pc, t, ay, ax, win, mask):
    """Full-lane-width window sample at fractional (ay, ax): columns
    0..win-1 carry the win x win window, the rest are zeroed by ``mask``.

    Column interpolation is a dynamic lane-roll + lerp (pure VPU work on
    full [win, COMPACT] tiles).  The earlier banded-matmul form put a
    [win, COMPACT] x [COMPACT, win] product on the MXU per sample —
    21x21 useful lanes of a 128x128 pass, ~3% utilization — and made the
    Newton loop MXU-bound at atlas track counts; the roll form runs the
    3072-track level-0 call in 3.4 ms vs the matmul form's 5.2 ms
    (scan-slope, v5e, 30-iteration budget)."""
    iy = jnp.floor(ay).astype(jnp.int32)
    fy = ay - iy.astype(jnp.float32)
    ix = jnp.floor(ax).astype(jnp.int32)
    fx = ax - ix.astype(jnp.float32)
    rows = _rows_at(pc, t, iy, fy, win)
    r0 = pltpu.roll(rows, -ix, 1)
    r1 = pltpu.roll(r0, _COMPACT - 1, 1)  # static +1-col shift
    return ((1.0 - fx) * r0 + fx * r1) * mask


def _kernel(cj_ref, ci_ref, aJ_ref, a0_ref, loY_ref, valid_ref, imgJ_ref,
            imgI_ref, a_out, eig_ref, err_ref, stripJ, stripI, pJc, pIc,
            semJ, semI, *, TB, win, iters, eps, hiX):
    def dma(c_ref, img_ref, strip, sem, t):
        y0 = pl.multiple_of(c_ref[t, 0], 8)
        x0 = pl.multiple_of(c_ref[t, 1], 128)
        return pltpu.make_async_copy(
            img_ref.at[pl.ds(y0, ROWS_CAP), pl.ds(x0, _STRIP_COLS)],
            strip.at[t], sem.at[t])

    for t in range(TB):
        dma(cj_ref, imgJ_ref, stripJ, semJ, t).start()
        dma(ci_ref, imgI_ref, stripI, semI, t).start()
    for t in range(TB):
        dma(cj_ref, imgJ_ref, stripJ, semJ, t).wait()
        pJc[t] = pltpu.roll(stripJ[t], -cj_ref[t, 2], 1)[:, :_COMPACT]
        dma(ci_ref, imgI_ref, stripI, semI, t).wait()
        pIc[t] = pltpu.roll(stripI[t], -ci_ref[t, 2], 1)[:, :_COMPACT]

    # lanes >= win are roll wrap-around garbage: zero them so window sums
    # see exactly the win x win window
    mask = (jax.lax.broadcasted_iota(jnp.int32, (win, _COMPACT), 1)
            < win).astype(jnp.float32)

    # template windows + gradients (central differences), min-eig gate.
    # ONE [win+2, COMPACT] lerped slab per track serves the window AND
    # both central-difference gradients: its single dynamic lane-roll is
    # shared, the +-1-column samples are static lane shifts, and the
    # +-1-row samples are static sublane rolls of the same slab (wrapped
    # rows are sliced away).  This replaced three separate slab builds
    # (6 loads + 3 dynamic rolls per track) with 2 loads + 1 dynamic
    # roll — template setup, not the Newton loop, is the level call's
    # dominant cost (iters=0 measures ~same as iters=30).
    W2 = win + 2
    Jws, dxs, dys, g00s, g01s, g11s, dets = [], [], [], [], [], [], []
    for t in range(TB):
        ayJ = aJ_ref[t, 0]
        axJ = aJ_ref[t, 1]
        iyJ = jnp.floor(ayJ).astype(jnp.int32)
        fyJ = ayJ - iyJ.astype(jnp.float32)
        ixJ = jnp.floor(axJ).astype(jnp.int32)
        fxJ = axJ - ixJ.astype(jnp.float32)
        slabA = pJc[t, pl.ds(iyJ - 1, W2), :]
        slabB = pJc[t, pl.ds(iyJ, W2), :]
        slab = (1.0 - fyJ) * slabA + fyJ * slabB  # rows iyJ-1+fy ..
        s0 = pltpu.roll(slab, -ixJ, 1)
        s1 = pltpu.roll(s0, _COMPACT - 1, 1)      # +1 col
        s2 = pltpu.roll(s1, _COMPACT - 1, 1)      # +2 col
        sm1 = pltpu.roll(s0, 1, 1)                # -1 col
        C = (1.0 - fxJ) * s0 + fxJ * s1           # sampled at axJ
        Cp = (1.0 - fxJ) * s1 + fxJ * s2          # at axJ + 1
        Cm = (1.0 - fxJ) * sm1 + fxJ * s0         # at axJ - 1
        # row views: slab row 1+k is window row k at ayJ; 0/2 are ay -/+ 1
        Jw = pltpu.roll(C, W2 - 1, 0)[:win] * mask
        dx = pltpu.roll(0.5 * (Cp - Cm), W2 - 1, 0)[:win] * mask
        dy = 0.5 * (pltpu.roll(C, W2 - 2, 0)[:win] - C[:win]) * mask
        g00 = jnp.sum(dx * dx)
        g01 = jnp.sum(dx * dy)
        g11 = jnp.sum(dy * dy)
        det = g00 * g11 - g01 * g01
        tr = 0.5 * (g00 + g11)
        min_eig = tr - jnp.sqrt(jnp.maximum(
            0.25 * (g00 - g11) ** 2 + g01 * g01, 0.0))
        eig_ref[t, 0] = min_eig / (win * win)
        Jws.append(Jw)
        dxs.append(dx)
        dys.append(dy)
        g00s.append(g00)
        g01s.append(g01)
        g11s.append(g11)
        dets.append(jnp.where(jnp.abs(det) > 1e-20, det, 1e-20))

    loYs = [loY_ref[t, 0] for t in range(TB)]
    hiYs = [lo + (hiX - 0.0) for lo in loYs]  # same span on both axes

    def cond(carry):
        it = carry[0]
        alive = jnp.logical_not(carry[3][0])
        for t in range(1, TB):
            alive = alive | jnp.logical_not(carry[3][t])
        return (it < iters) & alive

    def body(carry):
        it, ays, axs, dones = carry
        ays2, axs2, dones2 = [], [], []
        for t in range(TB):
            Iw = _samp(pIc, t, ays[t], axs[t], win, mask)
            diff = Jws[t] - Iw
            b0 = jnp.sum(diff * dxs[t])
            b1 = jnp.sum(diff * dys[t])
            sx = (g11s[t] * b0 - g01s[t] * b1) / dets[t]
            sy = (g00s[t] * b1 - g01s[t] * b0) / dets[t]
            ax2 = jnp.clip(axs[t] + sx, 0.0, hiX)
            ay2 = jnp.clip(ays[t] + sy, loYs[t], hiYs[t])
            d2 = dones[t] | (sx * sx + sy * sy < eps * eps)
            ays2.append(jnp.where(dones[t], ays[t], ay2))
            axs2.append(jnp.where(dones[t], axs[t], ax2))
            dones2.append(d2)
        return it + 1, tuple(ays2), tuple(axs2), tuple(dones2)

    # Inactive tracks (tracker slots with active=False, possibly NaN
    # positions) start done: a NaN step never satisfies the eps test, so
    # an unseeded done would make its whole program run all ``iters``
    # every level and defeat the group early exit.  Outputs are gated by
    # status outside the kernel, so this is purely a latency win.
    init = (jnp.int32(0),
            tuple(a0_ref[t, 0] for t in range(TB)),
            tuple(a0_ref[t, 1] for t in range(TB)),
            tuple(valid_ref[t, 0] == 0 for t in range(TB)))
    _, ays, axs, _ = jax.lax.while_loop(cond, body, init)

    for t in range(TB):
        a_out[t, 0] = ays[t]
        a_out[t, 1] = axs[t]
        Iw = _samp(pIc, t, ays[t], axs[t], win, mask)
        # masked lanes are zero in both windows; mean over the true window
        err_ref[t, 0] = jnp.sum(jnp.abs(Jws[t] - Iw)) / (win * win)


@functools.partial(jax.jit, static_argnames=("win", "iters", "eps", "hiX",
                                             "TB", "interpret"))
def lk_level_fused(imgJ, imgI, cj, ci, aJ, a0, loY, valid, win: int,
                   iters: int, eps: float, hiX: float, TB: int = 8,
                   interpret: bool = False):
    """One pyramid level of fused LK for T tracks.

    imgJ/imgI: [H, W] f32 images, H % 8 == 0, W % 128 == 0, H >= 48,
    W >= 256 (callers pad; see ops/lk.py).
    cj/ci: [T, 3] int32 (y0 8-aligned strip row, x0 128-aligned strip col,
    rx column roll = exact corner - x0) for template / search strips.
    aJ: [T, 2] f32 template window anchor (ay, ax) in compacted-strip
    coords; a0: [T, 2] initial search anchor; loY: [T] f32 row clip base
    (search-strip row residual).  valid: [T] bool — invalid tracks start
    converged (their outputs are garbage and must be masked by the
    caller).  hiX: col clip bound (P - 2 - win).
    Returns (a_final [T, 2] (ay, ax), min_eig [T], err [T]).
    """
    T = cj.shape[0]
    Tp = ((T + TB - 1) // TB) * TB
    valid = valid.astype(jnp.int32)
    if Tp != T:
        # replicate the last real track (a zero-filled dummy would never
        # converge and keep its whole program iterating)
        idx = jnp.minimum(jnp.arange(Tp), T - 1)
        cj, ci, aJ, a0, loY, valid = (x[idx] for x in
                                      (cj, ci, aJ, a0, loY, valid))
    kernel = functools.partial(_kernel, TB=TB, win=win, iters=iters,
                               eps=eps, hiX=hiX)
    a_out, eig, err = pl.pallas_call(
        kernel,
        grid=(Tp // TB,),
        in_specs=[
            pl.BlockSpec((TB, 3), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TB, 3), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TB, 2), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TB, 2), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TB, 1), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TB, 1), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=(
            pl.BlockSpec((TB, 2), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TB, 1), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TB, 1), lambda b: (b, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Tp, 2), jnp.float32),
            jax.ShapeDtypeStruct((Tp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Tp, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((TB, ROWS_CAP, _STRIP_COLS), jnp.float32),
            pltpu.VMEM((TB, ROWS_CAP, _STRIP_COLS), jnp.float32),
            pltpu.VMEM((TB, ROWS_CAP, _COMPACT), jnp.float32),
            pltpu.VMEM((TB, ROWS_CAP, _COMPACT), jnp.float32),
            pltpu.SemaphoreType.DMA((TB,)),
            pltpu.SemaphoreType.DMA((TB,)),
        ],
        interpret=interpret,
    )(cj, ci, aJ.astype(jnp.float32), a0.astype(jnp.float32),
      loY.astype(jnp.float32).reshape(Tp, 1), valid.reshape(Tp, 1),
      imgJ, imgI)
    return a_out[:T], eig[:T, 0], err[:T, 0]
