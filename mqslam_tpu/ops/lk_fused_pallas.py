"""Fused Pallas TPU kernel: DMA patch extraction + LK Newton loop.

Fourth-generation LK hot path (after the banded-matmul XLA form, ops/lk.py,
the per-track fused-Newton kernel, ops/lk_pallas.py, and the 256-column
compacting DMA kernel of round 4).  Fills the role of the reference's
compiled hot-loop kernels (reference: Work/python_libs/triangulation_c —
native "speed-of-light" inner loops) for the front-end's dominant op,
cv2.calcOpticalFlowPyrLK (reference: Work/SLAM/application/own/slam2.py:381).

Why fused: one program per TB tracks issues all strip DMAs together
(template + search image, HBM -> VMEM), then template setup and the whole
Newton iteration run in-core on VMEM-resident strips — each image byte is
read from HBM exactly once per level, and the loop exits as soon as the
program's TB tracks have all converged (group early exit).

Why shifted copies (round 5): DMA lane offsets must be 128-aligned, so a
~23-px window that can start at any column needs a 256-column strip when
the image exists in one copy — 2.2x the round-4 kernel's measured traffic
was pure column padding (the kernel moved ~50x the useful window bytes).
Each pyramid level is instead stored TWICE, column-shifted by 0 and 64
(vertically stacked, ``strip_copies``): whichever copy puts the window's
column residual in [0, 64) is chosen per track, so a single 128-lane tile
always covers the window and the strip narrows to [ROWS, 128] — and the
old per-track compaction roll disappears entirely (the in-loop sampling
roll absorbs the residual).  Storing the copies in bf16 (exact for 8-bit
imagery at level 0) halves traffic again: 28 KB per track per level
against round 4's 96 KB.  Measured on a v5e, 3072-track level-0 call
(30-iteration budget): 3.40 ms (f32 [48,256] round-4 kernel) -> 1.49 ms
(bf16 shifted copies); iters=0 costs 1.28 ms — DMA+template setup still
dominate, the Newton loop itself stays ~free.

Window sampling inside the kernel is a dynamic sublane slice + row lerp
(Mosaic supports dynamic slicing on the sublane axis only) followed by a
dynamic lane-roll + column lerp on the full 128-lane tile — all VPU work.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lk_level_fused", "strip_copies", "strip_corners",
           "SEARCH_ROWS", "TMPL_ROWS", "TMPL_CAP"]

_COMPACT = 128   # strip lane width (one lane tile)
_ALIGN = 16      # strip row alignment: the bf16 sublane tile (f32 needs 8;
                 # 16 satisfies both, one geometry for both dtypes)
SEARCH_ROWS = 64  # search strip rows: residual (< _ALIGN, up to
                  # SEARCH_ROWS - P at the bottom clamp) + P(<=36) window rows
TMPL_ROWS = 48    # template strip rows: residual + TMPL_CAP window rows
TMPL_CAP = 26     # rows a template window needs: win + 2 (lerp tap +
                  # central-difference rows) + 1, win <= 23


def strip_copies(img, dtype=jnp.float32):
    """[H, W] -> [2*Hp, Wp] ``dtype``: two column-shifted copies (shift 0
    and 64), vertically stacked, each edge-padded to the DMA tile grid.

    For any window corner column cx, the copy k = (cx % 128) >= 64 puts the
    window's column residual within [0, 64), so a single 128-lane strip
    covers the window (rx + P <= 63 + 36 < 128).  Row count is padded to
    the 16-row bf16 sublane tile and to >= SEARCH_ROWS so strip row slices
    stay in bounds."""
    H, W = img.shape
    Hp = max(-(-H // _ALIGN) * _ALIGN, SEARCH_ROWS)
    Wp = max(-(-W // _COMPACT) * _COMPACT, _COMPACT)
    p = jnp.pad(img, ((0, Hp - H), (0, Wp + 64 - W)), mode="edge")
    return jnp.concatenate([p[:, :Wp], p[:, 64:64 + Wp]],
                           axis=0).astype(dtype)


def strip_corners(cy, cx, Hp, Wp, rows, win_rows, P):
    """Clamped strip origin + residuals for an exact integer corner.

    cy/cx [T] int32: desired window corner (atlas coordinates, rows within
    [0, Hp)).  Returns (src_y0, x0, cy, cx, ry, rx): ``src_y0`` is the
    strip's first source row in the STACKED copies array (copy offset
    folded in, _ALIGN-aligned), ``x0`` its 128-aligned column, ``cy``/
    ``cx`` the clamped corner (atlas coordinates), ``ry``/``rx`` the
    corner's residual inside the strip (ry <= max(_ALIGN, rows) -
    win_rows, rx < 64).  ``rows``: strip row count; ``win_rows``: rows
    the window reads; ``P``: window column extent (rx + P < 128
    guaranteed by the 64-shift copies)."""
    cy = jnp.clip(cy, 0, Hp - win_rows)
    cx = jnp.clip(cx, 0, Wp - P)
    y0 = jnp.minimum((cy // _ALIGN) * _ALIGN, Hp - rows)
    k = ((cx % 128) >= 64).astype(jnp.int32)
    cxk = cx - 64 * k
    x0 = (cxk // 128) * 128
    return y0 + k * Hp, x0, cy, cx, cy - y0, cxk - x0


def _kernel(cj_ref, ci_ref, aJ_ref, a0_ref, lo_ref, valid_ref, imgJ_ref,
            imgI_ref, a_out, eig_ref, err_ref, pJc, pIc, semJ, semI,
            *stripJI, TB, win, iters, eps, hiX, cast):
    stripJ, stripI = stripJI if cast else (pJc, pIc)

    def dma(c_ref, img_ref, strip, sem, t, rows):
        y0 = pl.multiple_of(c_ref[t, 0], _ALIGN)
        x0 = pl.multiple_of(c_ref[t, 1], 128)
        return pltpu.make_async_copy(
            img_ref.at[pl.ds(y0, rows), pl.ds(x0, _COMPACT)],
            strip.at[t], sem.at[t])

    for t in range(TB):
        dma(cj_ref, imgJ_ref, stripJ, semJ, t, TMPL_ROWS).start()
        dma(ci_ref, imgI_ref, stripI, semI, t, SEARCH_ROWS).start()
    for t in range(TB):
        dma(cj_ref, imgJ_ref, stripJ, semJ, t, TMPL_ROWS).wait()
        if cast:
            pJc[t] = stripJ[t].astype(jnp.float32)
        dma(ci_ref, imgI_ref, stripI, semI, t, SEARCH_ROWS).wait()
        if cast:
            pIc[t] = stripI[t].astype(jnp.float32)

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
    # roll — template setup + DMA, not the Newton loop, dominate the
    # level call (iters=0 measures ~same as iters=30).
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

    loYs = [lo_ref[t, 0] for t in range(TB)]
    loXs = [lo_ref[t, 1] for t in range(TB)]

    def _rows_at(t, iy, fy):
        rows0 = pIc[t, pl.ds(iy, win), :]
        rows1 = pIc[t, pl.ds(iy + 1, win), :]
        return (1.0 - fy) * rows0 + fy * rows1

    def _samp(t, ay, ax):
        """Full-lane-width window sample at fractional (ay, ax): columns
        0..win-1 carry the win x win window post-roll, the rest zeroed by
        ``mask``.  Column interpolation is a dynamic lane-roll + lerp —
        pure VPU work on [win, COMPACT] tiles (the roll absorbs the
        strip's column residual rx, so no compaction pass exists)."""
        iy = jnp.floor(ay).astype(jnp.int32)
        fy = ay - iy.astype(jnp.float32)
        ix = jnp.floor(ax).astype(jnp.int32)
        fx = ax - ix.astype(jnp.float32)
        rows = _rows_at(t, iy, fy)
        r0 = pltpu.roll(rows, -ix, 1)
        r1 = pltpu.roll(r0, _COMPACT - 1, 1)  # static +1-col shift
        return ((1.0 - fx) * r0 + fx * r1) * mask

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
            Iw = _samp(t, ays[t], axs[t])
            diff = Jws[t] - Iw
            b0 = jnp.sum(diff * dxs[t])
            b1 = jnp.sum(diff * dys[t])
            sx = (g11s[t] * b0 - g01s[t] * b1) / dets[t]
            sy = (g00s[t] * b1 - g01s[t] * b0) / dets[t]
            ax2 = jnp.clip(axs[t] + sx, loXs[t], loXs[t] + hiX)
            ay2 = jnp.clip(ays[t] + sy, loYs[t], loYs[t] + hiX)
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
        Iw = _samp(t, ays[t], axs[t])
        # masked lanes are zero in both windows; mean over the true window
        err_ref[t, 0] = jnp.sum(jnp.abs(Jws[t] - Iw)) / (win * win)


@functools.partial(jax.jit, static_argnames=("win", "iters", "eps", "hiX",
                                             "TB", "interpret"))
def lk_level_fused(imgJ, imgI, cj, ci, aJ, a0, lo, valid, win: int,
                   iters: int, eps: float, hiX: float, TB: int = 8,
                   interpret: bool = False):
    """One pyramid level of fused LK for T tracks.

    imgJ/imgI: [2*Hp, Wp] stacked shifted copies (``strip_copies``), f32
    or bf16 (bf16 halves DMA traffic; exact for 8-bit imagery at level 0).
    cj/ci: [T, 2] int32 (src_y0 _ALIGN-aligned stacked-copy row, x0
    128-aligned col) for template / search strips (``strip_corners``).
    aJ: [T, 2] f32 template window anchor (ay, ax) in strip coords (the
    column residual rx is folded into ax); a0: [T, 2] initial search
    anchor; lo: [T, 2] f32 (loY, loX) search clip base (the search strip's
    row/column residuals).  valid: [T] bool — invalid tracks start
    converged (their outputs are garbage and must be masked by the
    caller).  hiX: clip span (P - 2 - win) on both axes.
    Returns (a_final [T, 2] (ay, ax), min_eig [T], err [T]).
    """
    T = cj.shape[0]
    Tp = ((T + TB - 1) // TB) * TB
    valid = valid.astype(jnp.int32)
    if Tp != T:
        # replicate the last real track (a zero-filled dummy would never
        # converge and keep its whole program iterating)
        idx = jnp.minimum(jnp.arange(Tp), T - 1)
        cj, ci, aJ, a0, lo, valid = (x[idx] for x in
                                     (cj, ci, aJ, a0, lo, valid))
    cast = imgJ.dtype != jnp.float32
    kernel = functools.partial(_kernel, TB=TB, win=win, iters=iters,
                               eps=eps, hiX=hiX, cast=cast)
    scratch = [
        pltpu.VMEM((TB, TMPL_ROWS, _COMPACT), jnp.float32),
        pltpu.VMEM((TB, SEARCH_ROWS, _COMPACT), jnp.float32),
        pltpu.SemaphoreType.DMA((TB,)),
        pltpu.SemaphoreType.DMA((TB,)),
    ]
    if cast:  # DMA lands in the dtype strips, then casts into pJc/pIc
        scratch += [pltpu.VMEM((TB, TMPL_ROWS, _COMPACT), imgJ.dtype),
                    pltpu.VMEM((TB, SEARCH_ROWS, _COMPACT), imgI.dtype)]
    a_out, eig, err = pl.pallas_call(
        kernel,
        grid=(Tp // TB,),
        in_specs=[
            pl.BlockSpec((TB, 2), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TB, 2), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TB, 2), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TB, 2), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TB, 2), lambda b: (b, 0), memory_space=pltpu.SMEM),
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
        scratch_shapes=scratch,
        interpret=interpret,
    )(cj, ci, aJ.astype(jnp.float32), a0.astype(jnp.float32),
      lo.astype(jnp.float32), valid.reshape(Tp, 1), imgJ, imgI)
    return a_out[:T], eig[:T, 0], err[:T, 0]
