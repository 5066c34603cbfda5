"""VMEM-resident tiled LK kernel (gen-5): zero per-track DMAs.

Fifth-generation LK hot path.  The gen-4 strip kernel
(ops/lk_fused_pallas.py) is DMA-descriptor-bound: per-call time is flat in
bytes moved (151 MB and 38 MB of strips both ~1.5 ms on a v5e) because it
issues 2 descriptors per track per level (6144 at atlas scale, ~0.27 us
each).  This kernel issues ~2 descriptors per AGENT instead: the pyramid
level is relaid out lane-tile-major ([C, A*Ht, 128], ``tile_layout``), the
grid runs one program per agent whose [C, Ht, 128] J/I tile pair is
auto-pipelined into VMEM by pallas, and every per-track patch is built by
pure-VPU loads from the resident tiles:

    rows = tile[j, iy : iy + R, :] ++ tile[j+1, iy : iy + R, :]
    patch = roll(rows, -rx)[:, :128]

(dynamic leading-index + dynamic sublane slicing on 3D f32 VMEM refs
lowers fine; bf16 dynamic sublane slicing crashes Mosaic, so tiles are
f32 — measured: the f32 tile fetch is ~30 us/level for an 8-agent atlas
against the strip kernel's ~1.6 ms descriptor floor).  With no DMA
alignment constraints the patches also shrink to exactly the rows the
window needs (40 search / 32 template rows vs 64/48), and anchors lose
their residual terms entirely.

Fills the role of the reference's compiled hot-loop kernels (reference:
Work/python_libs/triangulation_c — native "speed-of-light" inner loops)
for cv2.calcOpticalFlowPyrLK (Work/SLAM/application/own/slam2.py:381).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lk_level_tiled", "tile_layout", "tile_vmem_bytes",
           "SEARCH_ROWS_T", "TMPL_ROWS_T"]

SEARCH_ROWS_T = 40   # P(<=36) window rows + lerp tap, 8-padded
TMPL_ROWS_T = 32     # win + 4 (lerp + gradient taps) <= 27, 8-padded


def tile_layout(img, n_tiles: int):
    """[n_tiles*Ht0, W] vertically-stacked atlas -> ([C, n_tiles*Ht, 128]
    lane-tile-major tiles, Ht).  Each agent tile is edge-padded to 8-row
    granularity; the width gains one guard lane-tile so in-kernel
    ``tile[j + 1]`` loads never leave the array."""
    H, W = img.shape
    Ht0 = H // n_tiles
    Ht = max(-(-Ht0 // 8) * 8, SEARCH_ROWS_T)
    Wp = -(-W // 128) * 128 + 128
    C = Wp // 128
    x = img.reshape(n_tiles, Ht0, W)
    x = jnp.pad(x, ((0, 0), (0, Ht - Ht0), (0, Wp - W)), mode="edge")
    x = x.reshape(n_tiles, Ht, C, 128).transpose(2, 0, 1, 3)
    return x.reshape(C, n_tiles * Ht, 128), Ht


def tile_vmem_bytes(H: int, W: int, n_tiles: int) -> int:
    """Per-agent J+I tile-pair footprint (x2 for pipeline double-buffer)."""
    Ht0 = H // n_tiles
    Ht = max(-(-Ht0 // 8) * 8, SEARCH_ROWS_T)
    Wp = -(-W // 128) * 128 + 128
    return 2 * 2 * Wp * Ht * 4


def _kernel(cj_ref, ci_ref, aJ_ref, a0_ref, valid_ref, tileJ_ref, tileI_ref,
            a_out, eig_ref, err_ref, pIc, *, TB, win, iters, eps,
            hiX, want_err):
    mask = (jax.lax.broadcasted_iota(jnp.int32, (win, 128), 1)
            < win).astype(jnp.float32)
    W2 = win + 2

    def compact(tile_ref, c_ref, t, rows):
        j = c_ref[t, 0]
        iy = c_ref[t, 1]
        rx = c_ref[t, 2]
        a = tile_ref[j, pl.ds(iy, rows), :]
        b = tile_ref[j + 1, pl.ds(iy, rows), :]
        return pltpu.roll(jnp.concatenate([a, b], axis=1), -rx, 1)[:, :128]

    for u in range(TB):
        pIc[u] = compact(tileI_ref, ci_ref, u, SEARCH_ROWS_T)

    # template windows + gradients from ONE lerped slab per track, built
    # STRAIGHT from the resident tile (gen-6): the per-track compaction
    # roll and the sampling roll fuse into one [W2, 256] roll, and the
    # +-1-lane gradient taps come from rolling the lerped row C itself
    # (roll is an exact lane permutation, so roll(C, -1) ==
    # (1-fx)*s1 + fx*s2 identically) — ~5 fewer vector ops per track
    # than the gen-5 compact+slab path, and no template scratch buffer.
    Jws, dxs, dys, g00s, g01s, g11s, dets = [], [], [], [], [], [], []
    for u in range(TB):
        ayJ = aJ_ref[u, 0]
        axJ = aJ_ref[u, 1]
        iyJ = jnp.floor(ayJ).astype(jnp.int32)
        fyJ = ayJ - iyJ.astype(jnp.float32)
        ixJ = jnp.floor(axJ).astype(jnp.int32)
        fxJ = axJ - ixJ.astype(jnp.float32)
        j = cj_ref[u, 0]
        row0 = cj_ref[u, 1] + iyJ - 1
        a = tileJ_ref[j, pl.ds(row0, W2 + 1), :]
        b = tileJ_ref[j + 1, pl.ds(row0, W2 + 1), :]
        R = jnp.concatenate([a, b], axis=1)        # [W2+1, 256]
        slab = (1.0 - fyJ) * R[:W2] + fyJ * R[1:W2 + 1]
        # align to the column LEFT of the window (sm1) first: the left
        # gradient tap must read the real pixel at window-column -1, and
        # ixJ >= 1 guarantees it exists in the slab
        sm1 = pltpu.roll(slab, -(cj_ref[u, 2] + ixJ - 1), 1)[:, :128]
        s0 = pltpu.roll(sm1, 127, 1)
        s1 = pltpu.roll(s0, 127, 1)
        C = (1.0 - fxJ) * s0 + fxJ * s1
        Cp = pltpu.roll(C, 127, 1)
        Cm = (1.0 - fxJ) * sm1 + fxJ * s0
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
        eig_ref[u, 0] = min_eig / (win * win)
        Jws.append(Jw)
        dxs.append(dx)
        dys.append(dy)
        g00s.append(g00)
        g01s.append(g01)
        g11s.append(g11)
        dets.append(jnp.where(jnp.abs(det) > 1e-20, det, 1e-20))

    def samp(u, ay, ax, masked=False):
        # the Newton-loop consumers (b0/b1 against the masked dx/dy)
        # zero the out-of-window lanes themselves, so the mask multiply
        # is only needed for the final |Jw - Iw| error resample
        iy = jnp.floor(ay).astype(jnp.int32)
        fy = ay - iy.astype(jnp.float32)
        ix = jnp.floor(ax).astype(jnp.int32)
        fx = ax - ix.astype(jnp.float32)
        rows0 = pIc[u, pl.ds(iy, win), :]
        rows1 = pIc[u, pl.ds(iy + 1, win), :]
        rows = (1.0 - fy) * rows0 + fy * rows1
        r0 = pltpu.roll(rows, -ix, 1)
        r1 = pltpu.roll(r0, 127, 1)
        out = (1.0 - fx) * r0 + fx * r1
        return out * mask if masked else out

    def cond(carry):
        it = carry[0]
        alive = jnp.logical_not(carry[3][0])
        for u in range(1, TB):
            alive = alive | jnp.logical_not(carry[3][u])
        return (it < iters) & alive

    def body(carry):
        it, ays, axs, dones = carry
        ays2, axs2, dones2 = [], [], []
        for u in range(TB):
            Iw = samp(u, ays[u], axs[u])
            diff = Jws[u] - Iw
            b0 = jnp.sum(diff * dxs[u])
            b1 = jnp.sum(diff * dys[u])
            sx = (g11s[u] * b0 - g01s[u] * b1) / dets[u]
            sy = (g00s[u] * b1 - g01s[u] * b0) / dets[u]
            ax2 = jnp.clip(axs[u] + sx, 0.0, hiX)
            ay2 = jnp.clip(ays[u] + sy, 0.0, hiX)
            d2 = dones[u] | (sx * sx + sy * sy < eps * eps)
            ays2.append(jnp.where(dones[u], ays[u], ay2))
            axs2.append(jnp.where(dones[u], axs[u], ax2))
            dones2.append(d2)
        return it + 1, tuple(ays2), tuple(axs2), tuple(dones2)

    init = (jnp.int32(0),
            tuple(a0_ref[u, 0] for u in range(TB)),
            tuple(a0_ref[u, 1] for u in range(TB)),
            tuple(valid_ref[u, 0] == 0 for u in range(TB)))
    _, ays, axs, _ = jax.lax.while_loop(cond, body, init)

    for u in range(TB):
        a_out[u, 0] = ays[u]
        a_out[u, 1] = axs[u]
        if want_err:
            Iw = samp(u, ays[u], axs[u], masked=True)
            err_ref[u, 0] = jnp.sum(jnp.abs(Jws[u] - Iw)) / (win * win)
        else:
            # err is consumed only at pyramid level 0 — skip the final
            # resample + reduction on the coarse levels (~7 vector ops
            # per track)
            err_ref[u, 0] = 0.0


@functools.partial(jax.jit, static_argnames=("A", "win", "iters", "eps",
                                             "hiX", "TB", "interpret",
                                             "want_err"))
def lk_level_tiled(tileJ, tileI, cj, ci, aJ, a0, valid, A: int,
                   win: int, iters: int, eps: float, hiX: float,
                   TB: int = 8, interpret: bool = False,
                   want_err: bool = True):
    """One pyramid level of tiled LK for T = A*K tracks (agent-contiguous:
    track t belongs to agent t // K).

    tileJ/tileI: [C, A*Ht, 128] f32 lane-tile-major copies
    (``tile_layout``).  cj/ci: [T, 3] int32 (lane-tile j, LOCAL tile row
    iy, lane residual rx) for template / search patches; aJ/a0: [T, 2]
    f32 anchors in compacted-patch coords (template ~[1, 2); search in
    [0, hiX]); valid: [T] bool.  Returns (a_final [T, 2] (ay, ax),
    min_eig [T], err [T])."""
    T = cj.shape[0]
    assert T % A == 0, (T, A)
    Ht = tileJ.shape[1] // A
    K = T // A
    Kp = ((K + TB - 1) // TB) * TB
    valid = valid.astype(jnp.int32)
    if Kp != K:
        # pad each agent's K block to a TB multiple, replicating the
        # block's last track (a dummy would never converge)
        idx = (jnp.minimum(jnp.arange(Kp), K - 1)[None, :]
               + K * jnp.arange(A)[:, None]).reshape(-1)
        cj, ci, aJ, a0, valid = (x[idx] for x in (cj, ci, aJ, a0, valid))
        K = Kp
    kernel = functools.partial(_kernel, TB=TB, win=win, iters=iters,
                               eps=eps, hiX=hiX, want_err=want_err)
    C = tileJ.shape[0]
    NB = K // TB
    # grid (agent, track-block): the tile block index depends only on the
    # agent coordinate, so pallas fetches each agent's J/I tile pair once
    # and keeps it VMEM-resident across that agent's NB track blocks
    # (block revisiting); SMEM per-block windows stay tiny (SMEM blocks
    # are lane-padded to 128 — a [K, 3] whole-table window would blow the
    # 1 MB SMEM budget at K = 3072).
    tb = lambda a, b: (a * NB + b, 0)
    a_out, eig, err = pl.pallas_call(
        kernel,
        grid=(A, NB),
        in_specs=[
            pl.BlockSpec((TB, 3), tb, memory_space=pltpu.SMEM),
            pl.BlockSpec((TB, 3), tb, memory_space=pltpu.SMEM),
            pl.BlockSpec((TB, 2), tb, memory_space=pltpu.SMEM),
            pl.BlockSpec((TB, 2), tb, memory_space=pltpu.SMEM),
            pl.BlockSpec((TB, 1), tb, memory_space=pltpu.SMEM),
            pl.BlockSpec((C, Ht, 128), lambda a, b: (0, a, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Ht, 128), lambda a, b: (0, a, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TB, 2), tb, memory_space=pltpu.SMEM),
            pl.BlockSpec((TB, 1), tb, memory_space=pltpu.SMEM),
            pl.BlockSpec((TB, 1), tb, memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((A * K, 2), jnp.float32),
            jax.ShapeDtypeStruct((A * K, 1), jnp.float32),
            jax.ShapeDtypeStruct((A * K, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((TB, SEARCH_ROWS_T, 128), jnp.float32),
        ],
        interpret=interpret,
    )(cj, ci, aJ.astype(jnp.float32), a0.astype(jnp.float32),
      valid.reshape(-1, 1), tileJ, tileI)
    # un-pad: take the first T//A rows of each agent block
    K0 = T // A
    if K != K0:
        idx = (jnp.arange(K0)[None, :] + K * jnp.arange(A)[:, None]
               ).reshape(-1)
        a_out, eig, err = a_out[idx], eig[idx], err[idx]
    return a_out[:T], eig[:T, 0], err[:T, 0]
