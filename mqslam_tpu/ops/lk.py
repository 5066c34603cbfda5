"""Pyramidal Lucas-Kanade sparse optical flow (patch/matmul formulation).

Replaces ``cv2.calcOpticalFlowPyrLK`` with the defaults the reference's
front-end relies on (reference: Work/SLAM/application/own/slam2.py:381):
21x21 window, 3 pyramid levels, <=30 Newton iterations with eps=0.01,
min-eigenvalue rejection at 1e-4 (0..255 intensity scale), ``err`` = mean
absolute window intensity difference (gated at max_OF_error=12,
slam2.py:382-385).

TPU-first design: a naive per-sample gather formulation moves ~80M randomly
indexed elements per frame and ran at ~0.5 s/frame on a v5e. Instead, each
track extracts one square patch per pyramid level (vmapped dynamic_slice —
contiguous rows), and every bilinear window sample inside the iteration loop
becomes ``Wy @ patch @ Wx^T`` with banded interpolation matrices built
elementwise from the fractional offset — all MXU matmuls and VPU arithmetic,
zero gathers in the loop. The window anchor is the level's initial flow
guess, so the per-level residual displacement stays within the patch margin.
"""

from functools import partial

import jax
import jax.numpy as jnp

from mqslam_tpu.ops import linalg

__all__ = ["build_pyramid", "lk_pad", "lk_track", "lk_track_pyr",
           "bilinear_sample"]


def lk_pad(win: int = 21, margin: int = 7) -> int:
    """Edge padding lk_track_pyr(prepad=True) expects on every level."""
    return win // 2 + margin + 1

_HP = jax.lax.Precision.HIGHEST


def _pyrdown(img):
    """5x5 binomial blur + 2x decimation (cv2.pyrDown kernel).

    Decimate-then-filter via strided slices: XLA lowers single-channel 5-tap
    convs to scalar-ish code on TPU (~6.6 ms for a 3-level 640x480 pyramid);
    five shifted strided slices + adds per axis is pure VPU work and runs the
    same pyramid in ~0.13 ms, bit-matching the conv output to f32 roundoff.
    """
    k = (1.0, 4.0, 6.0, 4.0, 1.0)
    H, W = img.shape
    p = jnp.pad(img, ((2, 2), (0, 0)), mode="reflect")
    v = sum(ki * jax.lax.slice_in_dim(p, i, i + H, 2, 0)
            for i, ki in enumerate(k)) / 16.0
    p = jnp.pad(v, ((0, 0), (2, 2)), mode="reflect")
    return sum(ki * jax.lax.slice_in_dim(p, i, i + W, 2, 1)
               for i, ki in enumerate(k)) / 16.0


def build_pyramid(img, levels: int = 3, pad: int = 0):
    """List of ``levels`` images, level 0 = full resolution.

    pad > 0 edge-pads every level by that amount (for
    lk_track_pyr(prepad=True), use pad=lk_pad(win, margin)); downsampling
    always operates on the unpadded content."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(_pyrdown(pyr[-1]))
    if pad:
        pyr = [jnp.pad(l, pad, mode="edge") for l in pyr]
    return pyr


def bilinear_sample(img, xy):
    """Bilinear sample img [H, W] at xy [..., 2] (x, y), edge-clamped.

    Gather-based — fine for occasional host-side use (color sampling);
    the LK loop itself uses the patch/matmul path below.
    """
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.000001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.000001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = x - x0.astype(x.dtype)
    fy = y - y0.astype(y.dtype)
    flat = img.reshape(-1)
    v00 = flat[y0 * W + x0]
    v01 = flat[y0 * W + x1]
    v10 = flat[y1 * W + x0]
    v11 = flat[y1 * W + x1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


def _extract_patches(img, corner_yx, P):
    """Per-track P x P patches at integer corners [T, 2] (y, x), clamped.

    Callers pre-pad the image so in-bounds tracks never hit the clamp (a
    clamped corner would silently shift the window's patch coordinates).

    Formulation: row strips by advanced indexing (one XLA gather over
    whole rows — lane-aligned copies) + a one-hot column-selection einsum
    that XLA fuses with the iota compare. The per-track
    vmapped-dynamic-slice form lowered to a serial slice loop: measured
    5.4 ms vs 3.5 ms for 3072 tracks on a v5e (and the gap grows with
    track count); this one is also exact (one-hot matmul in HIGHEST).
    """
    H, W = img.shape
    cy = jnp.clip(corner_yx[:, 0], 0, H - P)
    cx = jnp.clip(corner_yx[:, 1], 0, W - P)
    strips = img[cy[:, None] + jnp.arange(P)[None, :], :]   # [T, P, W]
    cols = cx[:, None, None] + jnp.arange(P)[None, None, :]  # [T, 1, P]
    sel = (jnp.arange(W)[None, :, None] == cols).astype(img.dtype)
    patch = jnp.einsum("tpw,twq->tpq", strips, sel, precision=_HP)
    return patch, cy, cx


def _pad_tiles(img):
    """Edge-pad an image to the f32 tile grid (8 rows / 128 lanes, >=256
    cols) so DMA strip copies stay in bounds (ops/extract_pallas.py)."""
    H, W = img.shape
    Hp = -(-H // 8) * 8
    Wp = max(-(-W // 128) * 128, 256)
    if (Hp, Wp) != (H, W):
        img = jnp.pad(img, ((0, Hp - H), (0, Wp - W)), mode="edge")
    return img


def _interp_weights(pos, win, P):
    """Banded linear-interpolation matrix rows.

    pos [T]: fractional start position of the window in patch coordinates.
    Returns [T, win, P] with W[t, i, j] = tri(pos_t + i - j).
    """
    i = jnp.arange(win, dtype=pos.dtype)[None, :, None]
    j = jnp.arange(P, dtype=pos.dtype)[None, None, :]
    u = pos[:, None, None] + i - j
    return jnp.maximum(0.0, 1.0 - jnp.abs(u))


def _window(patch, ay, ax, win, prec=_HP):
    """Sample a win x win window at fractional offset (ay, ax) [T] from
    patches [T, Py, Px] via two banded matmuls (MXU).  Patches may be
    rectangular (the DMA extractor returns extra rows below the window;
    their interpolation weights are exactly zero).

    (Measured: explicitly storing the loop-invariant patch as bf16 to
    halve the einsum's HBM read is a small net LOSS at A=8 atlas sizes —
    the cast pass costs more than the saved operand traffic, since the
    DEFAULT-precision MXU already streams f32 operands as bf16.)"""
    Py, Px = patch.shape[-2], patch.shape[-1]
    Wy = _interp_weights(ay, win, Py)  # [T, win, Py]
    Wx = _interp_weights(ax, win, Px)
    tmp = jnp.einsum("tip,tpq->tiq", Wy, patch, precision=prec)
    return jnp.einsum("tiq,tjq->tij", tmp, Wx, precision=prec)


def _window_multi(patches, ay, ax, win, prec=_HP):
    """Sample the same win x win window from C patches per track at once.

    patches [T, C, Py, Px] -> [T, C, win, win]; one einsum pair regardless
    of C (the per-call op-count is what bounds LK latency on TPU, not
    FLOPs).
    """
    Py, Px = patches.shape[-2], patches.shape[-1]
    Wy = _interp_weights(ay, win, Py)  # [T, win, Py]
    Wx = _interp_weights(ax, win, Px)
    tmp = jnp.einsum("tip,tcpq->tciq", Wy, patches, precision=prec)
    return jnp.einsum("tciq,tjq->tcij", tmp, Wx, precision=prec)


@partial(jax.jit, static_argnames=("win", "levels", "iters", "margin",
                                   "eps", "impl", "interpret", "precision",
                                   "store_dtype"))
def lk_track(prev_img, next_img, pts, pts_valid=None, win: int = 21,
             levels: int = 3, iters: int = 30, eps: float = 0.01,
             min_eig_threshold: float = 1e-4, margin: int = 7,
             impl: str = "auto", interpret: bool = False,
             precision: str = "default", store_dtype=None):
    """Track pts [N, 2] from prev_img to next_img.

    Returns (new_pts [N, 2], status [N] bool, err [N] f32). ``err`` is the
    mean absolute intensity difference over the window (cv2 flags=0).

    impl: "xla" (banded-matmul window sampling) or "pallas" (the fused
    in-VMEM Newton-loop kernel, ops/lk_pallas.py; ``interpret`` runs it in
    interpreter mode for CPU testing).
    """
    return lk_track_pyr(tuple(build_pyramid(prev_img, levels)),
                        tuple(build_pyramid(next_img, levels)),
                        pts, pts_valid, win=win, iters=iters, eps=eps,
                        min_eig_threshold=min_eig_threshold, margin=margin,
                        impl=impl, interpret=interpret, precision=precision,
                        store_dtype=store_dtype)


def lk_track_pyr(prev_pyr, next_pyr, pts, pts_valid=None, win: int = 21,
                 iters: int = 30, eps: float = 0.01,
                 min_eig_threshold: float = 1e-4, margin: int = 7,
                 impl: str = "auto", interpret: bool = False,
                 prepad: bool = False, atlas_agents=None,
                 atlas_tiles: int = 1, dma_extract=None,
                 precision: str = "default", store_dtype=None,
                 atlas_contiguous: bool = False):
    """lk_track over prebuilt pyramids (tuples of [H,W] images, level 0 =
    full resolution). Lets sequential trackers reuse the previous frame's
    pyramid: one ``build_pyramid`` per frame instead of two.

    ``prepad=True`` declares that every level is already edge-padded by
    ``lk_pad(win, margin)`` (see build_pyramid(pad=...)) — skips all in-call
    padding; coordinates are still unpadded-image coordinates.

    Latency shape: template work (patch windows, gradients, min-eig gate) is
    independent of the flow estimate, so it runs ONCE batched over
    levels x tracks; only the tiny Newton loops stay sequential per level.

    Atlas mode (multi-agent): pass per-level images vertically stacked from
    ``atlas_tiles`` equally-sized pre-padded tiles (one agent each) and
    ``atlas_agents`` [T] int32 giving each track's tile. Tracks keep their
    own tile coordinates. This turns A per-agent LK calls into ONE call on
    a shared image — a vmapped-per-agent LK lowers the per-track
    dynamic_slice to a serial gather and scales ~linearly in A, the atlas
    path amortizes it. Requires prepad=True.
    """
    levels = len(prev_pyr)
    if pts_valid is None:
        pts_valid = jnp.ones(pts.shape[:-1], dtype=bool)
    # Window-einsum precision.  "default" (bf16 on the TPU MXU) saves the
    # 6x f32 pass decomposition on the dominant Newton-loop matmuls;
    # measured flow deviation vs "highest" is <= 0.07 px (mean 0.008 px) on
    # rendered imagery — noise next to the tracker's 2 px RANSAC gates and
    # 12-intensity error gate.  Parity/golden comparisons can pass
    # "highest".  (CPU backends ignore precision: always exact f32 there.)
    _prec = {"default": jax.lax.Precision.DEFAULT,
             "high": jax.lax.Precision.HIGH,
             "highest": jax.lax.Precision.HIGHEST}[precision]

    r = win // 2
    P = win + 2 * margin + 1  # patch side; +1 for the interpolation tap
    # the template (J) window never moves — it is sampled exactly at the
    # track position — so J patches only need a 1-px margin (interpolation
    # tap + central-difference border), not the Newton search margin:
    # 24 vs 36 rows per patch at the default win, ~1.5x less extraction
    margin_j = 1
    PJ = win + 2 * margin_j + 1
    dt = pts.dtype
    T = pts.shape[0]
    pad = r + margin + 1  # corners never clamp for in-image points

    if prepad:
        Js, Is = prev_pyr, next_pyr
        shapes = [(j.shape[0] // atlas_tiles - 2 * pad, j.shape[1] - 2 * pad)
                  for j in Js]
    else:
        assert atlas_tiles == 1, "atlas mode requires prepadded pyramids"
        Js = [jnp.pad(l, pad, mode="edge") for l in prev_pyr]
        Is = [jnp.pad(l, pad, mode="edge") for l in next_pyr]
        shapes = [l.shape for l in prev_pyr]

    if atlas_agents is None:
        row_offs = [jnp.zeros((), jnp.int32)] * levels
    else:
        row_offs = [atlas_agents.astype(jnp.int32)
                    * (Js[lvl].shape[0] // atlas_tiles)
                    for lvl in range(levels)]

    # ---- extraction backend ----
    # The DMA path (ops/extract_pallas.py) replaces the strips+one-hot
    # gather with per-track aligned HBM->VMEM copies — the dominant cost of
    # this call at atlas track counts.  Levels are edge-padded to the f32
    # tile (8 rows / 128 lanes) so its clamp bounds match this path's
    # exactly; only the bottom tile of an atlas gains rows, so per-tile row
    # offsets are unaffected.
    if impl == "auto":
        # Pallas kernels wherever they pay (fused measured 1.4x faster
        # than the banded-matmul XLA path at T=384, 2x at T=3072; tiled
        # another ~1.5x over fused at atlas scale; roughly tied at T=128
        # where the XLA batch is still latency-bound).  Callers that pin
        # precision (golden/parity comparisons) or explicitly disable the
        # DMA extractor must get the XLA path.  The tiled kernel needs
        # f32 VMEM-resident per-agent tile pairs (ops/lk_tile_pallas) and
        # agent-contiguous tracks; the strip-DMA fused kernel is the
        # fallback for big images / scattered agent ids.
        use_pallas = (jax.default_backend() == "tpu"
                      and not interpret and dt == jnp.float32
                      and precision == "default"
                      and dma_extract is not False
                      and T >= 192
                      and min(j.shape[0] for j in Js) > 40)
        impl = "xla"
        if use_pallas:
            from mqslam_tpu.ops import lk_tile_pallas as _tp
            A_t = atlas_tiles if atlas_contiguous else (
                1 if atlas_agents is None else 0)
            if (A_t > 0 and T % A_t == 0
                    and _tp.tile_vmem_bytes(Js[0].shape[0] // A_t * A_t,
                                            Js[0].shape[1], A_t) <= 9 << 20):
                impl = "tiled"
            else:
                impl = "fused"

    if impl == "tiled":
        from mqslam_tpu.ops import lk_tile_pallas as _tp
        A_t = atlas_tiles if atlas_agents is not None else 1
        p_ls = []
        inside_all = jnp.ones(T, bool)
        for lvl in range(levels):
            H, W = shapes[lvl]
            p_l = pts / (2.0 ** lvl) + pad
            inside_all = inside_all & jnp.all(
                (p_l >= pad) & (p_l <= jnp.array([W - 1 + pad, H - 1 + pad],
                                                 dtype=dt)), axis=-1)
            p_ls.append(p_l)
        return _lk_tiled_levels(
            Js, Is, p_ls, pts, pts_valid & inside_all, shapes, win, iters,
            eps, min_eig_threshold, margin,
            interpret or jax.default_backend() != "tpu", A_t)

    if impl == "fused":
        # fully fused DMA-extraction + Newton kernel: needs only the track
        # positions and the raw level images (the driver builds the
        # shifted strip copies).  store_dtype="auto" stores them bf16 on
        # the real TPU backend — exact for 8-bit imagery at level 0,
        # <= 0.4-intensity rounding on downsampled levels, and half the
        # kernel's HBM traffic; tests pin "float32" for exact parity.
        if store_dtype in (None, "auto"):
            store_dtype = ("bfloat16" if (jax.default_backend() == "tpu"
                                          and not interpret)
                           else "float32")
        p_ls = []
        inside_all = jnp.ones(T, bool)
        for lvl in range(levels):
            H, W = shapes[lvl]
            p_l = pts / (2.0 ** lvl) + pad
            inside_all = inside_all & jnp.all(
                (p_l >= pad) & (p_l <= jnp.array([W - 1 + pad, H - 1 + pad],
                                                 dtype=dt)), axis=-1)
            p_ls.append(p_l)
        return _lk_fused_levels(
            Js, Is, p_ls, pts, pts_valid & inside_all, shapes, win, iters,
            eps, min_eig_threshold, margin,
            interpret or jax.default_backend() != "tpu", row_offs,
            jnp.dtype(store_dtype))

    if dma_extract is None:
        dma_extract = (jax.default_backend() == "tpu" and impl == "xla"
                       and not interpret and dt == jnp.float32)
    assert not (dma_extract and impl == "pallas"), \
        "the fused-Newton pallas kernel expects square XLA-extracted patches"
    if dma_extract:
        from mqslam_tpu.ops import extract_pallas as _ep

        Js = [_pad_tiles(l) for l in Js]
        Is = [_pad_tiles(l) for l in Is]
        _interp = interpret or jax.default_backend() != "tpu"

    def extract(img_l, anchor, off, m, Pside):
        """Patch at floor(anchor)-r-m in tile coords; ``off`` moves the
        row into the atlas.  Returns (patch, row_base, cx, row_log) in tile
        coords: ``row_base`` is the patch's first stored row (what window
        anchors are measured against), ``row_log`` the clamped logical
        corner (what drift clips are measured against).  They coincide on
        the XLA path; the DMA path stores from the 8-aligned row below."""
        corner = jnp.stack([
            jnp.floor(anchor[:, 1]).astype(jnp.int32) - r - m + off,
            jnp.floor(anchor[:, 0]).astype(jnp.int32) - r - m], axis=1)
        if dma_extract:
            patch, y0, cx = _ep.extract_patches_dma(img_l, corner, Pside,
                                                    interpret=_interp)
            cy_log = jnp.clip(corner[:, 0], 0, img_l.shape[0] - Pside)
            return patch, y0 - off, cx, cy_log - off
        patch, cy, cx = _extract_patches(img_l, corner, Pside)
        return patch, cy - off, cx, cy - off

    # ---- template setup, batched over levels (flow-independent) ----
    p_ls, pJs, ayJs, axJs = [], [], [], []
    inside_all = jnp.ones(T, bool)
    for lvl in range(levels):
        H, W = shapes[lvl]
        p_l = pts / (2.0 ** lvl) + pad  # padded coordinates
        pJ, cyJ, cxJ, _ = extract(Js[lvl], p_l, row_offs[lvl], margin_j, PJ)
        ayJs.append(p_l[:, 1] - r - cyJ.astype(dt))
        axJs.append(p_l[:, 0] - r - cxJ.astype(dt))
        inside_all = inside_all & jnp.all(
            (p_l >= pad) & (p_l <= jnp.array([W - 1 + pad, H - 1 + pad],
                                             dtype=dt)), axis=-1)
        p_ls.append(p_l)
        pJs.append(pJ)
    status = pts_valid & inside_all

    if impl == "pallas":
        return _lk_pallas_levels(Is, p_ls, pJs, ayJs, axJs, pts, status,
                                 shapes, win, iters, eps, min_eig_threshold,
                                 margin, interpret, row_offs)

    pJ_flat = jnp.stack(pJs).reshape((levels * T,) + pJs[0].shape[-2:])
    dxP = jnp.pad(0.5 * (pJ_flat[:, :, 2:] - pJ_flat[:, :, :-2]),
                  ((0, 0), (0, 0), (1, 1)))
    dyP = jnp.pad(0.5 * (pJ_flat[:, 2:, :] - pJ_flat[:, :-2, :]),
                  ((0, 0), (1, 1), (0, 0)))
    # template + gradient windows for ALL levels in ONE einsum pair
    # (latency, not FLOPs, bounds this path)
    wins3 = _window_multi(jnp.stack([pJ_flat, dxP, dyP], axis=1),
                          jnp.concatenate(ayJs), jnp.concatenate(axJs), win,
                          prec=_prec)
    wins3 = wins3.reshape(levels, T, 3, win, win)
    Jw_l, dx_l, dy_l = wins3[:, :, 0], wins3[:, :, 1], wins3[:, :, 2]
    g00_l = jnp.sum(dx_l * dx_l, axis=(2, 3))  # [L, T]
    g01_l = jnp.sum(dx_l * dy_l, axis=(2, 3))
    g11_l = jnp.sum(dy_l * dy_l, axis=(2, 3))
    tr = 0.5 * (g00_l + g11_l)
    min_eig = (tr - jnp.sqrt(jnp.maximum(
        0.25 * (g00_l - g11_l) ** 2 + g01_l * g01_l, 0.0))) / (win * win)
    status = status & jnp.all(min_eig >= min_eig_threshold, axis=0)

    # ---- coarse-to-fine Newton loops (sequential by construction) ----
    # Tail compaction: a handful of slow tracks would otherwise keep the
    # whole-T while_loop iterating (each iteration costs O(T) einsums).
    # Phase 1 runs a short head for everyone (while_loop: on typical
    # inter-frame motion most tracks converge in 2-4 iterations, and the
    # all-done early exit is worth ~3% aggregate fps at A=8 over a fixed
    # fori head); phase 2 gathers the unconverged tracks into a small
    # compact problem and finishes them.
    head_iters = min(iters, 8)
    tail_cap = 256

    def newton(qi, done, pI_, baseI_, Jw_, dx_, dy_, g00_, g01_, g11_,
               lo_, hi_, n_iters):
        def body(carry):
            q, done, it = carry
            a = q - r - baseI_  # window start in patch coords (x, y)
            Iw = _window(pI_, a[:, 1], a[:, 0], win, _prec)
            diff = Jw_ - Iw
            b0 = jnp.sum(diff * dx_, axis=(1, 2))
            b1 = jnp.sum(diff * dy_, axis=(1, 2))
            s0, s1 = linalg.solve2x2_sym(g00_, g01_, g11_, b0, b1)
            step = jnp.stack([s0, s1], axis=-1)
            step = jnp.where(done[:, None], 0.0, step)
            # keep the window inside the patch (residual motion beyond the
            # margin is recovered by the next pyramid level / next frame)
            q2 = jnp.clip(q + step, lo_, hi_)
            done = done | (jnp.sum(step * step, axis=-1) < eps * eps)
            return q2, done, it + 1

        def cond(carry):
            _, done, it = carry
            return (it < n_iters) & ~jnp.all(done)
        return jax.lax.while_loop(cond, body, (qi, done, jnp.int32(0)))

    g = jnp.zeros_like(pts)  # flow estimate at current level scale
    for lvl in range(levels - 1, -1, -1):
        p_l = p_ls[lvl]
        Jw, dx, dy = Jw_l[lvl], dx_l[lvl], dy_l[lvl]
        g00, g01, g11 = g00_l[lvl], g01_l[lvl], g11_l[lvl]

        q0 = p_l + g  # level-start estimate of the tracked position
        pI, rowI, cxI, rowIlog = extract(Is[lvl], q0, row_offs[lvl],
                                         margin, P)
        # sampling base: where the stored patch rows start; logical base:
        # the clamped corner the drift clips are measured against (they
        # differ only on the DMA-extraction path)
        baseI = jnp.stack([cxI.astype(dt), rowI.astype(dt)], axis=1)
        baseLog = jnp.stack([cxI.astype(dt), rowIlog.astype(dt)], axis=1)
        lo = baseLog + r
        hi = baseLog + P - 2 - r
        q_init0 = jnp.clip(q0, lo, hi)
        done0 = jnp.logical_not(status)

        if T < 4 * tail_cap or iters <= head_iters:
            q, _, _ = newton(q_init0, done0, pI, baseI, Jw, dx, dy,
                             g00, g01, g11, lo, hi, iters)
        else:
            q, done, _ = newton(q_init0, done0, pI, baseI, Jw, dx, dy,
                                g00, g01, g11, lo, hi, head_iters)
            # finish the unconverged tail compactly (if more than tail_cap
            # are unconverged the extras keep their head-phase flow; the
            # per-frame error gate downstream rejects any stragglers)
            sel = jax.lax.top_k((~done).astype(jnp.float32),
                                tail_cap)[1]
            live = ~done[sel]
            qc, dc, _ = newton(q[sel], ~live, pI[sel], baseI[sel], Jw[sel],
                               dx[sel], dy[sel], g00[sel], g01[sel],
                               g11[sel], lo[sel], hi[sel],
                               iters - head_iters)
            q = q.at[sel].set(jnp.where(live[:, None], qc, q[sel]))
        g_new = q - p_l  # pad offset cancels (both in padded coords)
        g = g_new * 2.0 if lvl > 0 else g_new

    new_pts = pts + g
    H0, W0 = shapes[0]
    inside_final = jnp.all(
        (new_pts >= 0) & (new_pts <= jnp.array([W0 - 1, H0 - 1],
                                               dtype=pts.dtype)), axis=-1)

    # final error at level 0: reuse the level-0 template window (Jw IS the
    # J-window at pts) and the already-extracted I patch — the loop's clip
    # keeps the converged q inside pI, so one banded window suffices (the
    # re-extraction path cost 2 full-image pads + 2 patch gathers).
    a_fin = q - r - baseI
    Iw0 = _window(pI, a_fin[:, 1], a_fin[:, 0], win, _prec)
    err = jnp.mean(jnp.abs(Jw - Iw0), axis=(1, 2))
    status = jnp.logical_and(status, inside_final)
    return new_pts, status, jnp.where(status, err, jnp.inf)


def _lk_fused_levels(Js, Is, p_ls, pts, status, shapes, win, iters, eps,
                     min_eig_threshold, margin, interpret, row_offs,
                     store_dtype):
    """Per-level driver for the fused DMA+Newton kernel
    (ops/lk_fused_pallas.py).  Host side builds each level's shifted
    copies (``strip_copies`` — two 64-column-shifted stacked copies in
    ``store_dtype``; bf16 halves the kernel's DMA traffic) and computes
    strip corners + window anchors; extraction, template setup, and the
    Newton loop all run inside the kernel.  Clip semantics match
    ``_lk_pallas_levels`` (window start capped at P - 2 - win, one px
    tighter than the XLA path's point cap — differences only at the
    patch-drift boundary)."""
    from mqslam_tpu.ops import lk_fused_pallas as _fp

    levels = len(Is)
    r = win // 2
    P = win + 2 * margin + 1
    hiX = float(P - 2 - win)
    dt = pts.dtype
    f32 = jnp.float32
    g = jnp.zeros_like(pts)
    err = None
    for lvl in range(levels - 1, -1, -1):
        copJ = _fp.strip_copies(Js[lvl], store_dtype)
        copI = _fp.strip_copies(Is[lvl], store_dtype)
        Hp, Wp = copJ.shape[0] // 2, copJ.shape[1]
        off = row_offs[lvl]
        p_l = p_ls[lvl]
        pya = p_l[:, 1] + off
        pxa = p_l[:, 0]
        # template strip: 1-px margin (interpolation tap + gradient taps);
        # window reads TMPL_CAP rows x (win + 3) columns from its corner
        yJ, xJ, cyJ, cxJ, ryJ, rxJ = _fp.strip_corners(
            jnp.floor(pya).astype(jnp.int32) - r - 1,
            jnp.floor(pxa).astype(jnp.int32) - r - 1, Hp, Wp,
            _fp.TMPL_ROWS, _fp.TMPL_CAP, win + 3)
        aJy = jnp.clip(pya.astype(f32) - r - cyJ + ryJ, 1.0,
                       _fp.TMPL_ROWS - win - 2.0)
        aJx = jnp.clip(pxa.astype(f32) - r - cxJ + rxJ, 1.0, 100.0)
        # search strip at the level-start flow estimate
        q0 = p_l + g
        q0ya = q0[:, 1] + off
        q0xa = q0[:, 0]
        yI, xI, cyI, cxI, ryI, rxI = _fp.strip_corners(
            jnp.floor(q0ya).astype(jnp.int32) - r - margin,
            jnp.floor(q0xa).astype(jnp.int32) - r - margin, Hp, Wp,
            _fp.SEARCH_ROWS, P, P)
        loY = ryI.astype(f32)
        loX = rxI.astype(f32)
        a0y = jnp.clip(q0ya.astype(f32) - r - cyI + ryI, loY, loY + hiX)
        a0x = jnp.clip(q0xa.astype(f32) - r - cxI + rxI, loX, loX + hiX)
        a_fin, eig, err_l = _fp.lk_level_fused(
            copJ, copI,
            jnp.stack([yJ, xJ], axis=1), jnp.stack([yI, xI], axis=1),
            jnp.stack([aJy, aJx], axis=1), jnp.stack([a0y, a0x], axis=1),
            jnp.stack([loY, loX], axis=1),
            status, win, iters, eps, hiX, interpret=interpret)
        status = status & (eig >= min_eig_threshold)
        # strip coords -> tile coords: corner + (anchor - residual) + r
        q = jnp.stack([(cxI - rxI + r).astype(dt) + a_fin[:, 1],
                       (cyI - ryI + r).astype(dt) + a_fin[:, 0] - off],
                      axis=1)
        g_new = q - p_l
        g = g_new * 2.0 if lvl > 0 else g_new
        if lvl == 0:
            err = err_l

    new_pts = pts + g
    H0, W0 = shapes[0]
    inside_final = jnp.all(
        (new_pts >= 0) & (new_pts <= jnp.array([W0 - 1, H0 - 1],
                                               dtype=pts.dtype)), axis=-1)
    status = status & inside_final
    return new_pts, status, jnp.where(status, err, jnp.inf)


def _lk_tiled_levels(Js, Is, p_ls, pts, status, shapes, win, iters, eps,
                     min_eig_threshold, margin, interpret, A):
    """Per-level driver for the VMEM-resident tiled kernel
    (ops/lk_tile_pallas.py).  Tracks must be agent-contiguous (track t
    belongs to tile t // (T/A)); all coordinates stay LOCAL to the
    agent's tile — with no DMA alignment constraints there are no
    residual terms, so anchors are simply position - corner and clips
    run [0, hiX] on both axes."""
    from mqslam_tpu.ops import lk_tile_pallas as _tp

    levels = len(Is)
    r = win // 2
    P = win + 2 * margin + 1
    hiX = float(P - 2 - win)
    dt = pts.dtype
    f32 = jnp.float32
    g = jnp.zeros_like(pts)
    err = None
    for lvl in range(levels - 1, -1, -1):
        tileJ, Ht = _tp.tile_layout(Js[lvl], A)
        tileI, _ = _tp.tile_layout(Is[lvl], A)
        Wcl = tileJ.shape[0] * 128 - 128  # data width (guard tile excl.)
        p_l = p_ls[lvl]
        pya = p_l[:, 1]
        pxa = p_l[:, 0]
        cyJ = jnp.clip(jnp.floor(pya).astype(jnp.int32) - r - 1, 0,
                       Ht - _tp.TMPL_ROWS_T)
        cxJ = jnp.clip(jnp.floor(pxa).astype(jnp.int32) - r - 1, 0,
                       Wcl - (win + 3))
        aJy = jnp.clip(pya.astype(f32) - r - cyJ, 1.0,
                       _tp.TMPL_ROWS_T - win - 2.0)
        aJx = jnp.clip(pxa.astype(f32) - r - cxJ, 1.0, 100.0)
        q0 = p_l + g
        q0ya = q0[:, 1]
        q0xa = q0[:, 0]
        cyI = jnp.clip(jnp.floor(q0ya).astype(jnp.int32) - r - margin, 0,
                       Ht - _tp.SEARCH_ROWS_T)
        cxI = jnp.clip(jnp.floor(q0xa).astype(jnp.int32) - r - margin, 0,
                       Wcl - P)
        a0y = jnp.clip(q0ya.astype(f32) - r - cyI, 0.0, hiX)
        a0x = jnp.clip(q0xa.astype(f32) - r - cxI, 0.0, hiX)
        a_fin, eig, err_l = _tp.lk_level_tiled(
            tileJ, tileI,
            jnp.stack([cxJ // 128, cyJ, cxJ % 128], axis=1),
            jnp.stack([cxI // 128, cyI, cxI % 128], axis=1),
            jnp.stack([aJy, aJx], axis=1), jnp.stack([a0y, a0x], axis=1),
            status, A, win, iters, eps, hiX, interpret=interpret,
            want_err=(lvl == 0))
        status = status & (eig >= min_eig_threshold)
        q = jnp.stack([(cxI + r).astype(dt) + a_fin[:, 1],
                       (cyI + r).astype(dt) + a_fin[:, 0]], axis=1)
        g_new = q - p_l
        g = g_new * 2.0 if lvl > 0 else g_new
        if lvl == 0:
            err = err_l

    new_pts = pts + g
    H0, W0 = shapes[0]
    inside_final = jnp.all(
        (new_pts >= 0) & (new_pts <= jnp.array([W0 - 1, H0 - 1],
                                               dtype=pts.dtype)), axis=-1)
    status = status & inside_final
    return new_pts, status, jnp.where(status, err, jnp.inf)


def _lk_pallas_levels(Is, p_ls, pJs, ayJs, axJs, pts, status, shapes,
                      win, iters, eps, min_eig_threshold, margin, interpret,
                      row_offs=None):
    """Per-level driver for the fused Pallas Newton kernel.

    ``row_offs`` (per-level [T] int32 or scalar 0) moves each track's patch
    row into its agent's atlas tile, matching the XLA path's ``extract``
    semantics — corners are returned in tile coordinates."""
    from mqslam_tpu.ops.lk_pallas import lk_iterate_pallas

    levels = len(Is)
    r = win // 2
    P = win + 2 * margin + 1
    dt = pts.dtype
    g = jnp.zeros_like(pts)
    pallas_err = None
    if row_offs is None:
        row_offs = [jnp.zeros((), jnp.int32)] * levels
    for lvl in range(levels - 1, -1, -1):
        p_l = p_ls[lvl]
        q0 = p_l + g
        off = row_offs[lvl]
        cornerI = jnp.stack([
            jnp.floor(q0[:, 1]).astype(jnp.int32) - r - margin + off,
            jnp.floor(q0[:, 0]).astype(jnp.int32) - r - margin], axis=1)
        pI, cyI, cxI = _extract_patches(Is[lvl], cornerI, P)
        cyI = cyI - off  # back to tile coordinates
        baseI = jnp.stack([cxI.astype(dt), cyI.astype(dt)], axis=1)
        q_init0 = jnp.clip(q0, baseI + r, baseI + P - 2 - r)
        aJ2 = jnp.stack([ayJs[lvl], axJs[lvl]], axis=1)
        a0 = jnp.stack([q_init0[:, 1] - r - baseI[:, 1],
                        q_init0[:, 0] - r - baseI[:, 0]], axis=1)
        a_fin, eig, err_win = lk_iterate_pallas(
            pJs[lvl], pI, aJ2, a0, win=win, iters=iters, eps=eps,
            interpret=interpret)
        status = status & (eig >= min_eig_threshold)
        q = jnp.stack([baseI[:, 0] + r + a_fin[:, 1],
                       baseI[:, 1] + r + a_fin[:, 0]], axis=1)
        g_new = q - p_l
        g = g_new * 2.0 if lvl > 0 else g_new
        if lvl == 0:
            pallas_err = err_win

    new_pts = pts + g
    H0, W0 = shapes[0]
    inside_final = jnp.all(
        (new_pts >= 0) & (new_pts <= jnp.array([W0 - 1, H0 - 1],
                                               dtype=pts.dtype)), axis=-1)
    status = status & inside_final
    return new_pts, status, jnp.where(status, pallas_err, jnp.inf)
