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

__all__ = ["build_pyramid", "lk_track", "lk_track_pyr", "bilinear_sample"]

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


def build_pyramid(img, levels: int = 3):
    """List of ``levels`` images, level 0 = full resolution."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(_pyrdown(pyr[-1]))
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
    clamped corner would silently shift the window's patch coordinates)."""
    H, W = img.shape
    cy = jnp.clip(corner_yx[:, 0], 0, H - P)
    cx = jnp.clip(corner_yx[:, 1], 0, W - P)

    def one(cy1, cx1):
        return jax.lax.dynamic_slice(img, (cy1, cx1), (P, P))

    return jax.vmap(one)(cy, cx), cy, cx


def _interp_weights(pos, win, P):
    """Banded linear-interpolation matrix rows.

    pos [T]: fractional start position of the window in patch coordinates.
    Returns [T, win, P] with W[t, i, j] = tri(pos_t + i - j).
    """
    i = jnp.arange(win, dtype=pos.dtype)[None, :, None]
    j = jnp.arange(P, dtype=pos.dtype)[None, None, :]
    u = pos[:, None, None] + i - j
    return jnp.maximum(0.0, 1.0 - jnp.abs(u))


def _window(patch, ay, ax, win):
    """Sample a win x win window at fractional offset (ay, ax) [T] from
    patches [T, P, P] via two banded matmuls (MXU, f32)."""
    P = patch.shape[-1]
    Wy = _interp_weights(ay, win, P)  # [T, win, P]
    Wx = _interp_weights(ax, win, P)
    tmp = jnp.einsum("tip,tpq->tiq", Wy, patch, precision=_HP)
    return jnp.einsum("tiq,tjq->tij", tmp, Wx, precision=_HP)


@partial(jax.jit, static_argnames=("win", "levels", "iters", "margin",
                                   "eps", "impl", "interpret"))
def lk_track(prev_img, next_img, pts, pts_valid=None, win: int = 21,
             levels: int = 3, iters: int = 30, eps: float = 0.01,
             min_eig_threshold: float = 1e-4, margin: int = 7,
             impl: str = "xla", interpret: bool = False):
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
                        impl=impl, interpret=interpret)


def lk_track_pyr(prev_pyr, next_pyr, pts, pts_valid=None, win: int = 21,
                 iters: int = 30, eps: float = 0.01,
                 min_eig_threshold: float = 1e-4, margin: int = 7,
                 impl: str = "xla", interpret: bool = False):
    """lk_track over prebuilt pyramids (tuples of [H,W] images, level 0 =
    full resolution). Lets sequential trackers reuse the previous frame's
    pyramid: one ``build_pyramid`` per frame instead of two."""
    levels = len(prev_pyr)
    if pts_valid is None:
        pts_valid = jnp.ones(pts.shape[:-1], dtype=bool)

    r = win // 2
    P = win + 2 * margin + 1  # patch side; +1 for the interpolation tap
    dt = pts.dtype

    g = jnp.zeros_like(pts)  # flow estimate at current level scale
    status = pts_valid

    pad = r + margin + 1  # corners never clamp for in-image points
    for lvl in range(levels - 1, -1, -1):
        H, W = prev_pyr[lvl].shape
        J = jnp.pad(prev_pyr[lvl], pad, mode="edge")
        I = jnp.pad(next_pyr[lvl], pad, mode="edge")
        p_l = pts / (2.0 ** lvl) + pad  # padded coordinates

        # ---- template patch (prev image), anchored at floor(p_l) ----
        cornerJ = jnp.stack([
            jnp.floor(p_l[:, 1]).astype(jnp.int32) - r - margin,
            jnp.floor(p_l[:, 0]).astype(jnp.int32) - r - margin], axis=1)
        pJ, cyJ, cxJ = _extract_patches(J, cornerJ, P)
        # window start in patch coords (accounts for clamping at borders)
        ayJ = p_l[:, 1] - r - cyJ.astype(dt)
        axJ = p_l[:, 0] - r - cxJ.astype(dt)

        inside = jnp.all(
            (p_l >= pad) & (p_l <= jnp.array([W - 1 + pad, H - 1 + pad],
                                             dtype=dt)), axis=-1)
        q0 = p_l + g  # level-start estimate of the tracked position
        cornerI = jnp.stack([
            jnp.floor(q0[:, 1]).astype(jnp.int32) - r - margin,
            jnp.floor(q0[:, 0]).astype(jnp.int32) - r - margin], axis=1)
        pI, cyI, cxI = _extract_patches(I, cornerI, P)
        baseI = jnp.stack([cxI.astype(dt), cyI.astype(dt)], axis=1)
        q_init0 = jnp.clip(q0, baseI + r, baseI + P - 2 - r)

        if impl == "pallas":
            from mqslam_tpu.ops.lk_pallas import lk_iterate_pallas
            aJ2 = jnp.stack([ayJ, axJ], axis=1)
            a0 = jnp.stack([q_init0[:, 1] - r - baseI[:, 1],
                            q_init0[:, 0] - r - baseI[:, 0]], axis=1)
            a_fin, eig, err_win = lk_iterate_pallas(
                pJ, pI, aJ2, a0, win=win, iters=iters, eps=eps,
                interpret=interpret)
            status = status & (eig >= min_eig_threshold) & inside
            q = jnp.stack([baseI[:, 0] + r + a_fin[:, 1],
                           baseI[:, 1] + r + a_fin[:, 0]], axis=1)
            g_new = q - p_l
            g = g_new * 2.0 if lvl > 0 else g_new
            if lvl == 0:
                pallas_err = err_win
            continue

        Jw = _window(pJ, ayJ, axJ, win)
        # gradients on the patch (central differences), then windowed
        dxP = jnp.pad(0.5 * (pJ[:, :, 2:] - pJ[:, :, :-2]),
                      ((0, 0), (0, 0), (1, 1)))
        dyP = jnp.pad(0.5 * (pJ[:, 2:, :] - pJ[:, :-2, :]),
                      ((0, 0), (1, 1), (0, 0)))
        dx = _window(dxP, ayJ, axJ, win)
        dy = _window(dyP, ayJ, axJ, win)

        g00 = jnp.sum(dx * dx, axis=(1, 2))
        g01 = jnp.sum(dx * dy, axis=(1, 2))
        g11 = jnp.sum(dy * dy, axis=(1, 2))
        tr = 0.5 * (g00 + g11)
        min_eig = (tr - jnp.sqrt(jnp.maximum(
            0.25 * (g00 - g11) ** 2 + g01 * g01, 0.0))) / (win * win)
        status = status & (min_eig >= min_eig_threshold) & inside

        def body(carry):
            q, done, it = carry
            a = q - r - baseI  # window start in patch coords (x, y)
            Iw = _window(pI, a[:, 1], a[:, 0], win)
            diff = Jw - Iw
            b0 = jnp.sum(diff * dx, axis=(1, 2))
            b1 = jnp.sum(diff * dy, axis=(1, 2))
            s0, s1 = linalg.solve2x2_sym(g00, g01, g11, b0, b1)
            step = jnp.stack([s0, s1], axis=-1)
            step = jnp.where(done[:, None], 0.0, step)
            q2 = q + step
            # keep the window inside the patch (residual motion beyond the
            # margin is recovered by the next pyramid level / next frame)
            q2 = jnp.clip(q2, baseI + r, baseI + P - 2 - r)
            done = done | (jnp.sum(step * step, axis=-1) < eps * eps)
            return q2, done, it + 1

        def cond(carry):
            _, done, it = carry
            # data-dependent early exit: typical sequences converge in 3-8
            # Newton iterations; running the fixed 30 was latency-bound
            return (it < iters) & ~jnp.all(done)

        done0 = jnp.logical_not(status)
        q, _, _ = jax.lax.while_loop(cond, body,
                                     (q_init0, done0, jnp.int32(0)))
        g_new = q - p_l  # pad offset cancels (both in padded coords)
        g = g_new * 2.0 if lvl > 0 else g_new

    new_pts = pts + g
    H0, W0 = prev_pyr[0].shape
    inside_final = jnp.all(
        (new_pts >= 0) & (new_pts <= jnp.array([W0 - 1, H0 - 1],
                                               dtype=pts.dtype)), axis=-1)
    if impl == "pallas":
        status = status & inside_final
        return new_pts, status, jnp.where(status, pallas_err, jnp.inf)

    # final error at level 0 using the same (padded) patch machinery
    J0 = jnp.pad(prev_pyr[0], pad, mode="edge")
    I0 = jnp.pad(next_pyr[0], pad, mode="edge")
    pts_p = pts + pad
    new_p = new_pts + pad
    cornerJ = jnp.stack([
        jnp.floor(pts_p[:, 1]).astype(jnp.int32) - r - margin,
        jnp.floor(pts_p[:, 0]).astype(jnp.int32) - r - margin], axis=1)
    pJ, cyJ, cxJ = _extract_patches(J0, cornerJ, P)
    Jw0 = _window(pJ, pts_p[:, 1] - r - cyJ.astype(dt),
                  pts_p[:, 0] - r - cxJ.astype(dt), win)
    cornerI = jnp.stack([
        jnp.floor(new_p[:, 1]).astype(jnp.int32) - r - margin,
        jnp.floor(new_p[:, 0]).astype(jnp.int32) - r - margin], axis=1)
    pI, cyI, cxI = _extract_patches(I0, cornerI, P)
    Iw0 = _window(pI, new_p[:, 1] - r - cyI.astype(dt),
                  new_p[:, 0] - r - cxI.astype(dt), win)
    err = jnp.mean(jnp.abs(Jw0 - Iw0), axis=(1, 2))
    status = jnp.logical_and(status, inside_final)
    return new_pts, status, jnp.where(status, err, jnp.inf)
