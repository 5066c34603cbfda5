"""Pyramidal Lucas-Kanade sparse optical flow.

Replaces ``cv2.calcOpticalFlowPyrLK`` with the defaults the reference's
front-end relies on (reference: Work/SLAM/application/own/slam2.py:381):
21x21 window, 3 pyramid levels (maxLevel=2), <=30 Newton iterations with
eps=0.01, min-eigenvalue rejection at 1e-4 (on 0..255 intensity scale), and
``err`` = mean absolute window intensity difference — the value slam2 gates
at max_OF_error=12 (slam2.py:382-385).

TPU shape: every track is a lane — window gathers are batched bilinear
samples (structure-of-arrays), the 2x2 normal systems solve in closed form,
and the level/iteration loops are fixed-trip-count with per-track convergence
freezing. Images are [H, W] float32 in 0..255.
"""

from functools import partial

import jax
import jax.numpy as jnp

from mqslam_tpu.ops import linalg

__all__ = ["build_pyramid", "lk_track", "bilinear_sample"]


def _pyrdown(img):
    """5x5 binomial blur + 2x decimation (cv2.pyrDown kernel)."""
    k = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=img.dtype) / 16.0
    img = jnp.pad(img, ((2, 2), (2, 2)), mode="reflect")
    img = jax.lax.conv_general_dilated(
        img[None, None], k[None, None, :, None], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)
    img = jax.lax.conv_general_dilated(
        img, k[None, None, None, :], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)
    return img[0, 0, ::2, ::2]


def build_pyramid(img, levels: int = 3):
    """List of ``levels`` images, level 0 = full resolution."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(_pyrdown(pyr[-1]))
    return pyr


def bilinear_sample(img, xy):
    """Bilinear sample img [H, W] at xy [..., 2] (x, y) with edge clamping.

    Returns values [...]. Coordinates are pixel-centered (0, 0) = top-left
    pixel center, matching OpenCV.
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


@partial(jax.jit, static_argnames=("win", "levels", "iters"))
def lk_track(prev_img, next_img, pts, pts_valid=None, win: int = 21,
             levels: int = 3, iters: int = 30, eps: float = 0.01,
             min_eig_threshold: float = 1e-4):
    """Track pts [N, 2] from prev_img to next_img.

    Returns (new_pts [N, 2], status [N] bool, err [N] f32). ``err`` is the
    mean absolute intensity difference over the window (cv2 flags=0).
    Invalid input tracks (pts_valid False) come back with status False.
    """
    if pts_valid is None:
        pts_valid = jnp.ones(pts.shape[:-1], dtype=bool)
    prev_pyr = build_pyramid(prev_img, levels)
    next_pyr = build_pyramid(next_img, levels)

    r = win // 2
    dt = pts.dtype
    offs = jnp.stack(jnp.meshgrid(
        jnp.arange(-r, r + 1, dtype=dt), jnp.arange(-r, r + 1, dtype=dt),
        indexing="xy"), axis=-1).reshape(-1, 2)  # [win*win, 2]

    g = jnp.zeros_like(pts)  # accumulated displacement at current level scale
    status = pts_valid

    for lvl in range(levels - 1, -1, -1):
        J = prev_pyr[lvl]
        I = next_pyr[lvl]
        H, W = J.shape
        scale = dt.type(2.0 ** lvl) if hasattr(dt, "type") else 2.0 ** lvl
        p_l = pts / (2.0 ** lvl)  # template position at this level

        # Window coords around the template point (fixed per level).
        wc = p_l[:, None, :] + offs[None, :, :]  # [N, K, 2]
        # Template values + Scharr derivatives (cv2's LK derivative filter).
        Jw = bilinear_sample(J, wc)
        dx = (bilinear_sample(J, wc + jnp.array([1.0, 0.0], dtype=dt))
              - bilinear_sample(J, wc + jnp.array([-1.0, 0.0], dtype=dt))) * 0.5
        dy = (bilinear_sample(J, wc + jnp.array([0.0, 1.0], dtype=dt))
              - bilinear_sample(J, wc + jnp.array([0.0, -1.0], dtype=dt))) * 0.5
        g00 = jnp.sum(dx * dx, axis=1)
        g01 = jnp.sum(dx * dy, axis=1)
        g11 = jnp.sum(dy * dy, axis=1)
        # min eigenvalue of G / window area — trackability test
        tr = 0.5 * (g00 + g11)
        min_eig = (tr - jnp.sqrt(jnp.maximum(
            0.25 * (g00 - g11) ** 2 + g01 * g01, 0.0))) / (win * win)
        # cv2 normalizes by 255-scale images; threshold assumes that scale.
        trackable = min_eig >= min_eig_threshold
        # Only the point center must stay inside at each level — the window
        # itself is edge-clamped, like OpenCV's border handling (requiring
        # the full window inside would kill everything within win/2 * 2^lvl
        # of the border).
        inside = jnp.all(
            (p_l >= 0) & (p_l <= jnp.array([W - 1, H - 1], dtype=dt)),
            axis=-1)
        status = jnp.logical_and(status, jnp.logical_and(trackable, inside))

        def body(_, carry):
            d, done = carry
            Iw = bilinear_sample(I, wc + d[:, None, :])
            diff = Jw - Iw
            b0 = jnp.sum(diff * dx, axis=1)
            b1 = jnp.sum(diff * dy, axis=1)
            s0, s1 = linalg.solve2x2_sym(g00, g01, g11, b0, b1)
            step = jnp.stack([s0, s1], axis=-1)
            step = jnp.where(done[:, None], 0.0, step)
            d = d + step
            done = jnp.logical_or(done,
                                  jnp.sum(step * step, axis=-1) < eps * eps)
            return d, done

        d0 = g  # start from upsampled coarser-level displacement
        done0 = jnp.logical_not(status)  # dead tracks don't iterate
        d, _ = jax.lax.fori_loop(0, iters, body, (d0, done0))
        g = d * 2.0 if lvl > 0 else d

    new_pts = pts + g
    # final error at level 0
    J0, I0 = prev_pyr[0], next_pyr[0]
    wc0 = pts[:, None, :] + offs[None, :, :]
    Jw0 = bilinear_sample(J0, wc0)
    Iw0 = bilinear_sample(I0, wc0 + g[:, None, :])
    err = jnp.mean(jnp.abs(Jw0 - Iw0), axis=1)
    H0, W0 = I0.shape
    inside_final = jnp.all(
        (new_pts >= 0) & (new_pts <= jnp.array([W0 - 1, H0 - 1],
                                               dtype=pts.dtype)), axis=-1)
    status = jnp.logical_and(status, inside_final)
    return new_pts, status, jnp.where(status, err, jnp.inf)
