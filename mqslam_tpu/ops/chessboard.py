"""Chessboard inner-corner detection, grid ordering, subpixel refinement.

Fills the role of ``cv2.findChessboardCorners`` + ``cv2.cornerSubPix``
(reference: Work/python_libs/cv2_helpers.py:243-260 extractChessboardFeatures,
used by the slam2 chessboard bootstrap slam2.py:1121-1129 and the whole
calibration suite calibrate.py:38), with a TPU-first design instead of
OpenCV's sequential quad detection:

- **Response map** (device): a chessboard inner corner is a saddle point —
  around it the intensity alternates dark/light/dark/light with period pi.
  On a ring of 16 samples the 2nd circular harmonic is therefore dominant,
  while edges (step along a diameter: odd harmonics only) and single-square
  corners carry 1st-harmonic energy. Response = |2nd harmonic|^2 - |1st
  harmonic|^2 of the ring, computed for every pixel at once from 16
  edge-replicated shifted copies of the image (pure VPU slices + FMAs, no
  gathers, no convs). Same spirit as the ChESS detector (Bennett & Lasenby
  2014), reformulated as ring Fourier coefficients.
- **Grid ordering** (host, O(N^2) on ~50 points once per image): extreme
  corners -> exact homography of the unit grid -> greedy unique
  nearest-candidate assignment -> homography refit, iterated; both grid
  orientations are tried and the lower-residual bijection wins. Returns
  corners row-major (row r, col c -> index r*cols + c), the ordering
  cv2.findChessboardCorners feeds to grid_objp.
- **Subpixel refinement** (device): cv2.cornerSubPix's fixed point — the
  gradient-weighted centroid q satisfying sum_i w_i (g_i g_i^T)(p_i - q) = 0
  over the window — iterated as a batched patch/banded-matmul loop exactly
  like the LK tracker (one dynamic-slice patch per corner, window sampling
  via two small matmuls, a 2x2 solve per corner per iteration).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from mqslam_tpu.ops import features, lk
from mqslam_tpu.ops.linalg import solve2x2_sym

__all__ = ["chess_response", "detect_corner_candidates", "corner_subpix",
           "order_chessboard_corners", "find_chessboard_corners",
           "extract_chessboard_features"]


def _ring_offsets(radius: int = 5, n: int = 16):
    """Integer ring offsets (dy, dx) and their exact angles."""
    th = 2.0 * np.pi * np.arange(n) / n
    dx = np.rint(radius * np.cos(th)).astype(int)
    dy = np.rint(radius * np.sin(th)).astype(int)
    ang = np.arctan2(dy, dx)  # angle of the *rounded* offset (less bias)
    return list(zip(dy.tolist(), dx.tolist())), ang


def chess_response(img, radius: int = 5):
    """Saddle-point response map [H, W] of a grayscale image (f32).

    R = |H2|^2 - |H1|^2 with Hk = sum_n a_n e^{i k theta_n} over a 16-sample
    ring of radius ``radius``; a light 3x3 binomial blur suppresses pixel
    noise first. Positive only near chessboard inner corners.
    """
    img = features._sep3(img, (0.25, 0.5, 0.25), (0.25, 0.5, 0.25))
    offs, ang = _ring_offsets(radius)
    c1 = jnp.zeros_like(img)
    s1 = jnp.zeros_like(img)
    c2 = jnp.zeros_like(img)
    s2 = jnp.zeros_like(img)
    for (dy, dx), a in zip(offs, ang):
        v = features._shift(img, dy, dx)
        c1 = c1 + np.cos(a) * v
        s1 = s1 + np.sin(a) * v
        c2 = c2 + np.cos(2 * a) * v
        s2 = s2 + np.sin(2 * a) * v
    return (c2 * c2 + s2 * s2) - (c1 * c1 + s1 * s1)


@partial(jax.jit, static_argnames=("max_corners", "radius", "nms"))
def detect_corner_candidates(img, max_corners: int = 128, radius: int = 5,
                             quality: float = 0.2, nms: int = 5):
    """Top-``max_corners`` saddle-point candidates by response.

    Returns (uv [max_corners, 2] f32, response [max_corners] f32,
    valid [max_corners] bool), sorted by decreasing response. ``quality``
    thresholds relative to the maximum response (saddle responses on a
    board are all comparable, so a high relative bar rejects texture).
    """
    H, W = img.shape
    resp = chess_response(jnp.asarray(img, jnp.float32), radius)
    # tiny deterministic positional bias breaks plateau ties so each corner
    # yields exactly one NMS peak (symmetric saddles have flat-topped
    # responses at half-integer centers)
    ys = jnp.arange(H, dtype=resp.dtype)[:, None]
    xs = jnp.arange(W, dtype=resp.dtype)[None, :]
    resp = resp * (1.0 + 1e-6 * ((ys % 3) + (xs % 3)))
    mx = jax.lax.reduce_window(resp, -jnp.inf, jax.lax.max, (nms, nms),
                               (1, 1), "SAME")
    ok = (resp >= mx) & (resp > quality * jnp.max(resp)) & (resp > 0)
    score = jnp.where(ok, resp, -jnp.inf).reshape(-1)
    top, idx = jax.lax.top_k(score, max_corners)
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    return jnp.stack([xs, ys], axis=1), top, top > -jnp.inf


@partial(jax.jit, static_argnames=("win", "iters", "margin"))
def corner_subpix(img, uv, valid=None, win: int = 11, iters: int = 30,
                  eps: float = 0.001, margin: int = 3):
    """Refine corners to subpixel accuracy (cv2.cornerSubPix semantics:
    (11,11) window, 30 iterations, eps 0.001 — cv2_helpers.py:253-256).

    img [H, W] f32, uv [N, 2]. Returns (uv_refined [N, 2], ok [N] bool);
    ok=False where the corner left the window margin (diverged).

    Per iteration the window (2*win//2+1)^2 gradient products are sampled
    at the current fractional center from per-corner patches by two banded
    matmuls; the update solves the 2x2 normal equations
    q' - q = (sum w G)^-1 sum w G delta with delta the window offsets.
    """
    if valid is None:
        valid = jnp.ones(uv.shape[0], bool)
    r = win // 2
    side = 2 * r + 1
    P = side + 2 * margin + 2  # +2: interpolation tap + gradient border
    pad = r + margin + 2
    dt = uv.dtype
    imgp = jnp.pad(jnp.asarray(img, jnp.float32), pad, mode="edge")
    p0 = uv + pad  # padded coords

    corner = jnp.stack([
        jnp.floor(p0[:, 1]).astype(jnp.int32) - r - margin - 1,
        jnp.floor(p0[:, 0]).astype(jnp.int32) - r - margin - 1], axis=1)
    patch, cy, cx = lk._extract_patches(imgp, corner, P)
    base = jnp.stack([cx.astype(dt), cy.astype(dt)], axis=1)  # (x, y)

    gx = jnp.pad(0.5 * (patch[:, :, 2:] - patch[:, :, :-2]),
                 ((0, 0), (0, 0), (1, 1)))
    gy = jnp.pad(0.5 * (patch[:, 2:, :] - patch[:, :-2, :]),
                 ((0, 0), (1, 1), (0, 0)))
    grads = jnp.stack([gx * gx, gx * gy, gy * gy], axis=1)  # [N, 3, P, P]

    # cv2-style separable window weights exp(-(d/r)^2)
    d = jnp.arange(side, dtype=jnp.float32) - r
    w1 = jnp.exp(-(d / jnp.maximum(r, 1)) ** 2)
    wmask = w1[:, None] * w1[None, :]
    dy_grid = d[:, None] * jnp.ones((1, side))
    dx_grid = jnp.ones((side, 1)) * d[None, :]

    lo = base + r  # window center must stay >= r inside the patch
    hi = base + P - 2 - r

    def body(carry):
        q, done, it = carry
        a = q - r - base  # window start (x, y) in patch coords
        wins = lk._window_multi(grads, a[:, 1], a[:, 0], side)
        wxx = wins[:, 0] * wmask
        wxy = wins[:, 1] * wmask
        wyy = wins[:, 2] * wmask
        A00 = jnp.sum(wxx, axis=(1, 2))
        A01 = jnp.sum(wxy, axis=(1, 2))
        A11 = jnp.sum(wyy, axis=(1, 2))
        bx = jnp.sum(wxx * dx_grid + wxy * dy_grid, axis=(1, 2))
        by = jnp.sum(wxy * dx_grid + wyy * dy_grid, axis=(1, 2))
        sx, sy = solve2x2_sym(A00, A01, A11, bx, by)
        step = jnp.stack([sx, sy], axis=-1)
        step = jnp.where(done[:, None], 0.0, step)
        q2 = jnp.clip(q + step, lo, hi)
        done = done | (jnp.sum(step * step, axis=-1) < eps * eps)
        return q2, done, it + 1

    def cond(carry):
        _, done, it = carry
        return (it < iters) & ~jnp.all(done)

    q0 = jnp.clip(p0, lo, hi)
    q, _, _ = jax.lax.while_loop(cond, body,
                                 (q0, jnp.logical_not(valid), jnp.int32(0)))
    moved = jnp.sqrt(jnp.sum((q - p0) ** 2, axis=-1))
    ok = valid & (moved < r)  # diverged corners drift to the clamp
    return q - pad, ok


def _fit_h_exact(src4, dst4):
    """Homography from 4 point pairs (exact DLT, host numpy)."""
    return _fit_h_ls(src4, dst4)


def _fit_h_ls(src, dst):
    """Least-squares homography src -> dst (normalized DLT, host numpy)."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    ms, ss = src.mean(0), src.std() + 1e-12
    md, sd = dst.mean(0), dst.std() + 1e-12
    s = (src - ms) / ss
    t = (dst - md) / sd
    n = len(src)
    A = np.zeros((2 * n, 9))
    A[0::2, 0:2] = s
    A[0::2, 2] = 1
    A[0::2, 6:8] = -t[:, 0:1] * s
    A[0::2, 8] = -t[:, 0]
    A[1::2, 3:5] = s
    A[1::2, 5] = 1
    A[1::2, 6:8] = -t[:, 1:2] * s
    A[1::2, 8] = -t[:, 1]
    _, _, vt = np.linalg.svd(A)
    Hn = vt[-1].reshape(3, 3)
    Ts = np.array([[1 / ss, 0, -ms[0] / ss], [0, 1 / ss, -ms[1] / ss],
                   [0, 0, 1]])
    Td = np.array([[sd, 0, md[0]], [0, sd, md[1]], [0, 0, 1]])
    return Td @ Hn @ Ts


def _apply_h(H, pts):
    p = np.concatenate([pts, np.ones((len(pts), 1))], axis=1) @ H.T
    return p[:, :2] / p[:, 2:3]


def _greedy_unique_assign(proj, cand):
    """For each projected grid node, the nearest unclaimed candidate.

    Returns (idx [G] into cand or -1, dists [G]). Greedy over globally
    increasing pair distance — optimal enough for well-separated grids.
    """
    G, C = len(proj), len(cand)
    d = np.linalg.norm(proj[:, None, :] - cand[None, :, :], axis=-1)
    idx = -np.ones(G, int)
    dist = np.full(G, np.inf)
    order = np.argsort(d, axis=None)
    used_g = np.zeros(G, bool)
    used_c = np.zeros(C, bool)
    n_done = 0
    for k in order:
        g, c = divmod(k, C)
        if used_g[g] or used_c[c]:
            continue
        idx[g] = c
        dist[g] = d[g, c]
        used_g[g] = used_c[c] = True
        n_done += 1
        if n_done == G:
            break
    return idx, dist


def order_chessboard_corners(cand_uv, board_size, tol_frac: float = 0.35):
    """Order corner candidates into a (cols, rows) grid, row-major.

    cand_uv [C, 2] (C >= cols*rows; extras tolerated — spurious candidates
    simply stay unassigned). board_size = (cols, rows), the cv2
    patternSize convention. Returns (ok, corners [rows*cols, 2] float32)
    with index r*cols + c.

    Method: the 4 extreme candidates (min/max of x+y and x-y) anchor an
    exact unit-grid homography; grid nodes projected through it claim their
    nearest unique candidates; the homography is refit on all claimed pairs
    and the assignment repeated (3 rounds). Both orientations of the grid
    are tried; a solution is valid when every node's match lies within
    ``tol_frac`` of the median grid spacing.
    """
    cols, rows = int(board_size[0]), int(board_size[1])
    N = cols * rows
    cand = np.asarray(cand_uv, np.float64)
    if len(cand) < N:
        return False, np.zeros((N, 2), np.float32)

    s = cand[:, 0] + cand[:, 1]
    dif = cand[:, 0] - cand[:, 1]
    ex = [cand[np.argmin(s)], cand[np.argmax(dif)],
          cand[np.argmax(s)], cand[np.argmin(dif)]]  # TL, TR, BR, BL

    grid = np.stack(np.meshgrid(np.arange(cols), np.arange(rows)),
                    -1).reshape(-1, 2).astype(np.float64)  # (c, r) pairs

    best = None
    for corners4 in (
            # TL->TR along the c axis
            np.array([[0, 0], [cols - 1, 0], [cols - 1, rows - 1],
                      [0, rows - 1]], np.float64),
            # TL->TR along the r axis (board rotated ~90 deg)
            np.array([[0, 0], [0, rows - 1], [cols - 1, rows - 1],
                      [cols - 1, 0]], np.float64)):
        H = _fit_h_exact(corners4, np.asarray(ex))
        idx = None
        for _ in range(3):
            proj = _apply_h(H, grid)
            idx, dist = _greedy_unique_assign(proj, cand)
            if (idx < 0).any():
                break
            H = _fit_h_ls(grid[idx >= 0], cand[idx[idx >= 0]])
        if idx is None or (idx < 0).any():
            continue
        proj = _apply_h(H, grid)
        dist = np.linalg.norm(proj - cand[idx], axis=-1)
        # grid spacing from adjacent projected nodes in the first row
        spacing = np.median(np.linalg.norm(
            proj.reshape(rows, cols, 2)[:, 1:] -
            proj.reshape(rows, cols, 2)[:, :-1], axis=-1))
        score = dist.max() / max(spacing, 1e-9)
        if score < tol_frac and (best is None or score < best[0]):
            best = (score, cand[idx])
    if best is None:
        return False, np.zeros((N, 2), np.float32)
    return True, best[1].astype(np.float32)


def find_chessboard_corners(img, board_size, max_candidates: int = 0,
                            quality: float = 0.2, refine: bool = True):
    """Full pipeline: response -> candidates -> grid ordering -> subpixel.

    img [H, W] grayscale (numpy or jnp, 0..255), board_size (cols, rows).
    Returns (ok, corners [rows*cols, 2] float32) row-major — the
    cv2.findChessboardCorners + cornerSubPix contract of
    extractChessboardFeatures (cv2_helpers.py:243-260).
    """
    cols, rows = int(board_size[0]), int(board_size[1])
    N = cols * rows
    if not max_candidates:
        max_candidates = N + max(16, N // 2)
    img = jnp.asarray(img, jnp.float32)
    uv, resp, valid = detect_corner_candidates(
        img, max_corners=max_candidates, quality=quality)
    cand = np.asarray(uv)[np.asarray(valid)]
    ok, corners = order_chessboard_corners(cand, board_size)
    if not ok:
        return False, corners
    if refine:
        ref, okr = corner_subpix(img, jnp.asarray(corners))
        corners = np.where(np.asarray(okr)[:, None], np.asarray(ref),
                           corners).astype(np.float32)
    return True, corners


def extract_chessboard_features(img, board_size):
    """Name-parity wrapper of cv2_helpers.py:243-260 (grayscale input)."""
    return find_chessboard_corners(img, board_size)
