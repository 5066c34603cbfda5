"""Shi-Tomasi (GFTT) corner detection — conv response maps + grid NMS.

Replaces ``cv2.goodFeaturesToTrack`` + the reference's circle-rasterized
keypoint mask (reference: Work/python_libs/cv2_helpers.py:28-37 wrapper,
Work/SLAM/application/own/slam2.py:29-40 keypoint_mask, refill call
slam2.py:665-668 with quality_level=0.01, min_dist=12).

TPU-first shape: Sobel gradients and the box-filtered structure tensor are
depthwise convolutions (XLA conv -> MXU); min-eigenvalue response and 3x3 NMS
are elementwise/pooling ops; the min-distance constraint is enforced by a
static cell grid (one winner per min_dist-sized cell) instead of OpenCV's
sequential greedy suppression — same spacing guarantee up to a factor 2
(adjacent-cell winners can be closer), fully parallel, fixed output shape
[max_corners] with a validity mask.
"""

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["shi_tomasi_response", "detect_corners", "min_distance_mask"]


def _shift(img, dy, dx):
    """Edge-replicated shift via pad + static slice (the separable-filter
    primitive — pure data movement, no gathers, no conv kernels)."""
    H, W = img.shape
    pt, pb = max(-dy, 0), max(dy, 0)
    pl, pr = max(-dx, 0), max(dx, 0)
    padded = jnp.pad(img, ((pt, pb), (pl, pr)), mode="edge")
    return padded[dy + pt:dy + pt + H, dx + pl:dx + pl + W]


def _sep3(img, kx, ky):
    """Separable 3-tap filter via shifted adds."""
    t = (kx[0] * _shift(img, 0, -1) + kx[1] * img + kx[2] * _shift(img, 0, 1))
    return (ky[0] * _shift(t, -1, 0) + ky[1] * t + ky[2] * _shift(t, 1, 0))


def shi_tomasi_response(img, block_size: int = 3):
    """Min-eigenvalue corner response of a grayscale image [H, W] (f32).

    cv2.goodFeaturesToTrack semantics: Sobel(3) gradients, box-summed
    structure tensor over ``block_size``, lambda_min response. All filters
    are separable shifted-add chains (elementwise, no conv kernels).
    """
    ix = _sep3(img, (-0.125, 0.0, 0.125), (1.0, 2.0, 1.0))
    iy = _sep3(img, (1.0, 2.0, 1.0), (-0.125, 0.0, 0.125))
    box = (1.0, 1.0, 1.0)
    ixx = _sep3(ix * ix, box, box)
    iyy = _sep3(iy * iy, box, box)
    ixy = _sep3(ix * iy, box, box)
    tr = 0.5 * (ixx + iyy)
    det_part = jnp.sqrt(jnp.maximum(0.25 * (ixx - iyy) ** 2 + ixy * ixy, 0.0))
    return tr - det_part  # lambda_min


def min_distance_mask(candidates, existing, existing_valid, radius):
    """False where a candidate lies within ``radius`` of any valid existing
    point — the keypoint_mask semantics (slam2.py:29-40).

    candidates [C, 2], existing [K, 2], existing_valid [K] bool.
    """
    d2 = jnp.sum((candidates[:, None, :] - existing[None, :, :]) ** 2,
                 axis=-1)
    near = jnp.logical_and(d2 < radius * radius, existing_valid[None, :])
    return jnp.logical_not(jnp.any(near, axis=1))


@partial(jax.jit, static_argnames=("max_corners", "cell", "block_size"))
def detect_corners(img, max_corners: int, quality_level=0.01,
                   cell: int = 12, existing=None, existing_valid=None,
                   block_size: int = 3):
    """Detect up to ``max_corners`` Shi-Tomasi corners with grid-enforced
    min distance ~``cell`` px, avoiding ``existing`` points by ``cell`` px.

    Returns (uv [max_corners, 2] f32, valid [max_corners] bool) sorted by
    decreasing response. Static output shape; pad entries have valid=False.
    """
    H, W = img.shape
    resp = shi_tomasi_response(img, block_size)
    # 3x3 non-max suppression (cv2 dilate-and-compare)
    nms = jax.lax.reduce_window(resp, -jnp.inf, jax.lax.max, (3, 3), (1, 1),
                                "SAME")
    is_peak = resp >= nms
    thresh = quality_level * jnp.max(resp)
    ok = jnp.logical_and(is_peak, resp > thresh)
    resp_ok = jnp.where(ok, resp, -jnp.inf)

    # one winner per cell x cell block
    ch = -(-H // cell)
    cw = -(-W // cell)
    padded = jnp.full((ch * cell, cw * cell), -jnp.inf, dtype=resp.dtype)
    padded = padded.at[:H, :W].set(resp_ok)
    blocks = padded.reshape(ch, cell, cw, cell).transpose(0, 2, 1, 3)
    blocks = blocks.reshape(ch * cw, cell * cell)
    best_in_cell = jnp.argmax(blocks, axis=1)
    best_resp = jnp.max(blocks, axis=1)
    cy = best_in_cell // cell
    cx = best_in_cell % cell
    cell_ids = jnp.arange(ch * cw)
    ys = (cell_ids // cw) * cell + cy
    xs = (cell_ids % cw) * cell + cx
    cand = jnp.stack([xs, ys], axis=1).astype(img.dtype)
    valid = best_resp > -jnp.inf

    if existing is not None:
        far = min_distance_mask(cand, existing, existing_valid, radius=cell)
        valid = jnp.logical_and(valid, far)

    score = jnp.where(valid, best_resp, -jnp.inf)
    top_score, order = jax.lax.top_k(score, max_corners)
    return cand[order], top_score > -jnp.inf
