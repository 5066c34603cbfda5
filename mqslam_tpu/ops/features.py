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


def _conv2(img, kernel):
    """2D valid-mode convolution of [H, W] with [kh, kw], reflect-padded."""
    kh, kw = kernel.shape
    img = jnp.pad(img, ((kh // 2, kh // 2), (kw // 2, kw // 2)),
                  mode="reflect")
    out = jax.lax.conv_general_dilated(
        img[None, None], kernel[None, None].astype(img.dtype),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)
    return out[0, 0]


def shi_tomasi_response(img, block_size: int = 3):
    """Min-eigenvalue corner response of a grayscale image [H, W] (f32).

    cv2.goodFeaturesToTrack semantics: Sobel(3) gradients, box-summed
    structure tensor over ``block_size``, lambda_min response.
    """
    dt = img.dtype
    sobel_x = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=dt) / 8.0
    sobel_y = sobel_x.T
    ix = _conv2(img, sobel_x)
    iy = _conv2(img, sobel_y)
    box = jnp.ones((block_size, block_size), dtype=dt)
    ixx = _conv2(ix * ix, box)
    iyy = _conv2(iy * iy, box)
    ixy = _conv2(ix * iy, box)
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
    order = jnp.argsort(-score)[:max_corners]
    return cand[order], score[order] > -jnp.inf
