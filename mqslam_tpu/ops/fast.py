"""FAST-9/16 corner detection (segment test), fully vectorized.

Replaces the v1 front-end's cv2.FastFeatureDetector
(reference: Work/SLAM/application/own/slam.py:34, used for detection before
optical-flow association). The 16-pixel Bresenham circle becomes 16 shifted
copies of the image (jnp.roll — dense VPU traffic, no gathers); the
9-contiguous test evaluates all 16 arc rotations with a rolled cumulative
AND; score is the cv2-style sum-of-absolute-differences over the passing
arc's complement threshold; 3x3 NMS matches cv2's nonmaxSuppression=True.
"""

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["fast_response", "fast_detect", "CIRCLE_OFFSETS"]

# Bresenham circle of radius 3, clockwise from 12 o'clock (cv2 ordering).
CIRCLE_OFFSETS = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)


def _circle_stack(img):
    """[16, H, W] of the circle pixels for every center (rolled copies)."""
    shifted = [jnp.roll(img, shift=(-dy, -dx), axis=(0, 1))
               for (dx, dy) in CIRCLE_OFFSETS]
    return jnp.stack(shifted, axis=0)


def fast_response(img, threshold: float = 20.0, arc: int = 9):
    """FAST segment-test response map [H, W] (0 where not a corner).

    Score: sum over circle pixels of |p_i - center| - threshold for the
    brighter/darker set, cv2's FAST score semantics (max over the two
    polarities).
    """
    c = _circle_stack(img)              # [16, H, W]
    center = img[None]
    brighter = c > center + threshold
    darker = c < center - threshold

    def has_arc(mask):
        # contiguous run >= arc among the 16 circular positions: AND of
        # `arc` circularly shifted copies, any start position
        prod = jnp.ones_like(mask, dtype=bool)
        ext = jnp.concatenate([mask, mask], axis=0)
        for k in range(arc):
            prod = prod & ext[k:k + 16]
        return jnp.any(prod, axis=0)

    is_b = has_arc(brighter)
    is_d = has_arc(darker)
    score_b = jnp.sum(jnp.where(brighter, c - center - threshold, 0.0),
                      axis=0)
    score_d = jnp.sum(jnp.where(darker, center - c - threshold, 0.0),
                      axis=0)
    resp = jnp.maximum(jnp.where(is_b, score_b, 0.0),
                       jnp.where(is_d, score_d, 0.0))
    # kill the 3-pixel border (rolled copies wrap around)
    H, W = img.shape
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    interior = ((ys >= 3) & (ys < H - 3) & (xs >= 3) & (xs < W - 3))
    return jnp.where(interior, resp, 0.0)


@partial(jax.jit, static_argnames=("max_corners", "arc"))
def fast_detect(img, threshold: float = 20.0, max_corners: int = 512,
                arc: int = 9, nonmax: bool = True):
    """FAST corners sorted by response.

    Returns (uv [max_corners, 2] f32, score [max_corners], valid bool).
    """
    resp = fast_response(img, threshold, arc)
    if nonmax:
        nms = jax.lax.reduce_window(resp, -jnp.inf, jax.lax.max, (3, 3),
                                    (1, 1), "SAME")
        resp = jnp.where(resp >= nms, resp, 0.0)
    flat = resp.reshape(-1)
    score, idx = jax.lax.top_k(flat, max_corners)
    W = img.shape[1]
    uv = jnp.stack([(idx % W).astype(jnp.float32),
                    (idx // W).astype(jnp.float32)], axis=1)
    return uv, score, score > 0
