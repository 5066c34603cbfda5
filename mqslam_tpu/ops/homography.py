"""Homography fitting + the degeneracy-based keyframe test.

Replaces ``cv2.findHomography`` (default least-squares method) + SVD condition
check used for keyframe selection (reference: Work/SLAM/application/own/
slam2.py:43-58: undistort a sample of matches, fit H, declare a keyframe when
sigma_max/sigma_min > 1.04).

TPU shape: normalized DLT over masked fixed-capacity point sets; the 9x9
null-space comes from the batched Jacobi eigensolver; singular values of H
from svdvals3x3. The reference subsamples <=75 points "for performance"
(slam2.py:1089-1090) and fits on all of them in one LS solve — here we use
every valid match (strictly more information, same statistic).
"""

import jax.numpy as jnp

from mqslam_tpu.ops import linalg

__all__ = ["fit_homography", "homography_condition", "keyframe_test"]


def _normalize(pts, w):
    """Hartley normalization: zero mean, mean distance sqrt(2) (weighted)."""
    n = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
    mean = jnp.sum(pts * w[..., None], axis=-2, keepdims=True) / n[..., None]
    centered = pts - mean
    dist = jnp.sqrt(jnp.sum(centered ** 2, axis=-1))
    mean_dist = jnp.sum(dist * w, axis=-1, keepdims=True) / n
    s = jnp.sqrt(2.0) / jnp.maximum(mean_dist, 1e-12)
    return centered * s[..., None], mean[..., 0, :], s[..., 0]


def _denormalize_H(Hn, mean1, s1, mean2, s2):
    """H = T2^-1 Hn T1 for similarity normalizations T."""
    # T1: x -> s1 (x - mean1);  T2^-1: x -> x / s2 + mean2
    dt = Hn.dtype
    zero = jnp.zeros_like(s1)
    one = jnp.ones_like(s1)
    T1 = jnp.stack([
        jnp.stack([s1, zero, -s1 * mean1[..., 0]], axis=-1),
        jnp.stack([zero, s1, -s1 * mean1[..., 1]], axis=-1),
        jnp.stack([zero, zero, one], axis=-1)], axis=-2)
    T2inv = jnp.stack([
        jnp.stack([1.0 / s2, zero, mean2[..., 0]], axis=-1),
        jnp.stack([zero, 1.0 / s2, mean2[..., 1]], axis=-1),
        jnp.stack([zero, zero, one], axis=-1)], axis=-2)
    return linalg.matmul_small(linalg.matmul_small(T2inv, Hn), T1)


def fit_homography(pts1, pts2, valid=None):
    """Least-squares DLT homography pts1 -> pts2 over valid matches.

    pts1/pts2 [..., K, 2]; returns H [..., 3, 3] normalized to H[2,2]-free
    unit Frobenius scale (the overall scale is irrelevant to its condition
    number).
    """
    if valid is None:
        valid = jnp.ones(pts1.shape[:-1], dtype=bool)
    w = valid.astype(pts1.dtype)
    p1, mean1, s1 = _normalize(pts1, w)
    p2, mean2, s2 = _normalize(pts2, w)
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    zero = jnp.zeros_like(x1)
    one = jnp.ones_like(x1)
    row_a = jnp.stack([x1, y1, one, zero, zero, zero,
                       -x2 * x1, -x2 * y1, -x2], axis=-1)
    row_b = jnp.stack([zero, zero, zero, x1, y1, one,
                       -y2 * x1, -y2 * y1, -y2], axis=-1)
    rows = jnp.concatenate([row_a * w[..., None], row_b * w[..., None]],
                           axis=-2)  # [..., 2K, 9]
    S = linalg.gram(rows)
    # 9x9 null-space by shifted inverse iteration (see linalg; this runs
    # once per RANSAC hypothesis through pnp_planar, where the Jacobi
    # eigensolve was a dominant cost). 4 iterations: homography fits are
    # noisier/less separated than DLT minimal sets.
    h = linalg.smallest_eigvec_spd(S, iters=4)
    Hn = h.reshape(h.shape[:-1] + (3, 3))
    H = _denormalize_H(Hn, mean1, s1, mean2, s2)
    norm = jnp.sqrt(jnp.sum(H * H, axis=(-2, -1), keepdims=True))
    return H / jnp.maximum(norm, 1e-30)


def homography_condition(H):
    """sigma_max / sigma_min of H (slam2.py:54-57's w[0]/w[2])."""
    sv = linalg.svdvals3x3(H)
    return sv[..., 0] / jnp.maximum(sv[..., 2], 1e-30)


def keyframe_test(pts1_norm, pts2_norm, valid=None, threshold=1.04):
    """True when the two views are sufficiently non-degenerate to serve as a
    triangulation pair (slam2.py:43-58). Points must be undistorted
    normalized coordinates."""
    H = fit_homography(pts1_norm, pts2_norm, valid)
    return homography_condition(H) > threshold
