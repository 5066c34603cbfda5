"""Brute-force descriptor/point matching: L2 + Hamming, radius & ratio tests.

Replaces the reference's pure-Python BFMatcher.radiusMatch workaround
(reference: Work/python_libs/cv2_helpers.py:263-345 — k=2 kNN via
cv2.batchDistance, keeping up to two matches within maxDistance per query,
working around two OpenCV bugs) and the Lowe-ratio association logic of the
v1 front-end (Work/SLAM/application/own/slam.py:80-127 match_OF_based).

TPU shape: the full distance matrix is one MXU matmul (L2) or XOR+popcount
(Hamming, via lax.population_count); top-2 selection is two masked min
reductions — no sorts.
"""

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["pairwise_l2_sq", "pairwise_hamming", "knn2", "radius_match",
           "ratio_test", "mutual_best"]


def pairwise_l2_sq(a, b):
    """Squared L2 distances [N, M] between rows of a [N, D] and b [M, D].

    |a|^2 + |b|^2 - 2 a b^T: the cross term is one MXU matmul.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    aa = jnp.sum(a * a, axis=1)[:, None]
    bb = jnp.sum(b * b, axis=1)[None, :]
    cross = jnp.dot(a, b.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(aa + bb - 2.0 * cross, 0.0)


def pairwise_hamming(a, b):
    """Hamming distances [N, M] between binary descriptors.

    a [N, D] / b [M, D] uint8 (e.g. ORB/BRISK 32-byte descriptors).
    XOR + lax.population_count, summed over bytes.
    """
    a32 = a.astype(jnp.uint32)
    b32 = b.astype(jnp.uint32)
    x = jnp.bitwise_xor(a32[:, None, :], b32[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def knn2(dists):
    """Best and second-best neighbours per row of a distance matrix.

    Returns (i1, d1, i2, d2) — two masked argmin passes, no sort.
    """
    i1 = jnp.argmin(dists, axis=1)
    d1 = jnp.take_along_axis(dists, i1[:, None], axis=1)[:, 0]
    masked = dists.at[jnp.arange(dists.shape[0]), i1].set(jnp.inf)
    i2 = jnp.argmin(masked, axis=1)
    d2 = jnp.take_along_axis(masked, i2[:, None], axis=1)[:, 0]
    return i1, d1, i2, d2


@partial(jax.jit, static_argnames=())
def radius_match(dists, max_distance):
    """cv2_helpers-style radiusMatch: up to 2 nearest matches per query
    within ``max_distance`` (cv2_helpers.py:296-339 semantics).

    Returns (idx [N, 2] int32, dist [N, 2], valid [N, 2] bool), sorted by
    distance per query; invalid entries have idx -1.
    """
    i1, d1, i2, d2 = knn2(dists)
    v1 = d1 <= max_distance
    v2 = d2 <= max_distance
    idx = jnp.stack([jnp.where(v1, i1, -1), jnp.where(v2, i2, -1)], axis=1)
    dist = jnp.stack([d1, d2], axis=1)
    return idx.astype(jnp.int32), dist, jnp.stack([v1, v2], axis=1)


def ratio_test(d1, d2, ratio=0.7):
    """Lowe ratio acceptance (slam.py:118: d1 < ratio * d2; single-match
    queries auto-accept)."""
    return jnp.where(jnp.isfinite(d2), d1 < ratio * d2,
                     jnp.isfinite(d1))


def mutual_best(dists):
    """Cross-check matching: (query, train) pairs that are mutual nearest.

    Returns (train_idx [N] int32, valid [N] bool).
    """
    fwd = jnp.argmin(dists, axis=1)
    bwd = jnp.argmin(dists, axis=0)
    mutual = bwd[fwd] == jnp.arange(dists.shape[0])
    return fwd.astype(jnp.int32), mutual
