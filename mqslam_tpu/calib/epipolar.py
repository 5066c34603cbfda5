"""Two-view epipolar geometry: F estimation + essential decomposition.

The math behind the reference's stereo pose-estimation lab
(reference: Work/calibration/application/calibrate.py:60-503
triangl_pose_est_interactive): RANSAC fundamental with Snavely's
0.006*max(size) threshold (:266-283), 8-point refit on inliers (:287),
E = F in normalized coordinates (:293), the HZ 9.19 (R, t) extraction
(:295-310), and the 4-way twisted-pair/baseline disambiguation via
triangulated-cheirality voting (:316-381).
"""

from functools import partial

import jax
import jax.numpy as jnp

from mqslam_tpu.ops import linalg, triangulation as tri

__all__ = ["fundamental_8point", "fundamental_ransac",
           "decompose_essential", "relative_pose_from_fundamental"]


def _normalize(pts, w):
    n = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
    mean = jnp.sum(pts * w[..., None], axis=-2, keepdims=True) / n[..., None]
    centered = pts - mean
    dist = jnp.sqrt(jnp.sum(centered ** 2, axis=-1))
    md = jnp.sum(dist * w, axis=-1, keepdims=True) / n
    s = jnp.sqrt(2.0) / jnp.maximum(md, 1e-12)
    return centered * s[..., None], mean[..., 0, :], s[..., 0]


def fundamental_8point(pts1, pts2, valid=None):
    """Normalized 8-point fundamental matrix (LS over all valid matches,
    rank-2 enforced). pts [..., K, 2] -> F [..., 3, 3] with x2^T F x1 = 0."""
    if valid is None:
        valid = jnp.ones(pts1.shape[:-1], dtype=bool)
    w = valid.astype(pts1.dtype)
    p1, m1, s1 = _normalize(pts1, w)
    p2, m2, s2 = _normalize(pts2, w)
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    one = jnp.ones_like(x1)
    rows = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2,
                      x1, y1, one], axis=-1) * w[..., None]
    S = linalg.gram(rows)
    _, V = linalg.eigh_jacobi(S, sweeps=10)
    f = V[..., :, 0]
    Fn = f.reshape(f.shape[:-1] + (3, 3))
    # rank-2 enforcement: zero the smallest singular value via eigh of
    # F^T F (columns V) and F F^T (columns U)
    Fn = _project_rank2(Fn)
    # denormalize: F = T2^T Fn T1
    T1 = _similarity(m1, s1, Fn.dtype)
    T2 = _similarity(m2, s2, Fn.dtype)
    F = linalg.matmul_small(jnp.swapaxes(T2, -1, -2),
                            linalg.matmul_small(Fn, T1))
    norm = jnp.sqrt(jnp.sum(F * F, axis=(-2, -1), keepdims=True))
    return F / jnp.maximum(norm, 1e-30)


def _similarity(mean, s, dt):
    zero = jnp.zeros_like(s)
    one = jnp.ones_like(s)
    return jnp.stack([
        jnp.stack([s, zero, -s * mean[..., 0]], axis=-1),
        jnp.stack([zero, s, -s * mean[..., 1]], axis=-1),
        jnp.stack([zero, zero, one], axis=-1)], axis=-2)


def _project_rank2(F):
    """Nearest rank-2 matrix: subtract smallest singular triplet."""
    FtF = linalg.gram(F)
    wv, V = linalg.eigh_jacobi(FtF, sweeps=10)
    v0 = V[..., :, 0]                      # right vector of smallest sv
    Fv = linalg.matvec_small(F, v0)
    return F - Fv[..., :, None] * v0[..., None, :]


def _sampson_sq(F, pts1, pts2):
    """Squared Sampson distance per match."""
    x1 = jnp.concatenate([pts1, jnp.ones_like(pts1[..., :1])], axis=-1)
    x2 = jnp.concatenate([pts2, jnp.ones_like(pts2[..., :1])], axis=-1)
    Fx1 = jnp.sum(F[..., None, :, :] * x1[..., None, :], axis=-1)
    Ftx2 = jnp.sum(jnp.swapaxes(F, -1, -2)[..., None, :, :]
                   * x2[..., None, :], axis=-1)
    num = jnp.sum(x2 * Fx1, axis=-1) ** 2
    den = (Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2
           + Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2)
    return num / jnp.maximum(den, 1e-30)


@partial(jax.jit, static_argnames=("n_hyp",))
def fundamental_ransac(pts1, pts2, key, valid=None, threshold=1.0,
                       n_hyp: int = 256):
    """Batched-hypothesis RANSAC F: 8-point minimal sets scored by Sampson
    distance; final 8-point refit on the winning inlier set.

    ``threshold`` in the units of pts (the reference uses
    0.006 * max(image size) pixels, calibrate.py:266-283 citing Snavely).
    Returns (F, inlier_mask, n_inliers).
    """
    K = pts1.shape[0]
    if valid is None:
        valid = jnp.ones(K, dtype=bool)
    scores = jax.random.uniform(key, (n_hyp, K))
    scores = scores + (1.0 - valid.astype(pts1.dtype)) * 10.0
    sel = jnp.argsort(scores, axis=1)[:, :8]
    F_h = fundamental_8point(pts1[sel], pts2[sel])
    d2 = _sampson_sq(F_h, pts1[None], pts2[None])
    inl = (d2 < threshold ** 2) & valid[None]
    n_inl = jnp.sum(inl, axis=1)
    best = jnp.argmax(n_inl)
    inlier = inl[best]
    use = jnp.where(jnp.sum(inlier) >= 8, inlier, valid)
    F = fundamental_8point(pts1, pts2, use)
    d2f = _sampson_sq(F, pts1, pts2)
    inlier = (d2f < threshold ** 2) & valid
    return F, inlier, jnp.sum(inlier)


def decompose_essential(E):
    """HZ 9.19: E -> (R1, R2, t) candidate factors (4 poses: (R1, +-t),
    (R2, +-t)); calibrate.py:295-310."""
    # SVD with U derived from V through E itself: E's two large singular
    # values are EQUAL, so diagonalizing E E^T and E^T E independently picks
    # uncoupled bases in the degenerate subspace — u_i must come from
    # E v_i / |E v_i| to keep E = U diag V^T consistent.
    EtE = linalg.gram(E)
    _, V = linalg.eigh_jacobi(EtE, sweeps=10)
    V = V[..., :, ::-1]  # descending: v1, v2 span the row space, v3 = null
    detV = jnp.linalg.det(V)
    V = V * jnp.stack([jnp.ones_like(detV), jnp.ones_like(detV), detV],
                      axis=-1)[..., None, :]
    Ev1 = linalg.matvec_small(E, V[..., :, 0])
    Ev2 = linalg.matvec_small(E, V[..., :, 1])
    u1 = Ev1 / jnp.maximum(jnp.linalg.norm(Ev1, axis=-1, keepdims=True),
                           1e-30)
    u2 = Ev2 / jnp.maximum(jnp.linalg.norm(Ev2, axis=-1, keepdims=True),
                           1e-30)
    u3 = jnp.cross(u1, u2)
    U = jnp.stack([u1, u2, u3], axis=-1)
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                    dtype=E.dtype)
    R1 = linalg.matmul_small(U, linalg.matmul_small(
        W, jnp.swapaxes(V, -1, -2)))
    R2 = linalg.matmul_small(U, linalg.matmul_small(
        W.T, jnp.swapaxes(V, -1, -2)))
    t = U[..., :, 2]
    return R1, R2, t


def relative_pose_from_fundamental(F, pts1_norm, pts2_norm, valid=None):
    """Pick the (R, t) among the 4 essential factorizations that places the
    most triangulated points in front of both cameras (the reference's
    chirality disambiguation, calibrate.py:316-381). Points must be
    normalized coordinates (E = F there, calibrate.py:293).

    Returns (R, t, n_in_front) with |t| = 1.
    """
    if valid is None:
        valid = jnp.ones(pts1_norm.shape[0], dtype=bool)
    R1, R2, t = decompose_essential(F)
    eye34 = jnp.concatenate([jnp.eye(3, dtype=F.dtype),
                             jnp.zeros((3, 1), F.dtype)], axis=1)

    def count_front(R, tt):
        P2 = jnp.concatenate([R, tt[:, None]], axis=1)
        x, _ = tri.linear_ls(pts1_norm, eye34, pts2_norm, P2)
        z1 = x[:, 2]
        z2 = jnp.sum(R[2] * x, axis=-1) + tt[2]
        return jnp.sum((z1 > 0) & (z2 > 0) & valid)

    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    counts = jnp.stack([count_front(R, tt) for (R, tt) in cands])
    best = jnp.argmax(counts)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    return Rs[best], ts[best], counts[best]
