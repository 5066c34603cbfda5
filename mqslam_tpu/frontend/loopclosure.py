"""Loop-closure detection: ORB place recognition + metric verification.

The reference front-end has no loop closure (drift is handled purely by the
offline BA back-end); this module supplies the missing capability for the
full pipeline "incremental BA + pose-graph loop closure" — appearance-based
candidate retrieval over a keyframe database, geometric verification by
RANSAC PnP against the candidate keyframe's 3D landmarks, and emission of a
BetweenFactor edge for ba.posegraph / the BA graph (same edge semantics as
the reference's odometry constraints, bundle_adjust.cpp:301-309).

TPU shape: the database is one fixed-capacity array of packed descriptors;
candidate scoring is a single batched XOR+popcount over ALL stored keyframes
at once (no per-keyframe host loop), mutual-best + ratio gating done with
masked reductions; verification reuses ops.pnp.pnp_ransac.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mqslam_tpu.core import se3, so3
from mqslam_tpu.ops import matching, pnp

__all__ = ["KeyframeDB", "empty_db", "add_keyframe", "loop_scores",
           "best_candidate", "verify_loop", "relative_edge"]


class KeyframeDB(NamedTuple):
    """Fixed-capacity keyframe store (a pytree of device arrays)."""
    desc: jnp.ndarray       # [N, K, 32] uint8 ORB descriptors
    desc_valid: jnp.ndarray  # [N, K] bool
    uv: jnp.ndarray         # [N, K, 2] keypoint pixels
    xyz: jnp.ndarray        # [N, K, 3] landmark positions (world)
    xyz_valid: jnp.ndarray  # [N, K] bool (descriptor has a 3D point)
    pose: jnp.ndarray       # [N, 6] keyframe pose (rvec, center)
    used: jnp.ndarray       # [N] bool
    count: jnp.ndarray      # scalar int32


def empty_db(capacity: int, k: int, desc_bytes: int = 32):
    return KeyframeDB(
        desc=jnp.zeros((capacity, k, desc_bytes), jnp.uint8),
        desc_valid=jnp.zeros((capacity, k), bool),
        uv=jnp.zeros((capacity, k, 2), jnp.float32),
        xyz=jnp.zeros((capacity, k, 3), jnp.float32),
        xyz_valid=jnp.zeros((capacity, k), bool),
        pose=jnp.zeros((capacity, 6), jnp.float32),
        used=jnp.zeros(capacity, bool),
        count=jnp.int32(0))


@jax.jit
def add_keyframe(db: KeyframeDB, desc, desc_valid, uv, xyz, xyz_valid,
                 pose6):
    """Append one keyframe (no-op when the DB is full)."""
    i = jnp.minimum(db.count, db.desc.shape[0] - 1)
    can = db.count < db.desc.shape[0]

    def put(store, val):
        return jnp.where(can, store.at[i].set(val), store)

    return KeyframeDB(
        desc=put(db.desc, desc), desc_valid=put(db.desc_valid, desc_valid),
        uv=put(db.uv, uv), xyz=put(db.xyz, xyz),
        xyz_valid=put(db.xyz_valid, xyz_valid), pose=put(db.pose, pose6),
        used=db.used.at[i].set(jnp.where(can, True, db.used[i])),
        count=db.count + can.astype(jnp.int32))


def _match_counts(q_desc, q_valid, db_desc, db_valid, max_dist, ratio):
    """[N] number of ratio-test mutual matches query -> each stored KF."""
    d = _hamming_all(q_desc, db_desc)  # [N, Kq, Kd]
    big = jnp.int32(10_000)
    d = jnp.where(q_valid[None, :, None] & db_valid[:, None, :], d, big)
    # best + second best over the DB axis
    d1 = jnp.min(d, axis=2)
    i1 = jnp.argmin(d, axis=2)
    d_masked = d.at[jnp.arange(d.shape[0])[:, None],
                    jnp.arange(d.shape[1])[None, :], i1].set(big)
    d2 = jnp.min(d_masked, axis=2)
    # mutual: query is also the best for its matched train descriptor
    bwd = jnp.argmin(d, axis=1)                          # [N, Kd]
    mutual = jnp.take_along_axis(bwd, i1, axis=1) == \
        jnp.arange(d.shape[1])[None, :]
    good = (d1 <= max_dist) & (d1.astype(jnp.float32)
                               < ratio * d2.astype(jnp.float32)) & mutual
    return jnp.sum(good & q_valid[None, :], axis=1), i1, good


def _hamming_all(q_desc, db_desc):
    """[N, Kq, Kd] Hamming distances, one popcount pass."""
    x = jnp.bitwise_xor(q_desc[None, :, None, :].astype(jnp.uint32),
                        db_desc[:, None, :, :].astype(jnp.uint32))
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=())
def loop_scores(db: KeyframeDB, q_desc, q_valid, cur_index,
                min_gap: int = 10, max_dist: int = 64,
                ratio: float = 0.8):
    """Similarity score of the query against every stored keyframe.

    Keyframes within ``min_gap`` of ``cur_index`` (recency window) and unused
    slots score 0 — loop closure must link to *old* places, not the local
    neighborhood (standard place-recognition gating)."""
    counts, i1, good = _match_counts(q_desc, q_valid, db.desc,
                                     db.desc_valid, max_dist, ratio)
    idx = jnp.arange(db.desc.shape[0])
    eligible = db.used & (idx <= cur_index - min_gap)
    return jnp.where(eligible, counts, 0), i1, good


def best_candidate(scores, min_matches: int = 20):
    """(index, found) of the best-scoring eligible keyframe."""
    i = jnp.argmax(scores)
    return i, scores[i] >= min_matches


@partial(jax.jit, static_argnames=())
def verify_loop(db: KeyframeDB, cand, i1, good, q_uv, q_valid, cal, key,
                reproj_threshold: float = 3.0):
    """Metric verification: RANSAC PnP of the query's 2D points against the
    candidate keyframe's 3D landmarks (via the descriptor matches).

    Returns (rvec, tvec (world->cam of the query), n_inliers, ok)."""
    matches_j = i1[cand]                 # [Kq] candidate landmark per query
    m_ok = good[cand] & q_valid & db.xyz_valid[cand][matches_j]
    objp = db.xyz[cand][matches_j]       # [Kq, 3]
    rvec, tvec, inl, n_inl = pnp.pnp_ransac(
        objp, q_uv, cal, m_ok, key,
        reproj_threshold=reproj_threshold)
    ok = n_inl >= jnp.maximum(12, jnp.int32(0.4 * jnp.sum(m_ok)))
    return rvec, tvec, n_inl, ok


def relative_edge(pose_i6, rvec_q, tvec_q):
    """BetweenFactor measurement from stored pose i to the verified query
    pose: (meas_r, meas_t) with Exp(meas_r)=R_i^T R_q, meas_t=R_i^T(c_q-c_i).

    pose_i6 is (rvec, center) cam-to-world as in ba/; (rvec_q, tvec_q) is
    the world->cam PnP result (R_q^w2c, t): c_q = -R^T t, R_q^c2w = R^T.
    """
    from mqslam_tpu.core.smallmat import matmul_small, matvec_small

    Ri = so3.exp(pose_i6[:3])
    ci = pose_i6[3:]
    Rq = so3.exp(rvec_q).T              # cam-to-world rotation
    cq = -matvec_small(Rq, tvec_q)      # camera center
    meas_r = so3.log(matmul_small(Ri.T, Rq))
    meas_t = matvec_small(Ri.T, cq - ci)
    return meas_r, meas_t
