"""Perspective-n-Point: batched DLT + Gauss-Newton refinement + RANSAC.

Replaces ``cv2.solvePnP`` / ``cv2.solvePnPRansac`` in the front-end's pose
ladder (reference: Work/SLAM/application/own/slam2.py:448-490 — RANSAC with
2 px reprojection threshold and outlier-ratio gate, then iterative refinement
on the inliers with extrinsic guess).

TPU-first shape: RANSAC evaluates a fixed batch of hypotheses concurrently
(vmapped 12x12 DLT null-space + polar extraction + inlier scoring) instead of
OpenCV's sequential adaptive loop; the refinement is a fixed-iteration
Gauss-Newton with a 6x6 eigen-pseudo-inverse solve; all point sets are
fixed-capacity arrays with validity masks.
"""

from functools import partial

import jax
import jax.numpy as jnp

from mqslam_tpu.core import camera as cam_mod, se3, so3
from mqslam_tpu.ops import linalg

__all__ = ["pnp_dlt", "pnp_planar", "pnp_solve", "pnp_refine",
           "pnp_ransac", "reprojection_error"]


def pnp_dlt(objp, uv_norm, weights=None):
    """Direct linear transform pose from >=6 2D(normalized)-3D pairs.

    objp [..., K, 3], uv_norm [..., K, 2], optional weights [..., K] (0 or 1
    rows). Returns (R [..., 3, 3], t [..., 3]) — cheirality-corrected, polar-
    projected onto SO(3).
    """
    X, Y, Z = objp[..., 0], objp[..., 1], objp[..., 2]
    one = jnp.ones_like(X)
    zero = jnp.zeros_like(X)
    x, y = uv_norm[..., 0], uv_norm[..., 1]
    row_x = jnp.stack([X, Y, Z, one, zero, zero, zero, zero,
                       -x * X, -x * Y, -x * Z, -x], axis=-1)
    row_y = jnp.stack([zero, zero, zero, zero, X, Y, Z, one,
                       -y * X, -y * Y, -y * Z, -y], axis=-1)
    rows = jnp.concatenate([row_x, row_y], axis=-2)  # [..., 2K, 12]
    if weights is not None:
        w2 = jnp.concatenate([weights, weights], axis=-1)[..., None]
        rows = rows * w2
    S = linalg.gram(rows)  # [..., 12, 12]
    # null-space extraction by shifted inverse iteration — minimal RANSAC
    # sets make S exactly singular, so this converges in one solve; the
    # 12x12 Jacobi eigensolve it replaces was the front-end's second-
    # largest cost after LK (prof_pnp.py)
    p = linalg.smallest_eigvec_spd(S, iters=3)  # [..., 12]
    M = p.reshape(p.shape[:-1] + (3, 4))

    Mr = M[..., :3]
    det = (Mr[..., 0, 0] * (Mr[..., 1, 1] * Mr[..., 2, 2]
                            - Mr[..., 1, 2] * Mr[..., 2, 1])
           - Mr[..., 0, 1] * (Mr[..., 1, 0] * Mr[..., 2, 2]
                              - Mr[..., 1, 2] * Mr[..., 2, 0])
           + Mr[..., 0, 2] * (Mr[..., 1, 0] * Mr[..., 2, 1]
                              - Mr[..., 1, 1] * Mr[..., 2, 0]))
    sign = jnp.where(det >= 0, 1.0, -1.0)[..., None, None]
    M = M * sign
    scale = jnp.cbrt(jnp.maximum(jnp.abs(det), 1e-30))[..., None, None]
    Mn = M / scale
    # Polar factor of Mn[:, :3]: R = M V S^-1 V^T with M^T M = V S^2 V^T.
    Mr = Mn[..., :3]
    w3, V3 = linalg.eigh_jacobi(linalg.gram(Mr), sweeps=8)
    s_inv = 1.0 / jnp.sqrt(jnp.maximum(w3, 1e-20))
    VsV = linalg.matmul_small(V3 * s_inv[..., None, :],
                              jnp.swapaxes(V3, -1, -2))
    R = linalg.matmul_small(Mr, VsV)
    t = Mn[..., 3]
    return R, t


def pnp_planar(objp, uv_norm, weights=None):
    """Homography-decomposition pose for (near-)coplanar 3D points.

    The 12-parameter DLT is rank-deficient when the scene is a plane — which
    is exactly the reference's bootstrap regime (chessboard grid_objp with
    z=0, slam2.py:1141-1146, and the SVO plane back-projection init,
    svo_initialization.py:62-85). This is the IPPE-style alternative: fit the
    best plane (principal axes), fit the plane->image homography, decompose
    H ~ [sR e1, sR e2, s(R O + t)].

    Returns (R [..., 3, 3], t [..., 3]).
    """
    from mqslam_tpu.ops import homography as homog

    if weights is None:
        weights = jnp.ones(objp.shape[:-1], dtype=objp.dtype)
    w = weights[..., None]
    n = jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1.0)
    O = jnp.sum(objp * w, axis=-2) / n  # plane origin (centroid)
    centered = (objp - O[..., None, :]) * w
    C = jnp.sum(centered[..., :, None] * centered[..., None, :], axis=-3)
    _, V = linalg.eigh_jacobi(C, sweeps=8)
    e1 = V[..., :, 2]  # largest-variance axes span the plane
    e2 = V[..., :, 1]
    pu = jnp.sum((objp - O[..., None, :]) * e1[..., None, :], axis=-1)
    pv = jnp.sum((objp - O[..., None, :]) * e2[..., None, :], axis=-1)
    plane_uv = jnp.stack([pu, pv], axis=-1)
    H = homog.fit_homography(plane_uv, uv_norm, weights > 0)
    a1 = H[..., :, 0]
    a2 = H[..., :, 1]
    b = H[..., :, 2]
    s = jnp.sqrt(jnp.maximum(
        jnp.linalg.norm(a1, axis=-1) * jnp.linalg.norm(a2, axis=-1), 1e-30))
    # sign: centroid must be in front of the camera (depth b_z / s > 0)
    sign = jnp.where(b[..., 2] >= 0, 1.0, -1.0)[..., None]
    a1 = a1 * sign / s[..., None]
    a2 = a2 * sign / s[..., None]
    b = b * sign / s[..., None]
    r3 = jnp.cross(a1, a2)
    M = jnp.stack([a1, a2, r3], axis=-1)  # columns
    # polar projection onto SO(3)
    w3, V3 = linalg.eigh_jacobi(linalg.gram(M), sweeps=8)
    s_inv = 1.0 / jnp.sqrt(jnp.maximum(w3, 1e-20))
    VsV = linalg.matmul_small(V3 * s_inv[..., None, :],
                              jnp.swapaxes(V3, -1, -2))
    Rm = linalg.matmul_small(M, VsV)
    A = jnp.stack([Rm[..., :, 0], Rm[..., :, 1],
                   jnp.cross(Rm[..., :, 0], Rm[..., :, 1])], axis=-1)
    # A maps PLANE-BASIS coords (pu, pv, n) to camera coords; the world->cam
    # rotation needs the plane-basis change rolled in: R = A E^T with
    # E = [e1 e2 e1xe2] (identity only when the plane happens to be z=0
    # with axis-aligned eigenvectors — eigh's axis order/signs are
    # arbitrary, so dropping E silently mis-rotates general boards)
    E = jnp.stack([e1, e2, jnp.cross(e1, e2)], axis=-1)
    R = linalg.matmul_small(A, jnp.swapaxes(E, -1, -2))
    t = b - linalg.matvec_small(R, O)
    return R, t


def _pose_cost_norm(R, t, objp, uv_norm, weights):
    """Masked sum of squared normalized-image residuals for a pose."""
    pc = linalg.matvec_small(R[..., None, :, :], objp) + t[..., None, :]
    z = jnp.where(jnp.abs(pc[..., 2]) > 1e-12, pc[..., 2], 1e-12)
    proj = pc[..., :2] / z[..., None]
    r2 = jnp.sum((proj - uv_norm) ** 2, axis=-1)
    r2 = jnp.where(pc[..., 2] > 0, r2, 1e6)  # behind camera: penalize
    return jnp.sum(r2 * weights, axis=-1)


def pnp_solve(objp, uv_norm, weights=None):
    """General minimal/least-squares pose: best of DLT and planar-homography
    solutions by reprojection cost (handles both generic and coplanar
    scenes branchlessly — the role of cv2.solvePnP's internal dispatch)."""
    if weights is None:
        weights = jnp.ones(objp.shape[:-1], dtype=objp.dtype)
    R1, t1 = pnp_dlt(objp, uv_norm, weights)
    R2, t2 = pnp_planar(objp, uv_norm, weights)
    c1 = _pose_cost_norm(R1, t1, objp, uv_norm, weights)
    c2 = _pose_cost_norm(R2, t2, objp, uv_norm, weights)
    pick2 = (c2 < c1)[..., None, None]
    R = jnp.where(pick2, R2, R1)
    t = jnp.where(pick2[..., 0], t2, t1)
    return R, t


def reprojection_error(objp, uv_px, cal, rvec, tvec, valid=None):
    """RMS pixel reprojection error + per-point reprojections.

    Semantics of calibration_tools.reprojection_error (reference:
    Work/python_libs/calibration_tools.py:116-124).
    """
    P = se3.from_rvec_tvec(rvec, tvec)
    proj, _ = cam_mod.project(objp, P, cal)
    d2 = jnp.sum((proj - uv_px) ** 2, axis=-1)
    if valid is not None:
        n = jnp.maximum(jnp.sum(valid, axis=-1), 1)
        rms = jnp.sqrt(jnp.sum(jnp.where(valid, d2, 0.0), axis=-1) / n)
    else:
        rms = jnp.sqrt(jnp.mean(d2, axis=-1))
    return rms, proj


def _proj_residual(params, objp, uv_px, cal):
    rvec, tvec = params[..., :3], params[..., 3:]
    P = se3.from_rvec_tvec(rvec, tvec)
    proj, _ = cam_mod.project(objp, P, cal)
    return (proj - uv_px).reshape(objp.shape[:-2] + (-1,))


@partial(jax.jit, static_argnames=("iters",))
def pnp_refine(objp, uv_px, cal, rvec0, tvec0, valid=None, iters: int = 10,
               damping: float = 1e-6):
    """Levenberg-style Gauss-Newton pose refinement from an extrinsic guess
    (cv2.solvePnP iterative with useExtrinsicGuess=True, slam2.py:482-490).

    objp [K, 3], uv_px [K, 2], valid [K]; fixed ``iters`` damped GN steps.
    """
    if valid is None:
        valid = jnp.ones(objp.shape[:-1], dtype=bool)
    w = valid.astype(objp.dtype)
    # invalid slots may carry NaN (e.g. never-initialized tracker slots);
    # masking multiplies by 0 which does NOT absorb NaN — zero them first
    objp = jnp.where(valid[..., None], objp, 0.0)
    uv_px = jnp.where(valid[..., None], uv_px, 0.0)

    def step(_, params):
        r = _proj_residual(params, objp, uv_px, cal)
        J = jax.jacfwd(_proj_residual)(params, objp, uv_px, cal)  # [2K, 6]
        wr = jnp.repeat(w, 2) if w.ndim == 1 else w
        Jw = J * wr[:, None]
        rw = r * wr
        JtJ = linalg.gram(Jw)
        Jtr = linalg.gram_rhs(Jw, rw)
        diag = jnp.diagonal(JtJ, axis1=-2, axis2=-1)
        # Levenberg damping keeps JtJ SPD, so the closed-form blocked solve
        # applies (the eigen-pseudo-inverse was ~8x higher op-chain latency).
        lam = damping * jnp.maximum(diag.max(), 1.0)
        JtJ = JtJ + (lam + 1e-12 * diag.max()) * jnp.eye(6, dtype=JtJ.dtype)
        delta = linalg.solve6x6_spd(JtJ, -Jtr)
        return params + delta

    params0 = jnp.concatenate([rvec0, tvec0])
    params = jax.lax.fori_loop(0, iters, step, params0)
    return params[:3], params[3:]


@partial(jax.jit, static_argnames=("n_hyp", "sample_size", "refine_iters"))
def pnp_ransac(objp, uv_px, cal, valid, key, n_hyp: int = 128,
               sample_size: int = 6, reproj_threshold: float = 2.0,
               refine_iters: int = 5):
    """Batched-hypothesis RANSAC PnP.

    objp [K, 3], uv_px [K, 2], valid [K] bool. All ``n_hyp`` minimal-set
    hypotheses are solved and scored concurrently (fixed work, no adaptive
    early exit — the TPU formulation of cv2.solvePnPRansac's loop).

    Returns (rvec, tvec, inlier_mask [K], n_inliers). The winning hypothesis
    is GN-refined on its inlier set.
    """
    K = objp.shape[0]
    dt = objp.dtype
    # NaN in invalid slots would poison hypothesis scoring (err2 = NaN
    # compares False — fine) and the final refine (J * 0 = NaN — fatal)
    objp = jnp.where(valid[:, None], objp, 0.0)
    uv_px = jnp.where(valid[:, None], uv_px, 0.0)

    # Random valid minimal sets: per-hypothesis random keys, invalid points
    # pushed to the end, take the first `sample_size` after argsort.
    scores = jax.random.uniform(key, (n_hyp, K))
    scores = scores + (1.0 - valid.astype(dt))[None, :] * 10.0
    sel = jnp.argsort(scores, axis=1)[:, :sample_size]  # [n_hyp, S]
    objp_sets = objp[sel]            # [n_hyp, S, 3]
    uv_sets = uv_px[sel]             # [n_hyp, S, 2]

    uvn_sets = cam_mod.undistort_points(uv_sets, cal)
    R, t = pnp_solve(objp_sets, uvn_sets)  # [n_hyp, 3, 3], [n_hyp, 3]

    # Score every hypothesis against all points (pixel reprojection).
    P = se3.from_R_t(R, t)  # [n_hyp, 4, 4]
    proj, depth = cam_mod.project(objp[None, :, :], P[:, None], cal)
    err2 = jnp.sum((proj - uv_px[None]) ** 2, axis=-1)
    inl = (err2 < reproj_threshold ** 2) & valid[None, :] & (depth > 0)
    n_inl = jnp.sum(inl, axis=1)
    best = jnp.argmax(n_inl)

    rvec0 = so3.log(R[best])
    tvec0 = t[best]
    inlier_mask = inl[best]
    # Refine on the winning inlier set (fall back to all valid points if the
    # inlier set is degenerate — caller gates on n_inliers anyway).
    use = jnp.where(jnp.sum(inlier_mask) >= sample_size, inlier_mask, valid)
    rvec, tvec = pnp_refine(objp, uv_px, cal, rvec0, tvec0, valid=use,
                            iters=refine_iters)

    def recount(rv, tv):
        Pr = se3.from_rvec_tvec(rv, tv)
        proj_r, depth_r = cam_mod.project(objp, Pr, cal)
        err2_r = jnp.sum((proj_r - uv_px) ** 2, axis=-1)
        return (err2_r < reproj_threshold ** 2) & valid & (depth_r > 0)

    # Expand-and-re-refine: a minimal-set hypothesis is rough (its 2 px
    # band captures only part of the true inlier set), so one refine on
    # that partial set lands off the full-set optimum. Recount at the
    # refined pose and refine again on the grown set — the role of the
    # reference's follow-up cv2.solvePnP on the RANSAC inliers
    # (slam2.py:482-490), folded into this op.
    grown = recount(rvec, tvec)
    use2 = jnp.where(jnp.sum(grown) >= sample_size, grown, use)
    rvec, tvec = pnp_refine(objp, uv_px, cal, rvec, tvec, valid=use2,
                            iters=refine_iters)
    # cv2 reports inliers of the final model
    inlier_mask = recount(rvec, tvec)
    return rvec, tvec, inlier_mask, jnp.sum(inlier_mask)
