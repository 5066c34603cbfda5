"""Factor residuals + autodiff Jacobians for the BA solver.

Residual conventions follow GTSAM's factors as used by the reference
back-end (reference: Work/SLAM/tools/bundle_adjustment/bundle_adjust.cpp:
289-309): GenericProjectionFactor over Cal3DS2 (pixel residual, isotropic
sigma), BetweenFactor<Pose3> (6-dof residual, diagonal sigmas ordered
rotation xyz then translation xyz — GenerateData.hpp:108-116), and priors.
The Between/prior rotation residual uses the SO(3) log of the rotation
discrepancy with the translation discrepancy taken directly (first-order
equivalent to Pose3::Logmap near zero error, where whitening happens).

Poses are cam-to-world (rvec, tvec) 6-vectors. Everything is vmapped +
jacfwd'd — analytic-Jacobian Pallas kernels can swap in later without
changing the solver.
"""

import jax
import jax.numpy as jnp

from mqslam_tpu.core import camera as cam_mod, so3
from mqslam_tpu.core.smallmat import matmul_small, matvec_small

__all__ = [
    "retract_single", "obs_residual", "obs_residual_jac",
    "odo_residual", "odo_residual_jac",
    "prior_pose_residual", "prior_pose_residual_jac",
]


def retract_single(pose6, delta6):
    """Manifold retraction: R' = R Exp(dr), c' = c + R dt (body-frame chart).

    GTSAM optimizes Pose3 through a local chart, not additive axis-angle
    coordinates; the chart matters for which basin LM lands in on weakly
    constrained chains. Returns (R' [3,3], c' [3]).
    """
    R = so3.exp(pose6[:3])
    Rn = matmul_small(R, so3.exp(delta6[:3]))
    c = pose6[3:] + matvec_small(R, delta6[3:])
    return Rn, c


def _obs_residual_single(delta6, pose6, point, uv, cal9, inv_sigma):
    """Whitened pixel reprojection residual [2] for one observation,
    evaluated at a body-frame pose increment delta6 (zeros at the
    linearization point)."""
    R, center = retract_single(pose6, delta6)   # cam-to-world
    Xc = matvec_small(R.T, point - center)      # world -> cam
    z = jnp.where(jnp.abs(Xc[2]) > 1e-9, Xc[2], 1e-9)
    xn = Xc[:2] / z
    cal = cam_mod.Cal3DS2.from_array(cal9)
    xd = cam_mod.distort_normalized(xn, cal)
    proj = cam_mod.denormalize_points(xd, cal)
    r = (proj - uv) * inv_sigma
    # behind-camera observations get a large but smooth residual via the
    # z-guard above; invalid factors are masked by the caller.
    return r


def _zeros6_like(pose6):
    return jnp.zeros_like(pose6)


def obs_residual(p6, pts, uv, cal, inv_sig):
    return jax.vmap(_obs_residual_single)(
        jnp.zeros_like(p6), p6, pts, uv, cal, inv_sig)


def obs_residual_jac(p6, pts, uv, cal, inv_sig):
    """Jacobians wrt (body-frame pose increment, point)."""
    return jax.vmap(jax.jacfwd(_obs_residual_single, argnums=(0, 2)))(
        jnp.zeros_like(p6), p6, pts, uv, cal, inv_sig)


def _odo_residual_single(df6, dt6, pose6_from, pose6_to, meas_r, meas_t,
                         inv_sigma6):
    """Whitened BetweenFactor residual [6]: rot log + translation delta."""
    Rf, cf = retract_single(pose6_from, df6)
    Rt, ct = retract_single(pose6_to, dt6)
    Rd = matmul_small(Rf.T, Rt)
    td = matvec_small(Rf.T, ct - cf)
    Rm = so3.exp(meas_r)
    r_rot = so3.log(matmul_small(Rm.T, Rd))
    r_tr = td - meas_t
    return jnp.concatenate([r_rot, r_tr]) * inv_sigma6


def odo_residual(p6f, p6t, meas_r, meas_t, inv_sig):
    z = jnp.zeros_like(p6f)
    return jax.vmap(_odo_residual_single)(z, z, p6f, p6t, meas_r, meas_t,
                                          inv_sig)


def odo_residual_jac(p6f, p6t, meas_r, meas_t, inv_sig):
    z = jnp.zeros_like(p6f)
    return jax.vmap(jax.jacfwd(_odo_residual_single, argnums=(0, 1)))(
        z, z, p6f, p6t, meas_r, meas_t, inv_sig)


def _prior_pose_residual_single(delta6, pose6, prior_r, prior_t, inv_sigma6):
    Rp = so3.exp(prior_r)
    R, c = retract_single(pose6, delta6)
    r_rot = so3.log(matmul_small(Rp.T, R))
    r_tr = c - prior_t
    return jnp.concatenate([r_rot, r_tr]) * inv_sigma6


def prior_pose_residual(p6, prior_r, prior_t, inv_sig):
    return jax.vmap(_prior_pose_residual_single)(
        jnp.zeros_like(p6), p6, prior_r, prior_t, inv_sig)


def prior_pose_residual_jac(p6, prior_r, prior_t, inv_sig):
    return jax.vmap(jax.jacfwd(_prior_pose_residual_single, argnums=0))(
        jnp.zeros_like(p6), p6, prior_r, prior_t, inv_sig)
