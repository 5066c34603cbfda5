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
    "obs_residual", "obs_residual_jac", "odo_residual", "odo_residual_jac",
    "prior_pose_residual", "prior_pose_residual_jac",
]


def _obs_residual_single(pose6, point, uv, cal9, inv_sigma):
    """Whitened pixel reprojection residual [2] for one observation."""
    rvec, center = pose6[:3], pose6[3:]
    R = so3.exp(rvec)                       # cam-to-world
    Xc = matvec_small(R.T, point - center)  # world -> cam
    z = jnp.where(jnp.abs(Xc[2]) > 1e-9, Xc[2], 1e-9)
    xn = Xc[:2] / z
    cal = cam_mod.Cal3DS2.from_array(cal9)
    xd = cam_mod.distort_normalized(xn, cal)
    proj = cam_mod.denormalize_points(xd, cal)
    r = (proj - uv) * inv_sigma
    # behind-camera observations get a large but smooth residual via the
    # z-guard above; invalid factors are masked by the caller.
    return r


obs_residual = jax.vmap(_obs_residual_single)
obs_residual_jac = jax.vmap(jax.jacfwd(_obs_residual_single,
                                       argnums=(0, 1)))


def _odo_residual_single(pose6_from, pose6_to, meas_r, meas_t, inv_sigma6):
    """Whitened BetweenFactor residual [6]: rot log + translation delta."""
    Rf = so3.exp(pose6_from[:3])
    Rt = so3.exp(pose6_to[:3])
    Rd = matmul_small(Rf.T, Rt)
    td = matvec_small(Rf.T, pose6_to[3:] - pose6_from[3:])
    Rm = so3.exp(meas_r)
    r_rot = so3.log(matmul_small(Rm.T, Rd))
    r_tr = td - meas_t
    return jnp.concatenate([r_rot, r_tr]) * inv_sigma6


odo_residual = jax.vmap(_odo_residual_single)
odo_residual_jac = jax.vmap(jax.jacfwd(_odo_residual_single,
                                       argnums=(0, 1)))


def _prior_pose_residual_single(pose6, prior_r, prior_t, inv_sigma6):
    Rp = so3.exp(prior_r)
    R = so3.exp(pose6[:3])
    r_rot = so3.log(matmul_small(Rp.T, R))
    r_tr = pose6[3:] - prior_t
    return jnp.concatenate([r_rot, r_tr]) * inv_sigma6


prior_pose_residual = jax.vmap(_prior_pose_residual_single)
prior_pose_residual_jac = jax.vmap(jax.jacfwd(_prior_pose_residual_single,
                                              argnums=0))
