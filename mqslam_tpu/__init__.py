"""mqslam_tpu — TPU-native multi-quadrotor SLAM engine.

A brand-new JAX/XLA/Pallas framework (not a port) with the capabilities of the
reference pipeline Eliasvan/Multiple-Quadrotor-SLAM: geometry + triangulation
kernels, a jit-compiled keyframe visual-odometry front-end, a Schur-complement
Levenberg-Marquardt bundle-adjustment back-end over multi-camera factor graphs,
dataset/trajectory IO (TUM / PCD / BA_info wire formats), ATE/RPE evaluation,
and calibration math — sharded over TPU device meshes via shard_map/pjit.

Layering (bottom-up), mirroring SURVEY.md §7:
  core/      pure-jnp geometry: quaternions, SO(3), SE(3), cameras, distortion
  ops/       batched dense kernels: triangulation, features, optical flow,
             matching, robust estimation (RANSAC PnP / H / F), Pallas kernels
  io/        TUM trajectories, ASCII PCD, intrinsics, BA_info factor-graph dump
  frontend/  fixed-capacity jitted SLAM front-end (track table state machine)
  ba/        factor-graph bundle adjustment: LM + Schur complement on the MXU
  parallel/  mesh sharding of landmarks/keyframes/agents; collective assembly
  eval/      ATE / RPE / trajectory association and alignment
  calib/     camera calibration math (Zhang intrinsics, relative poses, E-matrix)
  studies/   synthetic benchmark studies (triangulation comparison)
  cli/       headless runner entry points
"""

__version__ = "0.1.0"
