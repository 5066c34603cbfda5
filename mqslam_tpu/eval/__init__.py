"""Trajectory evaluation: association, ATE, RPE, sim(3)-style alignment."""

from mqslam_tpu.eval import associate, ate, rpe, alignment  # noqa: F401
