"""Bundle adjustment: factor-graph LM with Schur-complement reduction.

Replaces the reference's GTSAM back-end (reference: Work/SLAM/tools/
bundle_adjustment/bundle_adjust.cpp) with a TPU-native solver: projection /
between / prior factors over Cal3DS2 cameras, damped Gauss-Newton where the
landmarks are marginalized by a *matrix-free* Schur complement and the
reduced camera system is solved with preconditioned CG — every operator
application is gathers + elementwise factor math + segment-sums, which is
exactly the shape that shards over a device mesh (landmark/observation
blocks per device, psum for the reductions).
"""

from mqslam_tpu.ba.problem import BAProblem, problem_from_ba_data  # noqa: F401
from mqslam_tpu.ba.solver import ba_solve, lm_solve  # noqa: F401
