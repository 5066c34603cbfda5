"""Pure-jnp geometry core: quaternions, SO(3), SE(3), cameras, distortion.

Everything in this package is shape-polymorphic over leading batch dimensions,
jit-safe (no data-dependent Python control flow) and differentiable.
"""

from mqslam_tpu.core import quat, so3, se3, camera  # noqa: F401
