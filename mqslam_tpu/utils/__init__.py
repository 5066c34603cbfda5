"""Small shared utilities: timers, config helpers."""

from mqslam_tpu.utils.profiling import Timer, timers  # noqa: F401
