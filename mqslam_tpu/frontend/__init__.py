"""Keyframe visual-odometry front-end: jit-compiled track-table state machine.

The reference's slam2.py re-expressed TPU-first: instead of Python sets and
index rebasing over variable-length arrays (slam2.py:290-352), the tracker
holds a fixed-capacity track table (slots + masks) and one jitted `step`
per frame; the host loop only does image IO and BA-info bookkeeping.
"""

from mqslam_tpu.frontend.tracker import (  # noqa: F401
    TrackerConfig, TrackerState, StepOutput, make_step, bootstrap,
)
