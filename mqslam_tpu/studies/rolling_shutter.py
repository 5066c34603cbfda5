"""Rolling-shutter feature-jitter statistics over a static-scene sequence.

Python/JAX equivalent of the reference's Octave study
(reference: Work/ARDrone2_tests/rolling_shutter_analysis/
rolling_shutter_statistics.m): track features through a sequence of a static
scene shot from a (nominally) static camera, remove each track's mean, and
classify tracks by their max absolute deviation — the <=0.5 px class's
spread is where the reference's sigma = 0.8 px observation-noise default
came from (triangulation_comparison.py:277).
"""

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

__all__ = ["RollingShutterStats", "analyze_sequence", "classify_tracks"]


class RollingShutterStats(NamedTuple):
    deviations_x: np.ndarray  # [frames, tracks] mean-removed x
    deviations_y: np.ndarray
    classes: dict             # name -> track index array
    stds: dict                # name -> std of x deviations in that class


def classify_tracks(dev_x, dev_y):
    """The reference's deviation classes (rolling_shutter_statistics.m:55-62):
    0 / <=0.5 px / <=1 px / <=3 px / >3 px (bad tracks)."""
    ax = np.abs(dev_x)
    ay = np.abs(dev_y)
    mx = ax.max(axis=0)
    classes = {
        "zero": np.flatnonzero(mx == 0),
        "half": np.flatnonzero((mx > 0) & (mx <= 0.5)),
        "one": np.flatnonzero((mx > 0.5) & (mx <= 1.0)),
        "three": np.flatnonzero((mx > 1.0) & (mx <= 3.0)),
        "bad": np.flatnonzero((ax.max(axis=0) > 3.0)
                              & (ay.max(axis=0) > 3.0)),
    }
    stds = {}
    for name, idx in classes.items():
        stds[name] = float(dev_x[:, idx].std()) if len(idx) else 0.0
    return classes, stds


def analyze_sequence(images, max_tracks: int = 256,
                     detect_cell: int = 12) -> RollingShutterStats:
    """Detect features in frame 0, LK-track through all frames, return
    mean-removed deviations + the deviation classification."""
    from mqslam_tpu.ops import features, lk

    images = [jnp.asarray(np.asarray(im, dtype=np.float32))
              for im in images]
    uv0, valid = features.detect_corners(images[0], max_corners=max_tracks,
                                         cell=detect_cell)
    alive = np.asarray(valid)
    pts = np.asarray(uv0)
    positions = [pts.copy()]
    cur = jnp.asarray(pts)
    for prev, nxt in zip(images[:-1], images[1:]):
        cur, st, err = lk.lk_track(prev, nxt, cur, jnp.asarray(alive))
        alive = alive & np.asarray(st)
        positions.append(np.asarray(cur))
    traj = np.stack(positions)  # [frames, tracks, 2]
    traj = traj[:, alive]
    dev = traj - traj.mean(axis=0, keepdims=True)
    classes, stds = classify_tracks(dev[..., 0], dev[..., 1])
    return RollingShutterStats(dev[..., 0], dev[..., 1], classes, stds)
