"""Scale-aware trajectory/map alignment for monocular outputs.

Semantics of the reference's anchored quat+scale+translation transform
(reference: Work/python_libs/dataset_tools.py:297-409 and its use in
Work/SLAM/tools/align_traj_and_map_to_groundtruth.py:60-95): the transform is
anchored at one matched pose (not least-squares over the whole trajectory),
with the scale inferred from the motion between two moments.
"""

import numpy as np

import jax.numpy as jnp

from mqslam_tpu.core import quat as quat_mod

__all__ = ["transform_between_trajectories", "transform_points",
           "transform_trajectory"]


def _closest(array, element):
    if abs(element) != float("inf"):
        return int(np.abs(np.asarray(array) - element).argmin())
    return len(array) - 1 if element > 0 else 0


def transform_between_trajectories(traj_from, traj_to, at_frame=1,
                                   at_time=None, infer_scale=True,
                                   offset_frames=None,
                                   offset_time=float("inf")):
    """(delta_quaternion, delta_scale, delta_location) mapping traj_from onto
    traj_to (dataset_tools.py:297-379)."""
    ts_from, locs_from, quats_from = traj_from
    ts_to, locs_to, quats_to = traj_to
    if not len(ts_from) or not len(ts_to):
        return np.array([0.0, 0.0, 0.0, 1.0]), 1.0, np.zeros(3)

    if at_frame is not None:
        at_to = max(0, min(at_frame - 1, len(ts_to) - 1))
    else:
        at_to = _closest(ts_to, at_time)
    at_from = _closest(ts_from, ts_to[at_to])
    at_to = _closest(ts_to, ts_from[at_from])
    at_time = ts_to[at_to]

    dq = np.asarray(quat_mod.mult(
        jnp.asarray(quats_to[at_to]),
        quat_mod.inv(jnp.asarray(quats_from[at_from]))))
    loc_from = locs_from[at_from]
    loc_to = locs_to[at_to]

    scale = 1.0
    if infer_scale:
        if offset_frames is not None:
            snd_to = max(0, min(at_to + offset_frames, len(ts_to) - 1))
        else:
            snd_to = _closest(ts_to, at_time + offset_time)
        snd_from = _closest(ts_from, ts_to[snd_to])
        snd_to = _closest(ts_to, ts_from[snd_from])
        v_from = np.asarray(quat_mod.apply_to_point(
            jnp.asarray(dq), jnp.asarray(locs_from[snd_from] - loc_from)))
        v_to = locs_to[snd_to] - locs_to[at_to]
        denom = float(v_from @ v_from)
        if denom != 0.0:
            scale = float(v_from @ v_to) / denom

    d_loc = loc_to - scale * np.asarray(
        quat_mod.apply_to_point(jnp.asarray(dq), jnp.asarray(loc_from)))
    return dq, scale, d_loc


def transform_points(points, transformation):
    """Apply (dq, scale, dloc) to points [n, 3] (dataset_tools.py:382-392)."""
    dq, scale, dloc = transformation
    rotated = np.asarray(quat_mod.apply_to_point(
        jnp.asarray(dq), jnp.asarray(np.asarray(points, dtype=np.float64))))
    return dloc + scale * rotated


def transform_trajectory(traj, transformation):
    """Apply (dq, scale, dloc) to a CamTrajectory
    (dataset_tools.py:395-409)."""
    from mqslam_tpu.io import tum
    dq, scale, dloc = transformation
    locs = transform_points(traj.locations, transformation)
    quats = np.asarray(quat_mod.mult(jnp.asarray(dq),
                                     jnp.asarray(traj.quaternions)))
    return tum.CamTrajectory(np.asarray(traj.timestamps), locs, quats)
