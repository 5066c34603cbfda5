"""Relative pose error over pose pairs.

Semantics of the TUM benchmark tool (reference: Work/SLAM/tools/
tum_benchmark_tools/evaluate_rpe.py:204-297): for pose pairs (i, j) separated
by a fixed delta (seconds / frames / meters / radians) or drawn at random,
the error motion is E = (Q_i^-1 Q_j)^-1 (P_i^-1 P_j) with translational
component |trans(E)| and rotational component angle(E).
"""

from typing import NamedTuple

import numpy as np

from mqslam_tpu.eval.associate import associate_arrays

__all__ = ["RpeResult", "evaluate_rpe"]


class RpeResult(NamedTuple):
    trans_rmse: float
    trans_mean: float
    trans_median: float
    rot_rmse: float            # radians
    rot_mean: float
    rot_median: float
    n_pairs: int
    trans_errors: np.ndarray
    rot_errors: np.ndarray


def _poses44(traj):
    """CamTrajectory -> [n, 4, 4] cam-to-world matrices
    (evaluate_rpe.py:48-72 transform44)."""
    from mqslam_tpu.io import tum
    return tum.extrinsics_from_trajectory(traj), None


def _se3_of(traj):
    import jax.numpy as jnp
    from mqslam_tpu.core import quat, se3
    Rcw = np.asarray(quat.to_matrix(quat.normalize(
        jnp.asarray(traj.quaternions))))
    out = np.tile(np.eye(4), (len(traj.timestamps), 1, 1))
    out[:, :3, :3] = Rcw
    out[:, :3, 3] = traj.locations
    return out


def evaluate_rpe(traj_est, traj_gt, fixed_delta=True, delta=1.0,
                 delta_unit="f", max_pairs=10000, max_difference=0.02,
                 seed=0) -> RpeResult:
    """RPE between two CamTrajectory tuples.

    delta_unit: 'f' frames, 's' seconds (evaluate_rpe.py:204-249 subset —
    'm'/'rad' distance-parameterized deltas can be added when needed).
    """
    matches = associate_arrays(traj_est.timestamps, traj_gt.timestamps,
                               0.0, max_difference)
    if len(matches) < 2:
        raise ValueError("Too few matched poses for RPE.")
    i1 = [i for i, _ in matches]
    i2 = [j for _, j in matches]
    est_sub = type(traj_est)(traj_est.timestamps[i1],
                             traj_est.locations[i1],
                             traj_est.quaternions[i1])
    gt_sub = type(traj_gt)(traj_gt.timestamps[i2], traj_gt.locations[i2],
                           traj_gt.quaternions[i2])
    P = _se3_of(est_sub)   # cam-to-world
    Q = _se3_of(gt_sub)
    n = len(P)
    ts = est_sub.timestamps

    pairs = []
    if fixed_delta:
        for i in range(n):
            if delta_unit == "f":
                j = i + int(delta)
                if j < n:
                    pairs.append((i, j))
            elif delta_unit == "s":
                j = int(np.searchsorted(ts, ts[i] + delta))
                if j < n and abs((ts[j] - ts[i]) - delta) < max_difference:
                    pairs.append((i, j))
            else:
                raise ValueError(f"delta_unit {delta_unit!r} not supported")
    else:
        rng = np.random.RandomState(seed)
        pairs = list(zip(rng.randint(0, n, max_pairs),
                         rng.randint(0, n, max_pairs)))
    if not pairs:
        raise ValueError("No pose pairs for the requested delta.")

    te, re = [], []
    for i, j in pairs:
        E = (np.linalg.inv(np.linalg.inv(Q[i]) @ Q[j])
             @ (np.linalg.inv(P[i]) @ P[j]))
        te.append(np.linalg.norm(E[:3, 3]))
        re.append(np.arccos(np.clip((np.trace(E[:3, :3]) - 1) / 2, -1, 1)))
    te = np.asarray(te)
    re = np.asarray(re)
    return RpeResult(
        trans_rmse=float(np.sqrt(np.mean(te ** 2))),
        trans_mean=float(np.mean(te)),
        trans_median=float(np.median(te)),
        rot_rmse=float(np.sqrt(np.mean(re ** 2))),
        rot_mean=float(np.mean(re)),
        rot_median=float(np.median(re)),
        n_pairs=len(pairs),
        trans_errors=te, rot_errors=re)
