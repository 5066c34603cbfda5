"""Packed dual-layout observation structure for the large-scale CG path.

The matrix-free Schur/PCG applies in ba/solver.py address observations
through ``v[obs_pose]`` gathers and ``segment_sum`` scatter-adds.  On TPU
those run at gather/scatter-engine speed: at corridor scale (F=2048,
O=370k) one CG iteration measured ~15 ms against a ~0.2 ms HBM-bandwidth
bound — 75x off speed-of-light (prof_ba5.py).

This module converts the COO observation lists into two dense padded
layouts, built once per problem (host NumPy, static shapes):

  pose-major:  slot [F, Kf] — every pose's observations in its own row
  point-major: slot [P, Kp] — every landmark's observations in its row

plus the cross-permutations between the two flat slot spaces.  The solver
packs the per-observation Jacobians into [F, Kf, ...] / [P, Kp, ...]
arrays ONCE per linearization; each CG matvec is then pure dense
einsums + a single [O, 2]-row permutation gather — no scatter at all.
Padding slots point at an appended zero row, so they contribute nothing.

Role model: the reference's one true parallel kernel is an OpenMP loop
over landmarks (reference: Work/python_libs/triangulation_c/
triangulation.c:70,109); this is the same data-parallel idea expressed as
a TPU-friendly dense layout.
"""

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

__all__ = ["PackedLayout", "build_packed_layout"]


class PackedLayout(NamedTuple):
    """Index structure; all entries int32, sentinels point past the end."""
    fslot: jnp.ndarray      # [F, Kf] flat obs index (sentinel = O)
    pslot: jnp.ndarray      # [P, Kp] flat obs index (sentinel = O)
    idx_pm2f: jnp.ndarray   # [P, Kp] pose-major flat slot of the same obs
                            #         (sentinel = F * Kf)
    idx_f2pm: jnp.ndarray   # [F, Kf] point-major flat slot of the same obs
                            #         (sentinel = P * Kp)
    pid_f: jnp.ndarray      # [F, Kf] landmark id per pose-major slot
                            #         (sentinel = P: callers pad with a
                            #         zero block)

    @property
    def Kf(self):
        return self.fslot.shape[1]

    @property
    def Kp(self):
        return self.pslot.shape[1]


def _slot_table(ids, sel, n_rows, O):
    """[n_rows, K] table of flat obs indices grouped by ids[sel]; also the
    inverse map obs -> flat slot (sentinel n_rows * K for absent obs)."""
    order = np.argsort(ids[sel], kind="stable")
    flat = sel[order]
    grp = ids[flat]
    counts = np.bincount(grp, minlength=n_rows)
    K = max(int(counts.max()) if len(flat) else 0, 1)
    # position within the group: running index minus group start
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(len(flat)) - starts[grp]
    table = np.full((n_rows, K), O, dtype=np.int64)
    table[grp, pos] = flat
    inv = np.full(O + 1, n_rows * K, dtype=np.int64)
    inv[flat] = grp * K + pos
    return table, inv, K


def build_packed_layout(obs_pose, obs_point, obs_valid, n_poses: int,
                        n_points: int, max_ratio: float = 6.0):
    """Build the dual layout, or return None when padding would blow up.

    ``max_ratio`` guards degenerate distributions (one pose holding most
    observations would make [F, Kf] quadratic): the packed tables must
    stay within ``max_ratio`` times the raw observation count.
    """
    op = np.asarray(obs_pose, dtype=np.int64)
    opt = np.asarray(obs_point, dtype=np.int64)
    ov = np.asarray(obs_valid, dtype=bool)
    O = len(op)
    sel = np.nonzero(ov)[0]
    fslot, inv_f, Kf = _slot_table(op, sel, n_poses, O)
    pslot, inv_p, Kp = _slot_table(opt, sel, n_points, O)
    n_obs = max(len(sel), 1)
    if n_poses * Kf > max_ratio * n_obs or n_points * Kp > max_ratio * n_obs:
        return None
    # cross-permutations: follow slot -> obs -> other layout's slot
    idx_pm2f = inv_f[pslot]                      # [P, Kp]
    idx_f2pm = inv_p[fslot]                      # [F, Kf]
    pid_f = np.where(fslot < O, opt[np.minimum(fslot, O - 1)], n_points)
    i32 = lambda a: jnp.asarray(a, jnp.int32)
    return PackedLayout(fslot=i32(fslot), pslot=i32(pslot),
                        idx_pm2f=i32(idx_pm2f), idx_f2pm=i32(idx_f2pm),
                        pid_f=i32(pid_f))
