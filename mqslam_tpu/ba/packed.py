"""Packed dual-layout observation structure for the large-scale CG path.

The matrix-free Schur/PCG applies in ba/solver.py address observations
through ``v[obs_pose]`` gathers and ``segment_sum`` scatter-adds.  On TPU
those run at gather/scatter-engine speed: at corridor scale (F=2048,
O=370k) one CG iteration measured ~15 ms against a ~0.2 ms HBM-bandwidth
bound — 75x off speed-of-light (prof_ba5.py).

Measured on a v5e core (scan-slope, 2026-08; corridor scenario,
25-iteration CG budget):

  F=512,  O=92k:   COO 2.86 ms/CG-iter -> packed 0.49 ms  (5.8x)
  F=2048, O=370k:  COO 15.0 ms/CG-iter -> packed 2.43 ms  (6.2x)
  F=2048, round 5: 2.43 -> 1.96 (per-pose Gram collapse,
          solver.pack_jacobians) -> **1.27 ms** (pack-row W^T gather,
          ChunkedGather below) = 785 CG iterations/s

SUPERSEDED as the single-device default by the run-major BANDED grid
(ba/banded.py): exploiting that observation runs are consecutive poses
turns both W legs into dense shifted einsums with ZERO gathers —
measured 0.146 ms/CG-iter at F=2048/O=370k (6855 iters/s, 8.5x this
module's floor, at its HBM bound).  This packed layout remains the
fallback for observation structures the grid refuses and the basis of
the SHARDED path (ShardedPackedLayout below).

Round-5 measured byte/time accounting of the 1.27 ms iteration at
F=2048/O=370k (prof_ba7/ba11 slope; v5e HBM ~819 GB/s):

  hcc leg   G_f @ v_f            ~0.01 ms   0.3 MB   (was 2 reads of the
                                            18.6 MB Jp_f table, ~0.5 ms,
                                            before the Gram collapse)
  wt  leg   pack-row gather      ~0.15 ms   49k flat 192 B rows (was the
            + Jp_p/Jt_p einsums             plain [P, Kp]=393k-row
                                            gather, ~1.0 ms)
  w   leg   u[pid_f] gather      ~1.0  ms   [F, Kf]=387k rows x 12 B
            + Jt_f/Jp_f einsums  ~0.05 ms   28 MB
  Hpp solve + CG vector ops      ~0.05 ms

The state-vector row-gathers dominate: the TPU gather engine moves
~0.4M rows/ms regardless of row width (6- vs 8-float rows measured
identical), so the cost is row COUNT.  The point-major fid_p table is
runs of consecutive pose ids (a landmark is observed by consecutive
frames), so ChunkedGather fetches each 8-slot run as ONE flat row of
the sliding pack B[i] = v[i:i+8] — 8x fewer rows.  Hard-won lowering
facts (prof_ba8-11): the same rows gathered as 3D [G, d] slices hit a
~25x slower XLA path (gather FLAT 2D rows and reshape after); a
remainder SCATTER of even 1.1k rows costs ~1.1 ms (broken chunks get
prebuilt extension rows in the pack table instead — zero scatters);
re-packing the ragged pose-major pid_f table run-aligned inflates
Kf 189->272 / Kp 8->16 and the einsum legs pay more than the gather
saves (measured 4.7 ms end-to-end); and a windowed one-hot MXU-matmul
selection is also slower than the plain gather (1.37 vs 1.02 ms/leg —
batching overhead + 200 MB of constants).  The pose-major w leg
therefore keeps the plain gather (its ~24% broken chunks fail the
build threshold) and is the documented remaining floor.  One-time per
linearization: pack ~31 ms (both Jacobians in both layouts + the Gram),
preconditioner ~5 ms — a few CG iterations' worth against the
150-1000-iteration budgets real solves use.

This module converts the COO observation lists into two dense padded
layouts, built once per problem (host NumPy, static shapes):

  pose-major:  slot [F, Kf] — every pose's observations in its own row
  point-major: slot [P, Kp] — every landmark's observations in its row

plus per-slot ids of the OTHER variable (pid_f / fid_p).  The solver
packs the per-observation Jacobians into [F, Kf, ...] / [P, Kp, ...]
arrays ONCE per linearization (both Jacobians in both layouts); each CG
matvec is then pure dense einsums + gathers of the small replicated
[F, 6]/[P, 3] state vectors — no scatter and no per-observation
permutation at all.  Padding slots point at an appended zero row, so
they contribute nothing.

Role model: the reference's one true parallel kernel is an OpenMP loop
over landmarks (reference: Work/python_libs/triangulation_c/
triangulation.c:70,109); this is the same data-parallel idea expressed as
a TPU-friendly dense layout.
"""

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["PackedLayout", "build_packed_layout",
           "ShardedPackedLayout", "build_sharded_packed_layout",
           "ChunkedGather", "build_chunked_gather", "apply_chunked"]


@jax.tree_util.register_pytree_node_class
class ChunkedGather:
    """Sliding-pack formulation of a near-run id-table gather.

    The CG hot loop's state gathers are row-COUNT bound (~0.4M rows/ms on
    a v5e regardless of row width), and BA id tables are mostly runs of
    consecutive ids.  When a G-slot chunk's ids are ``base, base+1, ...``
    the whole chunk is ONE row of the sliding pack ``B[i] = v[i:i+G]``
    gathered as a FLAT 2D row (the [G, d] 3D-slice form lowers to a
    ~25x slower path, prof_ba8) — measured on the corridor fid_p table
    (point-major rows are single runs up to obs dropouts, ~1% broken
    chunks): the composed W^T leg drops 1.06 -> 0.15 ms (prof_ba9/11).
    Broken (non-run) chunks get prebuilt EXTENSION rows appended to the
    pack table — built by a tiny per-slot gather, merged by the same
    single chunk gather, zero scatters (a 1.1k-row remainder scatter
    measured ~1.1 ms, prof_ba10).  Ragged tables (the corridor pid_f
    rows have ~24% broken chunks) don't build and keep the plain
    gather — both re-packing them run-aligned (table inflation) and
    carrying many extension rows (2.27 ms leg) measured net losses."""

    def __init__(self, chunk_src, chunk_len, ext_ids, n_src, G, rows, K):
        self.chunk_src = chunk_src  # [R, Kpad/G] int32: run base, or
                                    #   n_src+1+j for broken chunk j, or
                                    #   n_src (all-sentinel -> zero row)
        self.chunk_len = chunk_len  # [R, Kpad/G] int32 valid run length
        self.ext_ids = ext_ids      # [NB, G] int32 per-slot ids of the
                                    #   broken chunks (sentinel = n_src)
        self.n_src = n_src          # source vector length (static)
        self.G = G                  # chunk width (static)
        self.rows = rows            # table rows (static)
        self.K = K                  # table cols (static)

    def tree_flatten(self):
        return ((self.chunk_src, self.chunk_len, self.ext_ids),
                (self.n_src, self.G, self.rows, self.K))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def build_chunked_gather(ids, n_src: int, G: int = 8,
                         max_broken_frac: float = 0.05):
    """ChunkedGather for an id table [rows, K] (sentinel >= n_src), or
    None when too many chunks are broken (non-run) for the extension
    rows to pay."""
    ids = np.asarray(ids, dtype=np.int64)
    rows, K = ids.shape
    Kpad = -(-K // G) * G
    t = np.full((rows, Kpad), n_src, np.int64)
    t[:, :K] = ids
    ch = t.reshape(-1, G)
    valid = ch < n_src
    base = ch[:, 0]
    expect = base[:, None] + np.arange(G)[None, :]
    run = np.cumprod((ch == expect) & valid, axis=1).astype(bool)
    length = run.sum(axis=1)
    # a chunk is a run iff every valid slot is in the prefix run
    ok = (base < n_src) & ~(valid & ~run).any(axis=1)
    broken = valid.any(axis=1) & ~ok
    nb = int(broken.sum())
    if nb > max_broken_frac * max(len(ch), 1):
        return None
    bidx = np.flatnonzero(broken)
    chunk_src = np.where(ok, base, n_src)
    chunk_src[bidx] = n_src + 1 + np.arange(nb)
    # broken chunks pass the length mask whole: their extension rows
    # already carry zeros at sentinel slots
    chunk_len = np.where(ok, length, 0)
    chunk_len[bidx] = G
    return ChunkedGather(
        chunk_src=jnp.asarray(chunk_src.reshape(rows, Kpad // G),
                              jnp.int32),
        chunk_len=jnp.asarray(chunk_len.reshape(rows, Kpad // G),
                              jnp.int32),
        ext_ids=jnp.asarray(ch[bidx], jnp.int32),
        n_src=n_src, G=G, rows=rows, K=K)


def apply_chunked(cg: ChunkedGather, v):
    """v [n_src, d] -> gathered [rows, K, d] == v-padded[ids] with zeros
    at sentinel slots.  Run chunks read one FLAT pack-table row; broken
    chunks read their prebuilt extension row (a tiny per-slot gather) —
    zero scatters anywhere (a 1.1k-row remainder scatter measured ~1.1 ms
    on a v5e, wiping out the gather win; prof_ba10)."""
    d = v.shape[1]
    G = cg.G
    vp = jnp.concatenate([v, jnp.zeros((2 * G, d), v.dtype)])
    # B[i] = v_pad[i : i + G] flattened to 2D; row n_src is all zeros
    B = jnp.stack([jax.lax.slice_in_dim(vp, g, g + cg.n_src + 1, 1, 0)
                   for g in range(G)], axis=1).reshape(-1, G * d)
    if cg.ext_ids.shape[0]:
        ext = vp[cg.ext_ids.reshape(-1)].reshape(-1, G * d)
        B = jnp.concatenate([B, ext])
    out = B[cg.chunk_src]                          # [R, Kpad/G, G*d]
    out = out.reshape(cg.chunk_src.shape + (G, d))
    mask = (jnp.arange(G)[None, None, :]
            < cg.chunk_len[:, :, None]).astype(v.dtype)
    out = (out * mask[..., None]).reshape(cg.rows, -1, d)
    return out[:, :cg.K]


class PackedLayout(NamedTuple):
    """Index structure; all entries int32, sentinels point past the end.

    ``pid_f``/``fid_p`` carry the OTHER variable's id per slot: cross-layout
    products gather the small replicated [F, 6]/[P, 3] vectors through them
    instead of permuting flat per-observation tensors between the layouts —
    the earlier idx_pm2f/idx_f2pm [O, 2]-row permutation gathers were the
    dominant CG-iteration cost at corridor scale (the ``w`` leg alone
    ~3.3 ms of a 3.98 ms iteration at F=2048)."""
    fslot: jnp.ndarray      # [F, Kf] flat obs index (sentinel = O)
    pslot: jnp.ndarray      # [P, Kp] flat obs index (sentinel = O)
    pid_f: jnp.ndarray      # [F, Kf] landmark id per pose-major slot
                            #         (sentinel = P: callers pad with a
                            #         zero block)
    fid_p: jnp.ndarray      # [P, Kp] pose id per point-major slot
                            #         (sentinel = F)
    wg_fid: Optional[ChunkedGather] = None  # pack-row form of v[fid_p]
    wg_pid: Optional[ChunkedGather] = None  # pack-row form of u[pid_f]

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
    if len(sel) == 0:
        # no valid observations: nothing to pack (and the pid_f build
        # below would index an empty array) — COO handles the empty case
        return None
    fslot, _, Kf = _slot_table(op, sel, n_poses, O)
    pslot, _, Kp = _slot_table(opt, sel, n_points, O)
    n_obs = max(len(sel), 1)
    if n_poses * Kf > max_ratio * n_obs or n_points * Kp > max_ratio * n_obs:
        return None
    pid_f = np.where(fslot < O, opt[np.minimum(fslot, O - 1)], n_points)
    fid_p = np.where(pslot < O, op[np.minimum(pslot, O - 1)], n_poses)
    i32 = lambda a: jnp.asarray(a, jnp.int32)
    return PackedLayout(fslot=i32(fslot), pslot=i32(pslot),
                        pid_f=i32(pid_f), fid_p=i32(fid_p),
                        wg_fid=build_chunked_gather(fid_p, n_poses),
                        wg_pid=build_chunked_gather(pid_f, n_points))


class ShardedPackedLayout(NamedTuple):
    """Per-device compact packed layout, stacked on a leading shard axis.

    Each device holds the observation slice ``[d*per, (d+1)*per)`` of the
    (padded) COO arrays; its tables cover only the poses/landmarks that
    slice touches, addressed through row maps — so per-device dense matvec
    work genuinely scales 1/D instead of re-reading F/P mostly-empty rows.
    Inside shard_map the leading axis is 1 (this device's block); squeeze
    it and the slot indices are LOCAL to the device's obs slice (sentinel
    = per-device slice length).  Partial [Fd, 6]/[Pd, 3] results scatter
    through ``rows_f``/``rows_p`` into global vectors and psum over the
    mesh axis (see ba.solver._packed_ops_rows).
    """
    fslot: jnp.ndarray      # [D, Fd, Kf] local obs index (sentinel = per)
    pslot: jnp.ndarray      # [D, Pd, Kp] local obs index (sentinel = per)
    pid_f: jnp.ndarray      # [D, Fd, Kf] GLOBAL landmark id (sentinel = P)
    fid_p: jnp.ndarray      # [D, Pd, Kp] GLOBAL pose id (sentinel = F)
    rows_f: jnp.ndarray     # [D, Fd] global pose id per row (sentinel = F)
    rows_p: jnp.ndarray     # [D, Pd] global landmark id (sentinel = P)


def _shard_tables(op, opt, ov, n_poses, n_points, lo, hi):
    """One shard's compact dual layout over its [lo, hi) obs slice.

    All slot indices local to the slice; rows_* map local rows to global
    pose/landmark ids."""
    per = hi - lo
    sel = np.nonzero(ov[lo:hi])[0]           # local indices
    op_l = op[lo:hi]
    opt_l = opt[lo:hi]
    rows_f, op_row = np.unique(op_l[sel], return_inverse=True) \
        if len(sel) else (np.zeros(0, np.int64), np.zeros(0, np.int64))
    rows_p, opt_row = np.unique(opt_l[sel], return_inverse=True) \
        if len(sel) else (np.zeros(0, np.int64), np.zeros(0, np.int64))
    # slot tables over local rows
    op_rows = np.zeros(per, np.int64)
    op_rows[sel] = op_row
    opt_rows = np.zeros(per, np.int64)
    opt_rows[sel] = opt_row
    fslot, _, Kf = _slot_table(op_rows, sel, max(len(rows_f), 1), per)
    pslot, _, Kp = _slot_table(opt_rows, sel, max(len(rows_p), 1), per)
    pid_f = np.where(fslot < per,
                     opt_l[np.minimum(fslot, max(per - 1, 0))], n_points)
    fid_p = np.where(pslot < per,
                     op_l[np.minimum(pslot, max(per - 1, 0))], n_poses)
    return dict(fslot=fslot, pslot=pslot, pid_f=pid_f, fid_p=fid_p,
                rows_f=rows_f, rows_p=rows_p, Kf=Kf, Kp=Kp, per=per)


def build_sharded_packed_layout(obs_pose, obs_point, obs_valid,
                                n_poses: int, n_points: int, n_shards: int,
                                max_ratio: float = 6.0):
    """Build per-shard compact layouts for obs arrays pre-padded to a
    multiple of ``n_shards`` (parallel.shard_problem_for_mesh's split).

    Returns a ShardedPackedLayout with uniform per-shard table sizes
    (padded to the max across shards), or None when there are no valid
    observations or the padded tables would exceed ``max_ratio`` x the raw
    observation count (degenerate distributions: fall back to COO).
    """
    op = np.asarray(obs_pose, dtype=np.int64)
    opt = np.asarray(obs_point, dtype=np.int64)
    ov = np.asarray(obs_valid, dtype=bool)
    O = len(op)
    if O % n_shards != 0:
        return None
    n_valid = int(ov.sum())
    if n_valid == 0:
        return None
    per = O // n_shards
    shards = [_shard_tables(op, opt, ov, n_poses, n_points,
                            d * per, (d + 1) * per)
              for d in range(n_shards)]
    Fd = max(max(len(s["rows_f"]) for s in shards), 1)
    Pd = max(max(len(s["rows_p"]) for s in shards), 1)
    Kf = max(s["Kf"] for s in shards)
    Kp = max(s["Kp"] for s in shards)
    if n_shards * (Fd * Kf + Pd * Kp) > max_ratio * n_valid:
        return None

    def stack(key, rows, K, sent):
        out = np.full((n_shards, rows, K), sent, dtype=np.int64)
        for d, s in enumerate(shards):
            t = s[key]
            out[d, :t.shape[0], :t.shape[1]] = t
        return out

    def stack_rows(key, rows, sent):
        out = np.full((n_shards, rows), sent, dtype=np.int64)
        for d, s in enumerate(shards):
            out[d, :len(s[key])] = s[key]
        return out

    i32 = lambda a: jnp.asarray(a, jnp.int32)
    return ShardedPackedLayout(
        fslot=i32(stack("fslot", Fd, Kf, per)),
        pslot=i32(stack("pslot", Pd, Kp, per)),
        pid_f=i32(stack("pid_f", Fd, Kf, n_points)),
        fid_p=i32(stack("fid_p", Pd, Kp, n_poses)),
        rows_f=i32(stack_rows("rows_f", Fd, n_poses)),
        rows_p=i32(stack_rows("rows_p", Pd, n_points)))
