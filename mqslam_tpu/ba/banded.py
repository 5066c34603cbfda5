"""Run-major BANDED observation layout: a gather-free Schur-CG hot loop.

The packed dual-layout CG iteration (ba/packed.py) is floored by its
state-vector gathers: the w leg's ``u[pid_f]`` fetches O rows per
iteration and the TPU gather engine is row-COUNT bound (~0.4M rows/ms on
a v5e) — 1.0 ms of the 1.27 ms corridor iteration, and every chunked /
one-hot / re-packed variant measured worse (prof_ba8-13).

This layout removes the gathers from the iteration ENTIRELY by exploiting
the structure the chunk experiments only grazed: a landmark's observation
list is a run of consecutive poses (it is tracked frame to frame).  Index
landmarks by (b, j) — the j-th landmark whose observation run starts at
pose b — and slots by k = obs_pose - b:

    slot grid [F, J, Ks]:   (b, j, k)  <->  observation (pose b+k, point (b,j))

Then with A_o = Jp_o^T Jt_o (the [6, 3] W-block of one observation)
packed once per linearization into A [F, J, Ks, 6, 3]:

    W^T v:   r[b,j]  = sum_k  A[b,j,k]^T  v[b+k]     -- Ks dense einsums
                                                        over SHIFTED SLICES
                                                        of v (no gather)
    W y:     out[f]  = sum_k  q_k[f-k],
             q_k[b]  = sum_j  A[b,j,k] y[b,j]        -- Ks dense einsums +
                                                        static shift-adds
                                                        (no scatter)

and the damped Hpp^-1 acts slot-wise on [F, J, 3] (M gathered into the
grid ONCE per solve attempt, not per iteration).  One CG iteration reads
the A table twice plus vectors — pure streaming HBM traffic.

Landmarks that don't fit the grid (span > Ks after dropout holes, or
first-seen overflow past J at one pose) go to a LEFTOVER partition served
by the existing packed path: Hpp is block-diagonal per landmark, so
``W M W^T = W_b M_b W_b^T + W_l M_l W_l^T`` exactly — the hybrid split
changes no math.  The builder returns None when the banded fraction or
padding ratio make the grid a loss.

Measured byte/time accounting on a v5e core (corridor F=2048, O=370k,
J=24, Ks=8, L=147 leftover landmarks; prof_ba14/15 scan-slope):

  wt leg   Awt [F, 3J, 6Ks] read once      28 MB    0.014 ms measured
  w  leg   At2 (M-folded) read once        28 MB    0.005 ms
  leftover Wd + Dd matvecs             2 x 21.7 MB  (in total below)
  V pack / shift-add / CG vector ops     ~1 MB      0.032 / 0.022 ms
  --------------------------------------------------------------------
  total                                  ~100 MB    0.146 ms/CG-iter
                                 HBM speed-of-light 0.122 ms -> 1.2x

vs the packed dual layout's 1.27 ms (gather-floored) and COO's 13.8 ms
at the same scale.  The per-attempt costs stay off the iteration path:
M9 grid gather (F*J rows) + At2/Dd folds once per lambda, pack_banded
once per linearization.

Role: the reference scaled BA through GTSAM's sparse elimination
(reference: Work/SLAM/tools/bundle_adjustment/bundle_adjust.cpp:320-348);
this is the TPU-native replacement — the sparsity pattern is compiled
into a dense banded grid once on the host, and the hot loop is pure
vector streaming.
"""

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["BandedLayout", "build_banded_layout", "pack_banded",
           "banded_hooks"]


@jax.tree_util.register_pytree_node_class
class BandedLayout:
    """Host-built index grids (see module docstring).

    slot_obs   [F, J, Ks] int32  flat obs index per grid slot (sentinel O)
    slot_point [F, J]     int32  landmark id per grid row (sentinel P)
    point_slot [P]        int32  b*J + j of each banded landmark
                                 (sentinel F*J for leftover landmarks)
    left_pids  [L]        int32  global ids of the leftover landmarks
                                 (dense [F*6, L*3] W-block partition)
    left_obs_f/col [O]    int32  scatter coordinates for the dense
                                 leftover build (sentinels F / L)
    """

    def __init__(self, slot_obs, slot_point, point_slot, op_ids_banded,
                 op_ids_left, left_pids, left_obs_f, left_obs_col,
                 F, P, J, Ks, n_obs, n_banded, n_left):
        self.slot_obs = slot_obs
        self.slot_point = slot_point
        self.point_slot = point_slot
        self.op_ids_banded = op_ids_banded  # [O] obs_pose, sentinel F at
        self.op_ids_left = op_ids_left      # [O] non-{banded,left} obs
        self.left_pids = left_pids          # [L] global point id per col
        self.left_obs_f = left_obs_f        # [O] pose row for the dense
        self.left_obs_col = left_obs_col    # [O] L-col  leftover scatter
        self.F = F
        self.P = P
        self.J = J
        self.Ks = Ks
        self.n_obs = n_obs
        self.n_banded = n_banded
        self.n_left = n_left

    def tree_flatten(self):
        return ((self.slot_obs, self.slot_point, self.point_slot,
                 self.op_ids_banded, self.op_ids_left, self.left_pids,
                 self.left_obs_f, self.left_obs_col),
                (self.F, self.P, self.J, self.Ks, self.n_obs,
                 self.n_banded, self.n_left))

    @property
    def L(self):
        return self.left_pids.shape[0]

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def _grid_cost_ms(F, J, Ks, n_left_lms):
    """Crude per-CG-iteration cost model used to pick (Ks, J): two reads
    of the grid tables + two of the dense [F*6, L*3] leftover block at
    ~819 GB/s (v5e)."""
    by = 2 * F * J * Ks * 18 * 4 + 2 * F * n_left_lms * 18 * 4
    return by / 819e9 * 1e3


def build_banded_layout(obs_pose, obs_point, obs_valid, n_poses: int,
                        n_points: int, max_J: int = 128,
                        min_banded_frac: float = 0.5,
                        max_pad_ratio: float = 6.0):
    """Host-side build.  Scans Ks candidates, assigns each landmark whose
    observation span fits to the (first_pose, rank) grid slot, overflow
    and long-span landmarks to the dense leftover partition; picks the
    (Ks, J) minimizing the modeled iteration cost.  Returns None when the
    banded fraction stays below ``min_banded_frac``, the grid pads more
    than ``max_pad_ratio`` slots per banded observation, or the dense
    leftover block would outgrow the grid."""
    op = np.asarray(obs_pose, dtype=np.int64)
    opt = np.asarray(obs_point, dtype=np.int64)
    ov = np.asarray(obs_valid, dtype=bool)
    O = op.shape[0]
    F, P = int(n_poses), int(n_points)
    vop, vopt = op[ov], opt[ov]
    if vop.size == 0:
        return None

    first = np.full(P, F, np.int64)
    last = np.full(P, -1, np.int64)
    np.minimum.at(first, vopt, vop)
    np.maximum.at(last, vopt, vop)
    span = last - first + 1          # <= 0 for unseen landmarks

    best = None
    for Ks in (4, 8, 12, 16):
        fits = (span > 0) & (span <= Ks)
        if not fits.any():
            continue
        cb = np.bincount(first[fits], minlength=F)
        # J at the 99th percentile of non-empty bases: one dense refill
        # frame must not inflate every row of the grid
        J = int(min(max(np.percentile(cb[cb > 0], 99.0), 1), max_J))
        # rank landmarks within their base; rank >= J -> leftover
        pid_fit = np.flatnonzero(fits)
        order = pid_fit[np.argsort(first[pid_fit], kind="stable")]
        rank = np.arange(order.size) - np.repeat(
            np.cumsum(np.concatenate([[0], cb]))[:-1], cb)
        banded_pts = order[rank < J]
        bmask_pt = np.zeros(P, bool)
        bmask_pt[banded_pts] = True
        bobs = ov & bmask_pt[opt]
        n_banded = int(bobs.sum())
        n_valid = int(ov.sum())
        if n_banded < min_banded_frac * n_valid:
            continue
        if F * J * Ks > max_pad_ratio * max(n_banded, 1):
            continue
        n_left_lms = int((~bmask_pt & (span > 0)).sum())
        cost = _grid_cost_ms(F, J, Ks, n_left_lms)
        if best is None or cost < best[0]:
            jslot = np.full(P, 0, np.int64)
            jslot[order] = rank
            best = (cost, Ks, J, bmask_pt.copy(), bobs.copy(),
                    jslot.copy())
    if best is None:
        return None
    _, Ks, J, bmask_pt, bobs, jslot = best

    slot_obs = np.full(F * J * Ks, O, np.int64)
    oi = np.flatnonzero(bobs)
    b = first[opt[oi]]
    k = op[oi] - b
    j = jslot[opt[oi]]
    slot_obs[b * J * Ks + j * Ks + k] = oi
    slot_point = np.full(F * J, P, np.int64)
    pb = np.flatnonzero(bmask_pt)
    slot_point[first[pb] * J + jslot[pb]] = pb
    point_slot = np.full(P, F * J, np.int64)
    point_slot[pb] = first[pb] * J + jslot[pb]

    n_left = int((ov & ~bobs).sum())
    lmask = ov & ~bobs
    left_pids = np.unique(opt[lmask])
    L = int(left_pids.size)
    # Leftover landmarks are few but can observe MANY poses (long runs
    # are exactly why they missed the grid), so any gather/scatter- or
    # [P, Kp]-padded handling of them dominates the iteration (measured
    # 0.8-2.0 ms of the corridor iteration across three variants).  They
    # get a DENSE [F*6, L*3] W-block instead — two matvecs/iteration —
    # viable only while that table stays small next to the grid.
    if L * F * 18 * 4 > max(64e6, 2.0 * F * J * Ks * 18 * 4):
        return None
    remap = np.zeros(P, np.int64)
    remap[left_pids] = np.arange(L)
    left_obs_f = np.where(lmask, op, F)
    left_obs_col = np.where(lmask, remap[opt], L)
    return BandedLayout(
        slot_obs=jnp.asarray(slot_obs.reshape(F, J, Ks), jnp.int32),
        slot_point=jnp.asarray(slot_point.reshape(F, J), jnp.int32),
        point_slot=jnp.asarray(point_slot, jnp.int32),
        op_ids_banded=jnp.asarray(np.where(bobs, op, F), jnp.int32),
        op_ids_left=jnp.asarray(np.where(lmask, op, F), jnp.int32),
        left_pids=jnp.asarray(left_pids, jnp.int32),
        left_obs_f=jnp.asarray(left_obs_f, jnp.int32),
        left_obs_col=jnp.asarray(left_obs_col, jnp.int32),
        F=F, P=P, J=J, Ks=Ks, n_obs=O,
        n_banded=int(bobs.sum()), n_left=n_left)


def pack_banded(lin, bl: BandedLayout):
    """Per-linearization tables, laid out for full-width VPU lanes.

    The natural grid form A [F, J, Ks, 6, 3] is a TPU layout disaster —
    its (6, 3)-minor blocks pad to an (8, 128) tile EACH (~1.6 GB
    physical at corridor scale, measured 2.0 ms/CG-iter).  The hot-loop
    tables instead flatten the small axes into two ~128-wide forms:

        Awt [F, J*3, Ks*6]   Awt[b, y*J+j, k*6+x] = A[b,j,k][x,y]
        Aw2 [F, Ks*6, J*3]   its (1, 2) transpose

    so each CG leg is ONE full-lane broadcast-multiply + lane reduction.
    Also returns the two per-pose observation Grams (Hcc-obs leg and
    preconditioner, split by partition) and the dense leftover W-block
    Wd [F*6, L*3] with y-major columns (col = y*L + l)."""
    from mqslam_tpu.ba.solver import _JTJ

    F, J, Ks, P, L = bl.F, bl.J, bl.Ks, bl.P, bl.L
    Jp, Jt = lin.J_obs_pose, lin.J_obs_point          # [O,2,6], [O,2,3]
    A_o = jnp.sum(Jp[:, :, :, None] * Jt[:, :, None, :], axis=1)
    A_flat = jnp.concatenate(                         # [O+1, 18]
        [A_o.reshape(-1, 18), jnp.zeros((1, 18), A_o.dtype)])
    G1 = A_flat[bl.slot_obs]                          # [F, J, Ks, 18]
    G1 = G1.reshape(F, J, Ks, 6, 3)
    Awt = G1.transpose(0, 4, 1, 2, 3).reshape(F, 3 * J, Ks * 6)
    Aw2 = Awt.transpose(0, 2, 1)

    G_banded = jax.ops.segment_sum(_JTJ(Jp), bl.op_ids_banded,
                                   num_segments=F)
    if L:
        G_left = jax.ops.segment_sum(_JTJ(Jp), bl.op_ids_left,
                                     num_segments=F)
        # dense leftover W: one scatter-add of n_left rows per
        # linearization (the iteration itself never scatters)
        Zl = jnp.zeros((F + 1, L + 1, 6, 3), A_o.dtype)
        Zl = Zl.at[bl.left_obs_f, bl.left_obs_col].add(A_o)
        Wd = Zl[:F, :L].transpose(0, 2, 3, 1).reshape(F * 6, 3 * L)
    else:
        G_left = jnp.zeros_like(G_banded)
        Wd = jnp.zeros((F * 6, 0), A_o.dtype)
    return Awt, Aw2, G_banded, G_left, Wd


class _Hooks(NamedTuple):
    hcc: object
    corr: object
    w_full: object
    wt_full: object
    pre: object


def banded_hooks(problem, lin, bl: BandedLayout, packedB, Hpp_inv):
    """Closures for the hybrid Schur-CG.  ``Hpp_inv`` is the DAMPED
    per-landmark inverse [P, 3, 3] (masked).  Built ONCE per solve
    attempt: the grid copy of M (one [F*J]-row gather) is folded into
    the w-leg table At2 = Aw2 . M, so each CG iteration is exactly two
    full-lane broadcast-multiply/lane-reduce passes over Awt and At2 —
    zero gathers, zero scatters, ~125 MB of streaming reads at corridor
    scale."""
    Awt, Aw2, G_banded, G_left, Wd = (packedB if packedB is not None
                                      else pack_banded(lin, bl))
    F, J, Ks, P, L = bl.F, bl.J, bl.Ks, bl.P, bl.L

    # M on the grid as nine [F, J] planes (lane-friendly; the [F,J,3,3]
    # form would tile-pad each 3x3 block)
    M9 = jnp.concatenate(
        [Hpp_inv.reshape(P, 9),
         jnp.zeros((1, 9), Hpp_inv.dtype)])[bl.slot_point]   # [F, J, 9]
    Mt = M9.transpose(2, 0, 1).reshape(3, 3, F, J)           # [z, y, F, J]

    # fold M into the w-leg table: At2[b, kx, y*J+j] = sum_z
    # Aw2[b, kx, z*J+j] * M[b, j, z, y]  == (A @ M) in grid terms
    At2 = jnp.concatenate(
        [sum(Aw2[:, :, z * J:(z + 1) * J] * Mt[z, y][:, None, :]
             for z in range(3)) for y in range(3)], axis=2)  # [F,KX,JY]

    if L:
        # leftover: fold the damped M into the dense block once per
        # attempt (Dd = Wd . blockdiag(M_l), 9 lane-block products),
        # so its corr is two matvecs
        M_lc = Hpp_inv[bl.left_pids]                         # [L, 3, 3]
        Dd = jnp.concatenate(
            [sum(Wd[:, z * L:(z + 1) * L] * M_lc[None, :, z, y]
                 for z in range(3)) for y in range(3)], axis=1)

        def l_wt(v):                   # [F, 6] -> [L*3] (y-major)
            return jax.lax.dot_general(
                v.reshape(1, F * 6), Wd, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)[0]

        def l_apply(table, u3):        # [F6, L3] x [L3] -> [F, 6]
            return jax.lax.dot_general(
                table, u3.reshape(3 * L, 1), (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST
            ).reshape(F, 6)

    def _vpack(v):                     # [F, 6] -> V [F, Ks*6]
        vp = jnp.concatenate([v, jnp.zeros((Ks, 6), v.dtype)])
        return jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(vp, k, F) for k in range(Ks)],
            axis=1)

    def wt72(v):                       # [F, 6] -> r [F, J*3] (y-major)
        V = _vpack(v)
        return jnp.sum(Awt * V[:, None, :], axis=2)

    def _shift_add(q):                 # q [F, Ks*6] -> out [F, 6]
        qk = q.reshape(F, Ks, 6)
        buf = jnp.zeros((F + Ks, 6), q.dtype)
        for k in range(Ks):
            buf = buf.at[k:k + F].add(qk[:, k])
        return buf[:F]

    def w72(table, r):                 # [F,KX,JY] x [F,JY] -> [F, 6]
        return _shift_add(jnp.sum(table * r[:, None, :], axis=2))

    def hcc(v):
        return jnp.sum((G_banded + G_left) * v[:, None, :], axis=-1)

    def corr(v):                       # W M W^T v: two table passes
        c = w72(At2, wt72(v))
        if L:
            c = c + l_apply(Dd, l_wt(v))
        return c

    def w_full(t):                     # t [P, 3] -> [F, 6] (per solve)
        tb = jnp.concatenate(
            [t, jnp.zeros((1, 3), t.dtype)])[bl.slot_point]  # [F, J, 3]
        t72 = tb.transpose(0, 2, 1).reshape(F, 3 * J)        # y-major
        out = w72(Aw2, t72)
        if L:
            out = out + l_apply(
                Wd, t[bl.left_pids].T.reshape(3 * L))        # y-major
        return out

    def wt_full(v):                    # [F, 6] -> [P, 3] (per solve)
        r = wt72(v).reshape(F, 3, J).transpose(0, 2, 1)      # [F, J, 3]
        r = jnp.concatenate(
            [r.reshape(F * J, 3), jnp.zeros((1, 3), v.dtype)])
        out = r[bl.point_slot]
        if L:
            # exclusive partition: leftover landmarks have no banded
            # slot, so this set is a disjoint write (once per solve)
            out = out.at[bl.left_pids].add(l_wt(v).reshape(3, L).T)
        return out

    def pre():                         # exact 6x6 diag blocks of S
        # AHA[b,k,x,w] = sum_{y,j} At2[b,kx,yj] Aw2[b,kw,yj]: batched
        # MXU contraction over the lane axis, then keep the k-diagonal
        # 6x6 blocks (one obs per (pose, point) => k == k' only)
        full = jax.lax.dot_general(
            At2, Aw2, (((2,), (2,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)              # [F,KX,KX]
        kk = full.reshape(F, Ks, 6, Ks, 6)
        Sk = jnp.stack([kk[:, k, :, k, :] for k in range(Ks)],
                       axis=1)                               # [F,Ks,6,6]
        buf = jnp.zeros((F + Ks, 6, 6), Sk.dtype)
        for k in range(Ks):
            buf = buf.at[k:k + F].add(Sk[:, k])
        blk = G_banded - buf[:F]
        if L:
            # leftover AHA per pose: batched contraction of the M-folded
            # dense block against W over the landmark axis
            D3 = Dd.reshape(F, 6, 3 * L)
            W3 = Wd.reshape(F, 6, 3 * L)
            blk = blk + G_left - jax.lax.dot_general(
                D3, W3, (((2,), (2,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
        return blk

    return _Hooks(hcc=hcc, corr=corr, w_full=w_full, wt_full=wt_full,
                  pre=pre)


# ---------------------------------------------------------------------------
# Sharded banded grid: the same gather-free hot loop, pose-blocks per device
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class ShardedBandedLayout:
    """Per-device banded grid blocks, stacked on a leading shard axis.

    The grid shards by BASE POSE block: device d owns base rows
    [d*Fb, (d+1)*Fb) and, with it, every observation of every landmark
    based there (the observation arrays must be permuted accordingly —
    ``permute_obs`` below — so each device's obs slice is exactly its
    grid block's observations plus its pose-block's leftover obs).  The
    CG legs then run on purely LOCAL tables; v is replicated, the w-leg
    rows [d*Fb, d*Fb + Fb + Ks) assemble by ONE psum per matvec, and the
    leftover partition's [3L] / [F, 6] pieces ride the same collectives.
    """

    def __init__(self, slot_obs, slot_point, point_slot, op_ids_banded,
                 op_ids_left, left_pids, left_obs_row, left_obs_col,
                 gstart, F, P, Fb, J, Ks, L, O_per, n_banded, n_left):
        self.slot_obs = slot_obs          # [D, Fb, J, Ks] LOCAL obs ids
        self.slot_point = slot_point      # [D, Fb, J] global pid
        self.point_slot = point_slot      # [D, P] local b*J+j or Fb*J
        self.op_ids_banded = op_ids_banded  # [D, O_per] global pose / F
        self.op_ids_left = op_ids_left      # [D, O_per] global pose / F
        self.left_pids = left_pids        # [L] global pid (replicated)
        self.left_obs_row = left_obs_row  # [D, O_per] local pose row / Fb
        self.left_obs_col = left_obs_col  # [D, O_per] leftover col / L
        self.gstart = gstart              # [D] int32 global base offset
        self.F = F
        self.P = P
        self.Fb = Fb
        self.J = J
        self.Ks = Ks
        self.L = L
        self.O_per = O_per
        self.n_banded = n_banded
        self.n_left = n_left

    def tree_flatten(self):
        return ((self.slot_obs, self.slot_point, self.point_slot,
                 self.op_ids_banded, self.op_ids_left, self.left_pids,
                 self.left_obs_row, self.left_obs_col, self.gstart),
                (self.F, self.P, self.Fb, self.J, self.Ks, self.L,
                 self.O_per, self.n_banded, self.n_left))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def build_sharded_banded_layout(obs_pose, obs_point, obs_valid,
                                n_poses: int, n_points: int, n_shards: int):
    """Host-side build of the per-device grid blocks + the observation
    permutation that realizes them.

    Returns (layout, perm, valid) — ``perm`` [D * O_per] gathers the
    ORIGINAL observation arrays into the device-major order the layout
    indexes and ``valid`` [D * O_per] marks the real (non-pad) slots;
    apply with ``permute_obs`` — or None when the single-device builder
    refuses the grid or F doesn't split evenly."""
    F, P, D = int(n_poses), int(n_points), int(n_shards)
    if F % D:
        return None
    bl = build_banded_layout(obs_pose, obs_point, obs_valid, F, P)
    if bl is None:
        return None
    Fb = F // D
    J, Ks, L = bl.J, bl.Ks, bl.L
    op = np.asarray(obs_pose, dtype=np.int64)
    ov = np.asarray(obs_valid, dtype=bool)
    O = op.shape[0]
    slot_obs_g = np.asarray(bl.slot_obs).astype(np.int64)   # [F, J, Ks]
    opb = np.asarray(bl.op_ids_banded, dtype=np.int64)      # sentinel F
    opl = np.asarray(bl.op_ids_left, dtype=np.int64)
    lrow = np.asarray(bl.left_obs_f, dtype=np.int64)
    lcol = np.asarray(bl.left_obs_col, dtype=np.int64)

    # device of each obs: banded -> its grid row's base block; leftover ->
    # its pose's block; invalid -> parked on device 0 as padding
    base_of_obs = np.full(O, -1, np.int64)
    so = slot_obs_g.reshape(-1)
    valid_slots = so < O
    base_idx = np.repeat(np.arange(F), J * Ks)
    base_of_obs[so[valid_slots]] = base_idx[valid_slots]
    is_left = lcol < L
    base_of_obs[is_left] = lrow[is_left]
    dev = np.where(base_of_obs >= 0, base_of_obs // Fb, 0)
    dev = np.where(ov, dev, 0)

    counts = np.bincount(dev[ov], minlength=D)
    O_per = int(counts.max()) if counts.size else 1
    O_per = max(O_per, 1)
    perm = np.zeros(D * O_per, np.int64)
    local_of = np.full(O, O_per, np.int64)   # local id per original obs
    for d in range(D):
        ids = np.flatnonzero(ov & (dev == d))
        perm[d * O_per:d * O_per + len(ids)] = ids
        perm[d * O_per + len(ids):(d + 1) * O_per] = ids[0] if len(ids) \
            else 0
        local_of[ids] = np.arange(len(ids))

    # per-device tables with LOCAL obs ids
    remap_slot = np.full(O + 1, O_per, np.int64)
    remap_slot[:O] = local_of
    slot_obs_l = remap_slot[slot_obs_g].reshape(D, Fb, J, Ks)
    slot_point_l = np.asarray(bl.slot_point).reshape(D, Fb, J)

    point_slot_l = np.full((D, P), Fb * J, np.int64)
    ps_g = np.asarray(bl.point_slot, dtype=np.int64)        # b*J + j / F*J
    pb = np.flatnonzero(ps_g < F * J)
    d_of_p = (ps_g[pb] // J) // Fb
    point_slot_l[d_of_p, pb] = ps_g[pb] - d_of_p * Fb * J

    def _gather_obs_field(src, sentinel):
        out = np.full((D, O_per), sentinel, np.int64)
        flat = src[perm].reshape(D, O_per)
        # padding slots repeat a real obs: force their sentinel
        for d in range(D):
            n = counts[d] if d < len(counts) else 0
            out[d, :n] = flat[d, :n]
        return out

    opb_l = _gather_obs_field(opb, F)
    opl_l = _gather_obs_field(opl, F)
    lrow_l = _gather_obs_field(np.where(is_left, lrow, 0), 0)
    # leftover row becomes LOCAL (pose - gstart); non-left -> sentinel Fb
    gstart = (np.arange(D) * Fb)[:, None]
    lcol_l = _gather_obs_field(lcol, L)
    lrow_l = np.where(lcol_l < L, lrow_l - gstart, Fb)

    i32 = lambda a: jnp.asarray(a, jnp.int32)
    layout = ShardedBandedLayout(
        slot_obs=i32(slot_obs_l), slot_point=i32(slot_point_l),
        point_slot=i32(point_slot_l), op_ids_banded=i32(opb_l),
        op_ids_left=i32(opl_l),
        left_pids=jnp.tile(bl.left_pids[None], (D, 1)),  # uniform squeeze
        left_obs_row=i32(lrow_l), left_obs_col=i32(lcol_l),
        gstart=i32(np.arange(D) * Fb),
        F=F, P=P, Fb=Fb, J=J, Ks=Ks, L=L, O_per=O_per,
        n_banded=bl.n_banded, n_left=bl.n_left)
    valid = (np.arange(D * O_per) % O_per
             < counts[(np.arange(D * O_per) // O_per)])
    return layout, jnp.asarray(perm, jnp.int32), jnp.asarray(valid)


def permute_obs(problem, perm, valid):
    """Apply the builder's observation permutation to a BAProblem: the
    returned problem's obs arrays are device-major blocks of O_per rows
    each (pad slots repeat a real obs with validity OFF)."""
    def g(a):
        return a[perm]

    return problem._replace(
        obs_uv=g(problem.obs_uv), obs_pose=g(problem.obs_pose),
        obs_cam=g(problem.obs_cam), obs_point=g(problem.obs_point),
        obs_sigma=g(problem.obs_sigma),
        obs_valid=g(problem.obs_valid) & valid)


def pack_banded_sharded(lin, sbl: ShardedBandedLayout, axis: str):
    """Per-linearization tables for ONE device's grid block (call inside
    shard_map with the squeezed layout and this device's obs slice of the
    linearization).  The per-pose Grams are [F, 6, 6] and psum to
    replicated; everything else stays local."""
    from mqslam_tpu.ba.solver import _JTJ

    Fb, J, Ks, L, F = sbl.Fb, sbl.J, sbl.Ks, sbl.L, sbl.F
    Jp, Jt = lin.J_obs_pose, lin.J_obs_point        # [O_per, 2, 6/3]
    A_o = jnp.sum(Jp[:, :, :, None] * Jt[:, :, None, :], axis=1)
    A_flat = jnp.concatenate(
        [A_o.reshape(-1, 18), jnp.zeros((1, 18), A_o.dtype)])
    G1 = A_flat[sbl.slot_obs].reshape(Fb, J, Ks, 6, 3)
    Awt = G1.transpose(0, 4, 1, 2, 3).reshape(Fb, 3 * J, Ks * 6)
    Aw2 = Awt.transpose(0, 2, 1)

    G_banded = jax.lax.psum(
        jax.ops.segment_sum(_JTJ(Jp), sbl.op_ids_banded, num_segments=F),
        axis)
    G_left = jax.lax.psum(
        jax.ops.segment_sum(_JTJ(Jp), sbl.op_ids_left, num_segments=F),
        axis)
    if L:
        Zl = jnp.zeros((Fb + 1, L + 1, 6, 3), A_o.dtype)
        Zl = Zl.at[sbl.left_obs_row, sbl.left_obs_col].add(A_o)
        Wd = Zl[:Fb, :L].transpose(0, 2, 3, 1).reshape(Fb * 6, 3 * L)
    else:
        Wd = jnp.zeros((Fb * 6, 0), A_o.dtype)
    return Awt, Aw2, G_banded, G_left, Wd


def banded_hooks_sharded(problem, lin, sbl: ShardedBandedLayout, packedB,
                         Hpp_inv, axis: str):
    """shard_map closures for the sharded banded Schur-CG: identical math
    to ``banded_hooks`` with the grid split into pose-blocks; every
    [F, 6]-shaped result carries its own psum, so the caller composes
    them without further collectives."""
    Awt, Aw2, G_banded, G_left, Wd = (
        packedB if packedB is not None
        else pack_banded_sharded(lin, sbl, axis))
    Fb, J, Ks, L, F, P = sbl.Fb, sbl.J, sbl.Ks, sbl.L, sbl.F, sbl.P
    gs = sbl.gstart                                   # scalar (squeezed)

    M9 = jnp.concatenate(
        [Hpp_inv.reshape(P, 9),
         jnp.zeros((1, 9), Hpp_inv.dtype)])[sbl.slot_point]  # [Fb, J, 9]
    Mt = M9.transpose(2, 0, 1).reshape(3, 3, Fb, J)
    At2 = jnp.concatenate(
        [sum(Aw2[:, :, z * J:(z + 1) * J] * Mt[z, y][:, None, :]
             for z in range(3)) for y in range(3)], axis=2)

    if L:
        M_lc = Hpp_inv[sbl.left_pids]
        Dd = jnp.concatenate(
            [sum(Wd[:, z * L:(z + 1) * L] * M_lc[None, :, z, y]
                 for z in range(3)) for y in range(3)], axis=1)

    def _vblk(v):                      # replicated [F, 6] -> [Fb+Ks, 6]
        vp = jnp.concatenate([v, jnp.zeros((Ks, 6), v.dtype)])
        return jax.lax.dynamic_slice_in_dim(vp, gs, Fb + Ks)

    def wt72(v):                       # -> r [Fb, 3J]
        vb = _vblk(v)
        V = jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(vb, k, Fb) for k in range(Ks)],
            axis=1)
        return jnp.sum(Awt * V[:, None, :], axis=2)

    def _assemble(q, c_left):          # q [Fb, Ks*6] -> psum'd [F, 6]
        qk = q.reshape(Fb, Ks, 6)
        buf = jnp.zeros((F + Ks, 6), q.dtype)
        for k in range(Ks):
            blk = jax.lax.dynamic_slice_in_dim(buf, gs + k, Fb) + qk[:, k]
            buf = jax.lax.dynamic_update_slice_in_dim(buf, blk, gs + k,
                                                      axis=0)
        if c_left is not None:
            blk = jax.lax.dynamic_slice_in_dim(buf, gs, Fb) + c_left
            buf = jax.lax.dynamic_update_slice_in_dim(buf, blk, gs,
                                                      axis=0)
        return jax.lax.psum(buf[:F], axis)

    def _u_left(v):                    # psum'd [3L] leftover state
        vb = jax.lax.dynamic_slice_in_dim(
            jnp.concatenate([v, jnp.zeros((Ks, 6), v.dtype)]), gs, Fb)
        return jax.lax.psum(jax.lax.dot_general(
            vb.reshape(1, Fb * 6), Wd, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)[0], axis)

    def hcc(v):
        return jnp.sum((G_banded + G_left) * v[:, None, :], axis=-1)

    def corr(v):
        q = jnp.sum(At2 * wt72(v)[:, None, :], axis=2)   # [Fb, Ks*6]
        c_left = None
        if L:
            c_left = jax.lax.dot_general(
                Dd, _u_left(v).reshape(3 * L, 1), (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST).reshape(Fb, 6)
        return _assemble(q, c_left)

    def w_full(t):                     # replicated t [P, 3] -> [F, 6]
        tb = jnp.concatenate(
            [t, jnp.zeros((1, 3), t.dtype)])[sbl.slot_point]
        t72 = tb.transpose(0, 2, 1).reshape(Fb, 3 * J)
        q = jnp.sum(Aw2 * t72[:, None, :], axis=2)
        c_left = None
        if L:
            c_left = jax.lax.dot_general(
                Wd, t[sbl.left_pids].T.reshape(3 * L, 1),
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST).reshape(Fb, 6)
        return _assemble(q, c_left)

    def wt_full(v):                    # -> psum'd [P, 3]
        r = wt72(v).reshape(Fb, 3, J).transpose(0, 2, 1)
        r = jnp.concatenate(
            [r.reshape(Fb * J, 3), jnp.zeros((1, 3), v.dtype)])
        out = r[sbl.point_slot]        # partial: this block's landmarks
        if L:
            # u_left is already psum'd (identical on every device): add
            # it on block 0 only so the outer psum counts it once
            u3 = _u_left(v).reshape(3, L).T
            out = out + jnp.where(gs == 0, 1.0, 0.0) \
                * jnp.zeros((P, 3), v.dtype).at[sbl.left_pids].add(u3)
        return jax.lax.psum(out, axis)

    def pre():
        full = jax.lax.dot_general(
            At2.reshape(Fb, Ks * 6, 3 * J), Aw2.reshape(Fb, Ks * 6, 3 * J),
            (((2,), (2,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        kk = full.reshape(Fb, Ks, 6, Ks, 6)
        buf = jnp.zeros((F + Ks, 6, 6), full.dtype)
        for k in range(Ks):
            blk = jax.lax.dynamic_slice_in_dim(buf, gs + k, Fb) \
                + kk[:, k, :, k, :]
            buf = jax.lax.dynamic_update_slice_in_dim(buf, blk, gs + k,
                                                      axis=0)
        if L:
            D3 = Dd.reshape(Fb, 6, 3 * L)
            W3 = Wd.reshape(Fb, 6, 3 * L)
            aha = jax.lax.dot_general(
                D3, W3, (((2,), (2,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            blk = jax.lax.dynamic_slice_in_dim(buf, gs, Fb) + aha
            buf = jax.lax.dynamic_update_slice_in_dim(buf, blk, gs,
                                                      axis=0)
        return (G_banded + G_left) - jax.lax.psum(buf[:F], axis)

    return _Hooks(hcc=hcc, corr=corr, w_full=w_full, wt_full=wt_full,
                  pre=pre)
