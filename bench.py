"""Benchmark: SLAM front-end throughput + BA solver speed on the TPU backend.

Prints ONE JSON line. Headline metric: **aggregate frames/s/chip of the
multi-agent atlas runner at A=8 concurrent agents** — the multi-quadrotor
throughput story (one shared-image LK call for all agents; per-agent state
vmapped). ``vs_baseline`` compares against the reference's per-frame kernel
ladder (calcOpticalFlowPyrLK / solvePnPRansac / solvePnP / findHomography /
goodFeaturesToTrack — Work/SLAM/application/own/slam2.py:360-695) running
on this host's CPU, times the number of agents it would have to process.

``extra`` carries the secondary metrics: single-agent frames/s, the
per-agent scaling curve, BA LM iterations/s on the reference's real SVO
dump (BASELINE.json names this metric), and the XLA-vs-Pallas LK kernel
latency (ops/lk.py impl= choice).
"""

import json
import os
import sys
import time

import numpy as np

# Persistent compilation cache: the first run pays the (remote) compiles,
# subsequent bench invocations start from cached executables.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".cache", "jax"))

_T0 = time.perf_counter()


def _log(msg):
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def build_sequence(n_frames=33, size=(640, 480), f=500.0, plane_z=4.0,
                   seed=7, ang_rate=0.05, vel=(1.2, 0.15, 0.2)):
    from mqslam_tpu.frontend import synthetic

    rng = np.random.RandomState(seed)
    tex = synthetic.make_texture(rng)
    P_list = []
    for i in range(n_frames):
        frac = i / max(n_frames - 1, 1)
        ang = ang_rate * frac
        ca, sa = np.cos(ang), np.sin(ang)
        R = np.array([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]])
        center = np.array(vel) * frac
        P = np.eye(4)
        P[:3, :3] = R
        P[:3, 3] = -R @ center
        P_list.append(P)
    imgs = synthetic.render_plane_sequence(np.stack(P_list), tex, size=size,
                                           f=f, plane_z=plane_z)
    return imgs, np.stack(P_list), f, size, plane_z


def build_divergent_fleet(A, n_frames=33, size=(640, 480), f=500.0,
                          plane_z=4.0):
    """A INDEPENDENT agents: distinct textures, start offsets, turn rates
    and velocities — keyframe phases de-synchronize across the fleet, so
    the masked keyframe branch is paid on realistically many frame-groups
    (the reference's semantics: N independent slam2 processes,
    Work/SLAM/application/own/slam2.py:1021-1253).  The cloned-broadcast
    variant (one state, one sequence) is kept in bench_multi as a
    comparison row."""
    seqs = []
    for a in range(A):
        sgn = 1.0 if a % 2 == 0 else -1.0
        ang_rate = sgn * (0.03 + 0.015 * ((a * 7) % 5))
        vel = (sgn * (0.8 + 0.12 * (a % 4)), 0.1 + 0.02 * (a % 3),
               0.1 + 0.05 * ((a * 3) % 4))
        seqs.append(build_sequence(n_frames=n_frames, size=size, f=f,
                                   plane_z=plane_z, seed=100 + a,
                                   ang_rate=ang_rate, vel=vel))
    return seqs


def _bootstrap_state(imgs, P_list, f, size, plane_z):
    import jax
    import jax.numpy as jnp
    from mqslam_tpu.core import camera as cam_mod
    from mqslam_tpu.frontend import synthetic, tracker as trk
    from mqslam_tpu.ops import features

    cal = cam_mod.Cal3DS2.from_array(jnp.asarray(
        [f, f, 0.0, size[0] / 2, size[1] / 2, 0, 0, 0, 0], jnp.float32))
    config = trk.TrackerConfig()
    uv, valid = features.detect_corners(jnp.asarray(imgs[0]),
                                        max_corners=160, cell=14)
    uv = np.asarray(uv)[np.asarray(valid)][:128]
    objp = synthetic.backproject_to_plane(uv, P_list[0], f,
                                          (size[0] / 2, size[1] / 2),
                                          plane_z)
    state = trk.bootstrap(uv.astype(np.float32), objp.astype(np.float32),
                          cal, imgs[0], config, jax.random.PRNGKey(0))
    return cal, config, state


def bench_single(cal, config, state, imgs, repeats=3):
    import jax
    import jax.numpy as jnp
    from mqslam_tpu.frontend import tracker as trk

    run = trk.make_scan_runner(cal, config)
    imgs_dev = jnp.asarray(imgs)
    _log("compiling single-agent scan")
    out = jax.block_until_ready(run(state, imgs_dev))
    n = imgs.shape[0] - 1
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(state, imgs_dev))
        best = min(best, time.perf_counter() - t0)
    accepted = np.asarray(out[1][0])
    return n / best, int((accepted > 0).sum()), n


def bench_multi(cal, config, state, imgs, A, repeats=3):
    """Cloned-broadcast fleet: ONE state and ONE image sequence broadcast
    to all A agents (comparison row; keyframe phases coincide)."""
    import jax
    import jax.numpy as jnp
    from mqslam_tpu.frontend import tracker as trk

    run = trk.make_multi_agent_runner(cal, config)
    states = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (A,) + a.shape), state)
    imgs_dev = jnp.broadcast_to(jnp.asarray(imgs)[None],
                                (A,) + imgs.shape)
    _log(f"compiling multi-agent runner A={A}")
    out = jax.block_until_ready(run(states, imgs_dev))
    n = imgs.shape[0] - 1
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(states, imgs_dev))
        best = min(best, time.perf_counter() - t0)
    accepted = np.asarray(out[1][0])
    return A * n / best, int((accepted > 0).sum()), A * n


def bench_multi_divergent(cal, config, A, repeats=3):
    """Divergent fleet (the HEADLINE): A independent agents with distinct
    textures/trajectories (build_divergent_fleet), each bootstrapped on
    its own first frame.  Returns (aggregate fps, tracked, total)."""
    import jax
    import jax.numpy as jnp
    from mqslam_tpu.frontend import tracker as trk

    seqs = build_divergent_fleet(A)
    states = []
    for imgs_a, P_list, f, size, plane_z in seqs:
        _, _, st = _bootstrap_state(imgs_a, P_list, f, size, plane_z)
        states.append(st)
    states = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
    imgs_dev = jnp.asarray(np.stack([s[0] for s in seqs]))
    run = trk.make_multi_agent_runner(cal, config)
    _log(f"compiling divergent multi-agent runner A={A}")
    out = jax.block_until_ready(run(states, imgs_dev))
    n = imgs_dev.shape[1] - 1
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(states, imgs_dev))
        best = min(best, time.perf_counter() - t0)
    accepted = np.asarray(out[1][0])
    return A * n / best, int((accepted > 0).sum()), A * n


def bench_lk_impls(imgs, n_scan=30, repeats=3):
    """On-device latency of the two LK implementations, 384 tracks.

    The kernel is scanned n_scan times inside one executable — a per-call
    host measurement over the tunneled backend is swamped by the ~30 ms
    round-trip floor and says nothing about the kernels."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from mqslam_tpu.ops import lk

    rng = np.random.RandomState(1)
    pts = jnp.asarray(np.stack(
        [rng.uniform(40, imgs.shape[2] - 40, 384),
         rng.uniform(40, imgs.shape[1] - 40, 384)], axis=1), jnp.float32)
    pad = lk.lk_pad()
    pyr_a = tuple(lk.build_pyramid(jnp.asarray(imgs[0]), 3, pad=pad))
    pyr_b = tuple(lk.build_pyramid(jnp.asarray(imgs[1]), 3, pad=pad))
    out = {}
    for impl in ("xla", "pallas", "fused", "tiled"):
        @partial(jax.jit, static_argnames=("impl",))
        def run(p0, impl):
            def body(p, _):
                q, st, err = lk.lk_track_pyr(pyr_a, pyr_b, p, prepad=True,
                                             impl=impl)
                # feed flow back (prevents DCE; displacement stays tiny)
                return p + 0.001 * (q - p), err
            p, errs = jax.lax.scan(body, p0, jnp.arange(n_scan))
            return p, errs

        try:
            jax.block_until_ready(run(pts, impl))
            best = np.inf
            for _ in range(repeats):
                t0 = time.perf_counter()
                jax.block_until_ready(run(pts, impl))
                best = min(best, time.perf_counter() - t0)
            out[impl] = round(best * 1e3 / n_scan, 3)
        except Exception as e:  # pallas may be unsupported on a backend
            out[impl] = f"error: {type(e).__name__}"
    return out


def bench_ba_iters(max_iters=15, repeats=2):
    """LM iterations/s on the reference's real SVO slam2 dump (falls back
    to the synthetic 2-robot cube when the dump is not mounted).

    Headline = lm_solve_device (the whole LM outer loop as ONE device
    dispatch, ba/solver.py::_lm_device_loop) — on a tunneled backend the
    host-controlled loop pays ~30-45 ms RTT per iteration, which measures
    the link, not the solver. The host-loop number is reported alongside.
    Both use the dense-Schur direct path at this problem size."""
    import jax
    import jax.numpy as jnp
    from mqslam_tpu.ba import problem as bp, solver as bs, synthetic as bsyn
    from mqslam_tpu.io import ba_info

    svo = "/root/reference/Work/SLAM/datasets/SVO/sin2_tex2_h1_v8_d"
    if os.path.isfile(os.path.join(
            svo, "BA_info.measurements.points2D.cam0-slam2.txt")):
        data = ba_info.load_ba_data(svo, "slam2", nr_cameras=1, fps=50)
        src = "svo-real-dump"
    else:
        data = bsyn.generate_cube_scenario(nr_cameras=2)
        src = "synthetic-cube"
    prob = bp.problem_from_ba_data(data)
    prob = prob._replace(odo_valid=jnp.zeros_like(prob.odo_valid))
    _log(f"compiling BA solver ({src})")
    bs.lm_solve(prob, max_iters=2)  # warm the shared executables
    best_host = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        _, hist = bs.lm_solve(prob, max_iters=max_iters)
        best_host = min(best_host, time.perf_counter() - t0)
    host_ips = round((len(hist) - 1) / best_host, 3)

    _log("compiling device-resident LM loop")
    bs.lm_solve_device(prob, max_iters=max_iters)  # compile
    best_dev = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        _, hist_d, n_iters = bs.lm_solve_device(prob, max_iters=max_iters)
        best_dev = min(best_dev, time.perf_counter() - t0)
    dev_ips = round(max(n_iters, 1) / best_dev, 3)

    # device-resident incremental BA (full step schedule, one dispatch;
    # ba/incremental.py::incremental_solve_device)
    inc_sps = None
    if src == "svo-real-dump":
        from mqslam_tpu.ba import incremental as binc
        _log("compiling device-resident incremental BA")
        binc.incremental_solve_device(data, prob, use_odometry=False)
        best_inc = np.inf
        for _ in range(repeats):
            t0 = time.perf_counter()
            _, hist_i = binc.incremental_solve_device(data, prob,
                                                      use_odometry=False)
            best_inc = min(best_inc, time.perf_counter() - t0)
        inc_sps = round(len(hist_i) / best_inc, 2)
    return dev_ips, host_ips, inc_sps, src


_HBM_GBPS = 819.0  # v5e HBM bandwidth (speed-of-light reference)


def lk_efficiency(lk_ms, size=(640, 480), levels=3):
    """Computed bytes-moved + HBM-roofline ratio for the LK call
    (VERDICT r4 #7: machine-readable efficiency, derived from kernel
    geometry — not hand-written).  The tiled kernel (ops/lk_tile_pallas)
    moves each level's J+I tile pair exactly once per call."""
    from mqslam_tpu.ops import lk as lk_mod
    from mqslam_tpu.ops.lk_tile_pallas import SEARCH_ROWS_T

    pad = lk_mod.lk_pad()
    total = 0
    for lvl in range(levels):
        H = (size[1] >> lvl) + 2 * pad
        W = (size[0] >> lvl) + 2 * pad
        Ht = max(-(-H // 8) * 8, SEARCH_ROWS_T)
        Wp = -(-W // 128) * 128 + 128
        total += 2 * Ht * Wp * 4          # J + I tiles, read once
    ms = lk_ms.get("tiled", lk_ms.get("fused"))
    if not isinstance(ms, (int, float)):
        return {}
    sol_ms = total / (_HBM_GBPS * 1e9) * 1e3
    return {"lk_bytes_moved_mb": round(total / 1e6, 2),
            "lk_hbm_sol_ms": round(sol_ms, 4),
            "lk_x_over_hbm_sol": round(ms / sol_ms, 1)}


def cg_efficiency(corridor, F, P, Kf, Kp):
    """Bytes per packed CG iteration from the dual-layout geometry
    (ba/packed.py + ba/solver._packed_ops): the Hcc leg is the per-pose
    Gram G_f (pack_jacobians), the W legs read Jp_f/Jt_f/Jp_p/Jt_p once
    each plus the state gathers and the damped Hpp solves."""
    b = 4  # f32 tables
    by = (F * 36 * b                                # Gram G_f
          + F * Kf * 12 * b + F * Kf * 6 * b        # Jp_f + Jt_f (w leg)
          + P * Kp * 12 * b + P * Kp * 6 * b        # Jp_p + Jt_p (wt leg)
          + P * Kp * 6 * 4 + F * Kf * 3 * 4         # vp / uf gather outputs
          + 2 * P * 9 * 4 + 2 * P * 3 * 4)          # Hpp blocks + vecs
    ms = corridor.get("packed_cg_iter_ms")
    if not isinstance(ms, (int, float)):
        return {}
    sol_ms = by / (_HBM_GBPS * 1e9) * 1e3
    out = {"cg_bytes_moved_mb": round(by / 1e6, 2),
           "cg_hbm_sol_ms": round(sol_ms, 4),
           "cg_x_over_hbm_sol": round(ms / sol_ms, 1)}
    # banded path (ba/banded.py): one read each of the Awt and the
    # M-folded At2 tables + the dense-leftover block twice + vectors
    bms = corridor.get("banded_cg_iter_ms")
    J, Ks = corridor.get("banded_J"), corridor.get("banded_Ks")
    if isinstance(bms, (int, float)) and J:
        L = corridor.get("banded_L", 0)
        bby = (2 * F * J * Ks * 18 * 4          # Awt + At2
               + 2 * F * 6 * 3 * 4              # V pack + q
               + 2 * P * 3 * 4 + F * 36 * 4)    # CG vectors + Gram
        bby += 2 * F * L * 18 * 4               # dense leftover Wd + Dd
        bsol = bby / (_HBM_GBPS * 1e9) * 1e3
        out.update({"banded_cg_bytes_moved_mb": round(bby / 1e6, 2),
                    "banded_cg_hbm_sol_ms": round(bsol, 4),
                    "banded_cg_x_over_hbm_sol": round(bms / bsol, 1)})
    return out


def bench_corridor_cg(F=2048, ppf=24, repeats=3):
    """Per-CG-iteration throughput of the packed large-scale BA path at
    production scale (corridor F=2048, O~370k — the scale GTSAM's
    elimination served in the reference, bundle_adjust.cpp:320-348).

    Scan-slope between a 25- and a 100-iteration CG budget (cg_tol=0 runs
    the full budget), packed layout vs COO."""
    import jax
    import jax.numpy as jnp
    from mqslam_tpu.ba import solver as bs, synthetic as bsyn
    from mqslam_tpu.ba.packed import build_packed_layout

    prob, _ = bsyn.generate_corridor_problem(nr_frames=F,
                                             points_per_frame=ppf)
    O = int(np.asarray(prob.obs_valid).sum())
    layout = build_packed_layout(prob.obs_pose, prob.obs_point,
                                 prob.obs_valid, prob.n_poses,
                                 prob.n_points)
    from mqslam_tpu.ba.banded import build_banded_layout
    blayout = build_banded_layout(prob.obs_pose, prob.obs_point,
                                  prob.obs_valid, prob.n_poses,
                                  prob.n_points)
    lin = jax.jit(bs.linearize)(prob, prob.init)
    jax.block_until_ready(lin.cost)
    lam = jnp.float32(1e-3)
    pJ = bs._pack_jacobians_jit(lin, layout)
    jax.block_until_ready(pJ[0])
    bJ = bs.pack_for_layout(lin, blayout)
    jax.block_until_ready(bJ[0])

    out = {"F": F, "O": O, "P": prob.n_points,
           "Kf": layout.Kf, "Kp": layout.Kp,
           "banded_J": blayout.J, "banded_Ks": blayout.Ks,
           "banded_left": blayout.n_left, "banded_L": blayout.L}
    for name, lay, pj in (("banded", blayout, bJ),
                          ("packed", layout, pJ), ("coo", None, None)):
        ts = {}
        for budget in (25, 100):
            fn = lambda l: bs.solve_delta(prob, lin, l, cg_iters=budget,
                                          cg_tol=0.0, layout=lay,
                                          packedJ=pj)[0]
            jax.block_until_ready(fn(lam))
            best = np.inf
            for _ in range(repeats):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(lam))
                best = min(best, time.perf_counter() - t0)
            ts[budget] = best
        per_iter = (ts[100] - ts[25]) / 75
        out[name + "_cg_iter_ms"] = round(per_iter * 1e3, 3)
        out[name + "_cg_iters_per_s"] = round(1.0 / per_iter, 1)
    return out


def bench_triangulation(n_scan=20, repeats=3, N=65536):
    """Batched two-view triangulation throughput (Mpoints/s) of the 4
    methods on TPU — the counterpart of the reference's documented
    relative kernel speeds (triangulation.py:10,34,104,202 and
    triangulation_c/__init__.py:21,55).  ``cv2_linear_eigen_mps`` is
    cv2.triangulatePoints on this host's CPU over the same batch (the
    reference's fastest Python path; its C+OpenMP linear-LS ran 3x that)."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from mqslam_tpu.ops import triangulation as tri

    rng = np.random.RandomState(3)
    X = rng.uniform(-4, 4, (N, 3)) + np.array([0, 0, 10.0])
    P1 = np.eye(4)
    P2 = np.eye(4)
    ang = 0.12
    P2[:3, :3] = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                           [-np.sin(ang), 0, np.cos(ang)]])
    P2[:3, 3] = [-5.0, 0.3, 0.2]

    def project(P):
        Xc = X @ P[:3, :3].T + P[:3, 3]
        return (Xc[:, :2] / Xc[:, 2:3]).astype(np.float32)

    u1 = project(P1) + rng.normal(0, 0.8 / 500, (N, 2)).astype(np.float32)
    u2 = project(P2) + rng.normal(0, 0.8 / 500, (N, 2)).astype(np.float32)
    u1d, u2d = jnp.asarray(u1), jnp.asarray(u2)
    P1d = jnp.asarray(P1, jnp.float32)
    P2d = jnp.asarray(P2, jnp.float32)

    out = {}
    for name in ("linear_eigen", "linear_ls", "iterative_ls", "optimal"):
        method = getattr(tri, name)

        @partial(jax.jit, static_argnames=("m",))
        def run(a, b, m):
            def body(c, _):
                x, st = getattr(tri, m)(a + c * 1e-30, P1d, b, P2d)
                return c + jnp.sum(x) * 1e-30, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n_scan)
            return c

        np.asarray(run(u1d, u2d, name))
        best = np.inf
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(run(u1d, u2d, name))
            best = min(best, time.perf_counter() - t0)
        out[name + "_mps"] = round(N * n_scan / best / 1e6, 1)

    try:
        import cv2
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            cv2.triangulatePoints(np.ascontiguousarray(P1[:3]),
                                  np.ascontiguousarray(P2[:3]),
                                  u1.T.astype(np.float64),
                                  u2.T.astype(np.float64))
        out["cv2_linear_eigen_mps"] = round(
            N * reps / (time.perf_counter() - t0) / 1e6, 2)
    except Exception:
        pass
    out["batch"] = N
    return out


def bench_loopclosure(repeats=3, n_scan=20):
    """North-star loop-closure components at workload scale (VERDICT r4
    #5): ORB keyframe-DB scoring throughput (queries/s against a FULL
    256-keyframe DB, frontend/loopclosure.py) and pose-graph LM
    iterations/s on a 512-pose circuit with closure edges
    (ba/posegraph.py)."""
    import jax
    import jax.numpy as jnp
    from mqslam_tpu.frontend import loopclosure as lc
    from mqslam_tpu.ba import posegraph as pg

    rng = np.random.RandomState(5)
    cap, K = 256, 384
    db = lc.KeyframeDB(
        desc=jnp.asarray(rng.randint(0, 256, (cap, K, 32), np.uint8)),
        desc_valid=jnp.ones((cap, K), bool),
        uv=jnp.asarray(rng.rand(cap, K, 2).astype(np.float32) * 400),
        xyz=jnp.asarray(rng.randn(cap, K, 3).astype(np.float32)),
        xyz_valid=jnp.ones((cap, K), bool),
        pose=jnp.zeros((cap, 6), jnp.float32),
        used=jnp.ones(cap, bool), count=jnp.int32(cap))
    q_desc = jnp.asarray(rng.randint(0, 256, (K, 32), np.uint8))
    q_valid = jnp.ones(K, bool)

    @jax.jit
    def score_scan(qd):
        def body(c, _):
            # feed the scores back into the query (prevents DCE)
            s, i1, good = lc.loop_scores(db, c, q_valid,
                                         cur_index=jnp.int32(cap))
            return jnp.bitwise_xor(c, (s.sum() % 2).astype(jnp.uint8)), None
        c, _ = jax.lax.scan(body, qd, None, length=n_scan)
        return c

    jax.block_until_ready(score_scan(q_desc))
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(score_scan(q_desc))
        best = min(best, time.perf_counter() - t0)
    scores_qps = n_scan / best

    # pose-graph: 512-pose circuit, odometry chain + 16 closure edges
    N = 512
    ang = np.linspace(0, 2 * np.pi, N, endpoint=False)
    centers = np.stack([np.cos(ang), np.sin(ang), 0 * ang], 1) * 4.0
    poses = np.concatenate([np.zeros((N, 3)), centers], 1)
    noisy = poses + rng.randn(N, 6) * 0.02
    ei = np.concatenate([np.arange(N - 1),
                         np.arange(0, N, N // 16)])
    ej = np.concatenate([np.arange(1, N),
                         (np.arange(0, N, N // 16) + N // 2) % N])
    mr = np.zeros((len(ei), 3))
    mt = centers[ej] - centers[ei]
    g = pg.PoseGraph(
        poses=jnp.asarray(noisy, jnp.float32),
        pose_valid=jnp.ones(N, bool),
        edge_i=jnp.asarray(ei, jnp.int32),
        edge_j=jnp.asarray(ej, jnp.int32),
        edge_meas_r=jnp.asarray(mr, jnp.float32),
        edge_meas_t=jnp.asarray(mt, jnp.float32),
        edge_inv_sigma=jnp.full((len(ei), 6), 20.0, jnp.float32),
        edge_valid=jnp.ones(len(ei), bool),
        prior_mask=jnp.arange(N) == 0,
        prior_r=jnp.asarray(noisy[:, :3] * 0, jnp.float32),
        prior_t=jnp.asarray(centers * 0 + centers, jnp.float32),
        prior_inv_sigma=jnp.full((N, 6), 100.0, jnp.float32))
    iters = 20
    jax.block_until_ready(pg.pgo_solve(g, iters=iters)[0])
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(pg.pgo_solve(g, iters=iters)[0])
        best = min(best, time.perf_counter() - t0)
    return {"orb_db_scores_per_s": round(scores_qps, 1),
            "db_keyframes": cap,
            "pgo_iters_per_s": round(iters / best, 1),
            "pgo_poses": N, "pgo_edges": int(len(ei))}


def bench_opencv_baseline(imgs, P_list, f, size, plane_z, passes=2):
    """The reference's per-frame kernel ladder via OpenCV on host CPU.

    Best (fastest) of ``passes`` runs — host scheduling noise moves a
    single pass by ~10%, and the faster baseline is the conservative
    comparison for vs_baseline."""
    best = None
    for _ in range(passes):
        fps = _opencv_ladder_once(imgs, P_list, f, size, plane_z)
        if fps is None:
            return None
        best = fps if best is None else max(best, fps)
    return best


def _opencv_ladder_once(imgs, P_list, f, size, plane_z):
    try:
        import cv2
    except Exception:
        return None
    from mqslam_tpu.frontend import synthetic

    K = np.array([[f, 0, size[0] / 2], [0, f, size[1] / 2], [0, 0, 1.0]])
    dist = np.zeros(4)
    img0 = imgs[0].astype(np.uint8)
    pts = cv2.goodFeaturesToTrack(img0, 300, 0.01, 12).reshape(-1, 2)
    objp = synthetic.backproject_to_plane(pts, P_list[0], f,
                                          (size[0] / 2, size[1] / 2),
                                          plane_z).astype(np.float32)
    prev = img0
    prev_pts = pts.astype(np.float32)
    t0 = time.perf_counter()
    n = 0
    for i in range(1, imgs.shape[0]):
        cur = imgs[i].astype(np.uint8)
        new_pts, st, err = cv2.calcOpticalFlowPyrLK(prev, cur, prev_pts,
                                                    None)
        ok = (st.reshape(-1) == 1) & (err.reshape(-1) < 12)
        if ok.sum() >= 8:
            sel = np.flatnonzero(ok)
            try:
                _, rvec, tvec, inl = cv2.solvePnPRansac(
                    objp[sel], new_pts[sel], K, dist,
                    reprojectionError=2.0)
                if inl is not None and len(inl) >= 8:
                    cv2.solvePnP(objp[sel][inl.reshape(-1)],
                                 new_pts[sel][inl.reshape(-1)], K, dist,
                                 rvec, tvec, useExtrinsicGuess=True)
            except cv2.error:
                pass
            cv2.findHomography(prev_pts[sel], new_pts[sel])
        cv2.goodFeaturesToTrack(cur, 50, 0.01, 12)  # refill detection
        prev, prev_pts = cur, new_pts
        n += 1
    return n / (time.perf_counter() - t0)


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass
    _log("rendering synthetic sequence")
    imgs, P_list, f, size, plane_z = build_sequence()
    _log(f"sequence ready; backend: {jax.default_backend()}")

    cal, config, state = _bootstrap_state(imgs, P_list, f, size, plane_z)
    _log("bootstrap done (single jitted trace)")

    fps1, ok1, n1 = bench_single(cal, config, state, imgs)
    _log(f"single-agent: {fps1:.1f} frames/s ({ok1}/{n1} tracked)")

    # HEADLINE sweep: divergent fleet (independent per-agent trajectories
    # and textures; keyframe phases de-synchronized — the reference's
    # N-independent-processes semantics)
    scaling = {1: round(fps1, 3)}
    for A in (2, 4, 8, 16, 32):
        fpsA, okA, nA = bench_multi_divergent(cal, config, A)
        scaling[A] = round(fpsA, 3)
        _log(f"A={A} divergent: {fpsA:.1f} aggregate frames/s "
             f"({okA}/{nA} tracked)")
        if okA < nA:  # tracking broke down — don't report a bogus point
            _log(f"A={A}: only {okA}/{nA} tracked; stopping the sweep")
            break

    # cloned-broadcast comparison row (round-4's headline shape)
    cloned = {}
    for A in (8, 16):
        fpsA, okA, nA = bench_multi(cal, config, state, imgs, A)
        cloned[A] = round(fpsA, 3)
        _log(f"A={A} cloned: {fpsA:.1f} aggregate frames/s "
             f"({okA}/{nA} tracked)")

    lk_ms = bench_lk_impls(imgs)
    _log(f"LK per-call latency ms: {lk_ms}")

    tri_mps = bench_triangulation()
    _log(f"triangulation throughput Mpts/s: {tri_mps}")

    corridor = bench_corridor_cg()
    _log(f"corridor-scale CG: {corridor}")

    eff = {}
    eff.update(lk_efficiency(lk_ms))
    eff.update(cg_efficiency(corridor, corridor["F"], corridor["P"],
                             corridor["Kf"], corridor["Kp"]))
    _log(f"efficiency vs HBM roofline: {eff}")

    loopc = bench_loopclosure()
    _log(f"loop closure: {loopc}")

    ba_ips, ba_host_ips, ba_inc_sps, ba_src = bench_ba_iters()
    _log(f"BA: {ba_ips} LM iterations/s device-loop "
         f"({ba_host_ips} host-loop), incremental {ba_inc_sps} steps/s "
         f"on {ba_src}")

    base = bench_opencv_baseline(imgs, P_list, f, size, plane_z)
    if base is None:
        base = 30.0  # fall back to real-time as the reference bar
        note = "opencv-unavailable; baseline=30fps realtime"
    else:
        note = f"baseline=cv2 ladder {base:.1f} fps host CPU"
    _log(note)

    best_A = max(scaling, key=lambda k: scaling[k])
    headline = scaling[best_A]
    print(json.dumps({
        "metric": "slam_frontend_aggregate_frames_per_s_per_chip",
        "value": headline,
        "unit": "frames/s",
        "vs_baseline": round(headline / base, 3),
        "extra": {
            "best_A": best_A,
            "agents_scaling_fps": {str(k): v for k, v in scaling.items()},
            "cloned_agents_fps": {str(k): v for k, v in cloned.items()},
            "single_agent_vs_cv2": round(fps1 / base, 3),
            "ba_lm_iterations_per_s": ba_ips,
            "ba_lm_iterations_per_s_host_loop": ba_host_ips,
            "ba_incremental_steps_per_s": ba_inc_sps,
            "ba_workload": ba_src,
            "lk_per_call_ms": lk_ms,
            "triangulation_mpts_per_s": tri_mps,
            "corridor_cg": corridor,
            "loop_closure": loopc,
            "efficiency": eff,
            "cv2_ladder_fps_host": round(base, 3),
        },
    }))


if __name__ == "__main__":
    main()
