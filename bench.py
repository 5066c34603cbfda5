"""Benchmark: front-end tracker throughput on the default (TPU) backend.

Prints ONE JSON line: frames/s/chip of the full jitted per-frame SLAM step
(pyramidal LK over 384 tracks, batched RANSAC PnP, GN refinement, homography
keyframe test, triangulation, conditional feature refill) on 640x480 frames,
scanned entirely on-device. ``vs_baseline`` compares against the reference's
kernel stack — the same per-frame ladder built from OpenCV calls
(calcOpticalFlowPyrLK / solvePnPRansac / solvePnP / findHomography /
goodFeaturesToTrack) timed on this host's CPU, matching the reference
pipeline's per-frame work (Work/SLAM/application/own/slam2.py:360-695).
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


def _log(msg):
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.perf_counter()


def build_sequence(n_frames=33, size=(640, 480), f=500.0, plane_z=4.0):
    from mqslam_tpu.frontend import synthetic

    rng = np.random.RandomState(7)
    tex = synthetic.make_texture(rng)
    P_list = []
    for i in range(n_frames):
        frac = i / max(n_frames - 1, 1)
        ang = 0.05 * frac
        ca, sa = np.cos(ang), np.sin(ang)
        R = np.array([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]])
        center = np.array([1.2 * frac, 0.15 * frac, 0.2 * frac])
        P = np.eye(4)
        P[:3, :3] = R
        P[:3, 3] = -R @ center
        P_list.append(P)
    imgs = synthetic.render_plane_sequence(np.stack(P_list), tex, size=size,
                                           f=f, plane_z=plane_z)
    return imgs, np.stack(P_list), f, size, plane_z


def bench_tpu(imgs, P_list, f, size, plane_z, repeats=3):
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass
    _log(f"backend: {jax.default_backend()}")
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
    _log("corners detected; bootstrapping")
    state = trk.bootstrap(uv.astype(np.float32), objp.astype(np.float32),
                          cal, imgs[0], config, jax.random.PRNGKey(0))
    run = trk.make_scan_runner(cal, config)
    imgs_dev = jnp.asarray(imgs)
    _log("bootstrap done; compiling scan runner")
    # compile + warmup
    out = jax.block_until_ready(run(state, imgs_dev))
    _log("scan compiled; timing")
    n = imgs.shape[0] - 1
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(state, imgs_dev))
        best = min(best, time.perf_counter() - t0)
    accepted = np.asarray(out[1][0])
    return n / best, int((accepted > 0).sum()), n


def bench_opencv_baseline(imgs, P_list, f, size, plane_z):
    """The reference's per-frame kernel ladder via OpenCV on host CPU."""
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
    _log("rendering synthetic sequence")
    imgs, P_list, f, size, plane_z = build_sequence()
    _log("sequence ready")
    fps, n_ok, n = bench_tpu(imgs, P_list, f, size, plane_z)
    base = bench_opencv_baseline(imgs, P_list, f, size, plane_z)
    if base is None:
        base = 30.0  # fall back to real-time as the reference bar
        note = "opencv-unavailable; baseline=30fps realtime"
    else:
        note = f"baseline=cv2 ladder {base:.1f} fps host CPU"
    print(f"[bench] tracked {n_ok}/{n} frames; {note}", file=sys.stderr)
    print(json.dumps({
        "metric": "slam_frontend_frames_per_s_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / base, 3),
    }))


if __name__ == "__main__":
    main()
