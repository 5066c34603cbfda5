"""Align trajectories + maps to ground truth (monocular scale correction).

CLI role of the reference's align_traj_and_map_to_groundtruth.py:13-95:
computes the anchored (quaternion, scale, translation) transform from the
estimated trajectory to the ground truth and applies it to trajectories
and PCD maps, writing "-trfm" outputs.
"""

import argparse
import os


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("groundtruth_traj")
    ap.add_argument("estimated_traj")
    ap.add_argument("--maps", nargs="*", default=[],
                    help="PCD maps to transform along")
    ap.add_argument("--at-frame", type=int, default=1)
    ap.add_argument("--no-scale", action="store_true")
    args = ap.parse_args(argv)

    from mqslam_tpu.eval import alignment
    from mqslam_tpu.io import pcd, tum

    gt = tum.load_trajectory(args.groundtruth_traj)
    est = tum.load_trajectory(args.estimated_traj)
    trfm = alignment.transform_between_trajectories(
        est, gt, at_frame=args.at_frame, infer_scale=not args.no_scale)
    print(f"delta_quaternion={trfm[0]} scale={trfm[1]:.6f} "
          f"delta_location={trfm[2]}")

    out_traj = _suffix(args.estimated_traj, "-trfm")
    tum.save_trajectory(out_traj, alignment.transform_trajectory(est, trfm))
    print(f"wrote {out_traj}")
    for m in args.maps:
        pts, colors, _ = pcd.load_pcd(m, use_alpha=True)
        pts2 = alignment.transform_points(pts, trfm)
        out_map = _suffix(m, "-trfm")
        pcd.save_pcd(out_map, pts2, colors)
        print(f"wrote {out_map}")
    return 0


def _suffix(path, suffix):
    base, ext = os.path.splitext(path)
    return base + suffix + ext


if __name__ == "__main__":
    raise SystemExit(main())
