"""Absolute trajectory error CLI (TUM benchmark tool surface).

Reference: Work/SLAM/tools/tum_benchmark_tools/evaluate_ate.py:115-197.
"""

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("first_file", help="ground-truth trajectory (TUM)")
    ap.add_argument("second_file", help="estimated trajectory (TUM)")
    ap.add_argument("--offset", type=float, default=0.0)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--max_difference", type=float, default=0.02)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)

    from mqslam_tpu.eval import ate
    from mqslam_tpu.io import tum

    gt = tum.load_trajectory(args.first_file)
    est = tum.load_trajectory(args.second_file)
    res = ate.evaluate_ate(est, gt, max_difference=args.max_difference,
                           offset=-args.offset, scale=args.scale)
    if args.verbose:
        print(f"compared_pose_pairs {res.n_pairs} pairs")
        print(f"absolute_translational_error.rmse {res.rmse:.6f} m")
        print(f"absolute_translational_error.mean {res.mean:.6f} m")
        print(f"absolute_translational_error.median {res.median:.6f} m")
        print(f"absolute_translational_error.std {res.std:.6f} m")
        print(f"absolute_translational_error.min {res.min:.6f} m")
        print(f"absolute_translational_error.max {res.max:.6f} m")
    else:
        print(f"{res.rmse:.6f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
