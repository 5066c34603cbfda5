"""Relative pose error CLI (TUM benchmark tool surface).

Reference: Work/SLAM/tools/tum_benchmark_tools/evaluate_rpe.py:299-388.
"""

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("groundtruth_file")
    ap.add_argument("estimated_file")
    ap.add_argument("--fixed_delta", action="store_true")
    ap.add_argument("--delta", type=float, default=1.0)
    ap.add_argument("--delta_unit", default="s", choices=["s", "f"])
    ap.add_argument("--max_pairs", type=int, default=10000)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)

    from mqslam_tpu.eval import rpe
    from mqslam_tpu.io import tum

    gt = tum.load_trajectory(args.groundtruth_file)
    est = tum.load_trajectory(args.estimated_file)
    res = rpe.evaluate_rpe(est, gt, fixed_delta=args.fixed_delta,
                           delta=args.delta, delta_unit=args.delta_unit,
                           max_pairs=args.max_pairs)
    if args.verbose:
        print(f"compared_pose_pairs {res.n_pairs} pairs")
        print(f"translational_error.rmse {res.trans_rmse:.6f} m")
        print(f"translational_error.mean {res.trans_mean:.6f} m")
        print(f"translational_error.median {res.trans_median:.6f} m")
        import math
        print(f"rotational_error.rmse "
              f"{res.rot_rmse * 180.0 / math.pi:.6f} deg")
        print(f"rotational_error.mean "
              f"{res.rot_mean * 180.0 / math.pi:.6f} deg")
    else:
        print(f"{res.trans_rmse:.6f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
