"""Headless command-line entry points.

  python -m mqslam_tpu.cli.slam_run      — SLAM front-end over an image dir
                                           (role of slam2.py's CLI +
                                           run_pipeline.cpp's headless driver)
  python -m mqslam_tpu.cli.ba_run        — offline BA over a BA_info dump
                                           (role of the bundle_adjust CLI)
  python -m mqslam_tpu.cli.evaluate_ate  — TUM absolute trajectory error
  python -m mqslam_tpu.cli.evaluate_rpe  — TUM relative pose error
  python -m mqslam_tpu.cli.align_traj    — sim(3)-anchored alignment of
                                           trajectories + maps to ground truth
  python -m mqslam_tpu.studies.triangulation_comparison — the synthetic study
"""
