"""Multi-agent merge: two single-agent dumps -> joint graph == native 2-cam."""

import numpy as np
import jax.numpy as jnp

from mqslam_tpu.ba import problem as bp, solver as bs, synthetic as basyn
from mqslam_tpu.ba.validate import (validate_data_integrity,
                                    validate_sufficiently_constrained)
from mqslam_tpu.io import ba_info
from mqslam_tpu.multiagent import merge_agents, CrossOdometry


def split_scenario(data: ba_info.BAData):
    """Split the native 2-camera cube scenario into two 1-camera BADatas
    (shared landmarks duplicated per agent) + the cross-camera odometry."""
    agents = []
    cross = []
    S = data.nr_steps
    for a in range(2):
        d = ba_info.BAData(nr_cameras=1)
        d.pose_noise = [data.pose_noise[a]]
        d.point2D_noise = [data.point2D_noise[a]]
        d.calibrations = [data.calibrations[a]]
        d.point3D_noise = data.point3D_noise
        d.odometry_noise = [[data.odometry_noise[a][a]]]
        d.points3D = np.asarray(data.points3D).copy()
        d.point_colors = None
        d.point3D_added_idxs = [list(s) for s in data.point3D_added_idxs]
        d.points2D = [data.points2D[a]]
        d.point2D3D_assocs = [data.point2D3D_assocs[a]]
        d.poses = [data.poses[a]]
        d.odometry = []
        d.odometry_assocs = []
        for s in range(S):
            odos, oa = [], []
            for M, (fc, ff, tc, tf) in zip(data.odometry[s],
                                           data.odometry_assocs[s]):
                if fc == a and tc == a:
                    odos.append(M)
                    oa.append((0, ff, 0, tf))
                elif fc == 0 and tc == 1 and a == 0:
                    cross.append(CrossOdometry(
                        step=s, from_agent=0, from_frame=ff,
                        to_agent=1, to_frame=tf, measured=M))
            d.odometry.append(odos)
            d.odometry_assocs.append(oa)
        agents.append(d)
    return agents, cross


class TestMergeAgents:
    def test_merged_equals_native_two_camera(self):
        native = basyn.generate_cube_scenario(nr_cameras=2, nr_frames=12,
                                              seed=1)
        agents, cross = split_scenario(native)
        merged = merge_agents(agents, cross_odometry=cross,
                              merge_landmarks=True, merge_radius=1.0)
        assert merged.nr_cameras == 2
        # landmark unification collapsed the duplicated cube corners
        assert len(merged.points3D) == len(native.points3D)
        validate_data_integrity(merged)
        assert validate_sufficiently_constrained(merged, use_odometry=True)

        prob_native = bp.problem_from_ba_data(native)
        prob_merged = bp.problem_from_ba_data(merged)
        v_n, h_n = bs.lm_solve(prob_native, max_iters=10, cg_iters=300)
        v_m, h_m = bs.lm_solve(prob_merged, max_iters=10, cg_iters=300)
        # both joint problems converge to the same optimum
        assert abs(h_m[-1] - h_n[-1]) < 0.05 * max(h_n[-1], 1.0)
        np.testing.assert_allclose(np.asarray(v_m.pose_t)[
            np.asarray(prob_merged.pose_valid)],
            np.asarray(v_n.pose_t)[np.asarray(prob_native.pose_valid)],
            atol=0.05)

    def test_without_landmark_merge_keeps_duplicates(self):
        native = basyn.generate_cube_scenario(nr_cameras=2, nr_frames=8,
                                              seed=2)
        agents, cross = split_scenario(native)
        merged = merge_agents(agents, cross_odometry=cross,
                              merge_landmarks=False)
        assert len(merged.points3D) == 2 * len(native.points3D)
        validate_data_integrity(merged)

    def test_agent_transform_applied(self):
        native = basyn.generate_cube_scenario(nr_cameras=2, nr_frames=8,
                                              seed=3)
        agents, cross = split_scenario(native)
        # shift agent 1's world frame; transform should undo it in the merge
        T = np.eye(4)
        T[:3, 3] = [5.0, -2.0, 1.0]
        shifted = agents[1]
        shifted.points3D = shifted.points3D - T[:3, 3]
        shifted.poses[0] = [
            (np.linalg.inv(T) @ n[0], n[1]) if n is not None else None
            for n in shifted.poses[0]]
        merged = merge_agents(agents, cross_odometry=cross,
                              agent_transforms=[np.eye(4), T],
                              merge_landmarks=True, merge_radius=1.0)
        assert len(merged.points3D) == len(native.points3D)
