"""Fleet front-end (agents sharded over the mesh) vs one-chip runner.

The shard_map fleet runner must produce the same per-frame decisions and
poses as the vmapped single-chip multi-agent runner — the sharding is pure
data parallelism over the agent axis with no collectives.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from mqslam_tpu.core import camera as cam_mod
from mqslam_tpu.frontend import synthetic, tracker as trk
from mqslam_tpu.ops import features
from mqslam_tpu.parallel.fleet import make_fleet_runner, shard_agents

needs_devices = pytest.mark.skipif(len(jax.devices()) < 8,
                                   reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def setup():
    size, f, plane_z, n_frames = (320, 240), 280.0, 4.0, 9
    rng = np.random.RandomState(3)
    tex = synthetic.make_texture(rng)
    Ps = []
    for i in range(n_frames):
        frac = i / (n_frames - 1)
        P = np.eye(4)
        P[:3, 3] = -np.array([0.9 * frac, 0.1 * frac, 0.15 * frac])
        Ps.append(P)
    Ps = np.stack(Ps)
    imgs = synthetic.render_plane_sequence(Ps, tex, size=size, f=f,
                                           plane_z=plane_z)
    cal = cam_mod.Cal3DS2.from_array(jnp.asarray(
        [f, f, 0.0, size[0] / 2, size[1] / 2, 0, 0, 0, 0], jnp.float32))
    config = trk.TrackerConfig(max_tracks=128, max_landmarks=1024,
                               target_keypoints=90, ransac_hypotheses=64)
    uv, valid = features.detect_corners(jnp.asarray(imgs[0]),
                                        max_corners=80, cell=14)
    uv = np.asarray(uv)[np.asarray(valid)][:64]
    objp = synthetic.backproject_to_plane(uv, Ps[0], f,
                                          (size[0] / 2, size[1] / 2),
                                          plane_z)
    state = trk.bootstrap(uv.astype(np.float32), objp.astype(np.float32),
                          cal, imgs[0], config, jax.random.PRNGKey(0))
    A = 8
    states = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (A,) + a.shape), state)
    imgs_a = jnp.broadcast_to(jnp.asarray(imgs)[None], (A,) + imgs.shape)
    return cal, config, states, imgs_a


@needs_devices
class TestFleetRunner:
    def test_matches_single_chip_runner(self, setup):
        cal, config, states, imgs_a = setup
        ref_run = trk.make_multi_agent_runner(cal, config)
        ref_states, (acc_r, rvec_r, tvec_r) = jax.block_until_ready(
            ref_run(states, imgs_a))

        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        fleet = make_fleet_runner(cal, config, mesh)
        states_s, imgs_s = shard_agents(states, imgs_a, mesh)
        out_states, (acc_f, rvec_f, tvec_f) = jax.block_until_ready(
            fleet(states_s, imgs_s))

        np.testing.assert_array_equal(np.asarray(acc_f), np.asarray(acc_r))
        np.testing.assert_allclose(np.asarray(rvec_f), np.asarray(rvec_r),
                                   atol=5e-4)
        np.testing.assert_allclose(np.asarray(tvec_f), np.asarray(tvec_r),
                                   atol=5e-3)
        # every agent actually tracked
        acc = np.asarray(acc_f)
        assert (acc > 0).all(), acc

    def test_output_sharding_stays_on_agents(self, setup):
        cal, config, states, imgs_a = setup
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        fleet = make_fleet_runner(cal, config, mesh)
        states_s, imgs_s = shard_agents(states, imgs_a, mesh)
        out_states, _ = fleet(states_s, imgs_s)
        sh = out_states.cur_uv.sharding
        # agent axis stays sharded: each device holds 1/8 of the agents
        assert sh.shard_shape(out_states.cur_uv.shape)[0] == \
            out_states.cur_uv.shape[0] // 8
