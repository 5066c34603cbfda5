"""Fleet front-end: the multi-agent tracker sharded over a device mesh.

The single-chip multi-agent runner (frontend/tracker.py
``make_multi_agent_runner``) tracks A agents concurrently by vmapping the
per-frame step and routing all agents' tracks through one shared atlas-LK
call.  This module scales that A axis across chips: agents are
data-parallel (SLAM front-ends never communicate — collaboration happens in
the joint BA, mqslam_tpu.multiagent + parallel.sharded_ba), so the mesh
sharding is a pure ``shard_map`` over the agent axis with ZERO collectives:
each device runs the full atlas runner on its A/n resident agents, images
stream HBM-local, and nothing crosses ICI until the BA stage.

No counterpart exists in the reference (one Python 2 process per camera,
SURVEY.md §2.11); the semantics are "N independent slam2.py front-ends"
(reference: Work/SLAM/application/own/slam2.py:360-695) batched per chip
and laid out over the fleet.
"""

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mqslam_tpu.core import camera as cam_mod
from mqslam_tpu.frontend import tracker as trk

__all__ = ["make_fleet_runner", "shard_agents"]


def _agent_spec(ndim: int, axis: str) -> P:
    """Shard the leading (agent) axis, replicate the rest."""
    return P(*((axis,) + (None,) * (ndim - 1)))


def shard_agents(states, imgs, mesh: Mesh, axis: str = "data"):
    """Place A-leading tracker states + image stacks [A, T+1, H, W]
    agent-sharded on the mesh; A must be divisible by the mesh axis size."""
    states = jax.tree_util.tree_map(
        lambda a: jax.device_put(
            a, NamedSharding(mesh, _agent_spec(a.ndim, axis))), states)
    imgs = jax.device_put(
        imgs, NamedSharding(mesh, P(axis, None, None, None)))
    return states, imgs


def make_fleet_runner(cal: cam_mod.Cal3DS2, config: trk.TrackerConfig,
                      mesh: Mesh, axis: str = "data",
                      collect: bool = False):
    """Jitted fleet runner: (states [A-stacked], imgs [A, T+1, H, W]) ->
    (final states, per-frame (accepted [T, A], rvec [T, A, 3],
    tvec [T, A, 3])), with the agent axis sharded over ``mesh[axis]``.

    Each mesh slice runs the one-chip atlas runner on its local agents —
    the per-device executable is identical to the single-chip
    ``make_multi_agent_runner`` program, so per-chip throughput carries
    over and aggregate fleet throughput is devices x that.

    ``collect=True`` adds the per-frame track-level outputs (see
    make_multi_agent_runner) so per-agent BA dumps can be rebuilt on
    host (multiagent.fleet_dump) and merged into the joint graph — the
    fleet -> merge -> sharded-BA pipeline (BASELINE config #5 shape).
    """
    run_local = trk.make_multi_agent_runner(cal, config, collect=collect)

    def fleet(states, imgs):
        in_specs = (
            jax.tree_util.tree_map(
                lambda a: _agent_spec(a.ndim, axis), states),
            P(axis, None, None, None),
        )
        # scan outputs are [T, A_local, ...]: agent axis is axis 1
        st_specs = jax.tree_util.tree_map(
            lambda a: _agent_spec(a.ndim, axis), states)
        out_shapes = jax.eval_shape(run_local, states, imgs)[1]
        out_specs = (
            st_specs,
            jax.tree_util.tree_map(
                lambda s: P(None, axis, *((None,) * (s.ndim - 2))),
                out_shapes),
        )
        return jax.shard_map(run_local, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)(
                                 states, imgs)

    return jax.jit(fleet)
