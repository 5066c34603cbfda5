"""Checkpoint / resume for the front-end sequence runner.

The reference's only recovery story is the periodic trajectory/map flush
(reference: slam2.py:1244-1248 write_output every 30 frames) — state is
lost on interruption. Here the FULL resumable state is serialized: the
fixed-capacity TrackerState pytree (including the PRNG key, so the resumed
run is bit-identical to an uninterrupted one), the host bookkeeping
(per-frame poses with rejection holes, accepted flags, BA-info container,
tracking history) and the sequence cursor.

Format: one ``.npz`` — TrackerState leaves as named arrays + one pickled
blob for the host bookkeeping. (orbax is aimed at sharded many-host train
states; this state is a few MB on one host, where a self-contained npz is
the simpler, stabler artifact.)
"""

import io
import pickle

import numpy as np
import jax.numpy as jnp

from mqslam_tpu.frontend.tracker import TrackerState

__all__ = ["save_checkpoint", "load_checkpoint"]

_VERSION = 1


def save_checkpoint(path, state: TrackerState, frame_idx: int, prev_img,
                    poses, accepted, bookkeeping=None):
    """Write a resumable checkpoint after processing frame ``frame_idx``.

    poses: list of (4x4 ndarray | None); accepted: list of int flags;
    bookkeeping: any picklable extras (BAData, history, ...).
    """
    arrays = {f"state_{name}": np.asarray(val)
              for name, val in zip(TrackerState._fields, state)}
    pose_stack = np.stack([np.eye(4) if P is None else np.asarray(P)
                           for P in poses]) if poses else np.zeros((0, 4, 4))
    pose_valid = np.asarray([P is not None for P in poses], bool)
    blob = pickle.dumps({"bookkeeping": bookkeeping})
    np.savez_compressed(
        path, __version=np.int32(_VERSION),
        frame_idx=np.int64(frame_idx), prev_img=np.asarray(prev_img),
        poses=pose_stack, pose_valid=pose_valid,
        accepted=np.asarray(accepted, np.int32),
        host_blob=np.frombuffer(blob, np.uint8), **arrays)


def load_checkpoint(path):
    """Returns (state, frame_idx, prev_img, poses, accepted, bookkeeping)."""
    z = np.load(path, allow_pickle=False)
    if int(z["__version"]) != _VERSION:
        raise ValueError(f"checkpoint version {int(z['__version'])} "
                         f"unsupported (want {_VERSION})")
    state = TrackerState(*(jnp.asarray(z[f"state_{name}"])
                           for name in TrackerState._fields))
    poses = [P if ok else None
             for P, ok in zip(z["poses"], z["pose_valid"])]
    blob = pickle.loads(z["host_blob"].tobytes())
    return (state, int(z["frame_idx"]), np.asarray(z["prev_img"]),
            poses, list(z["accepted"]), blob["bookkeeping"])
