"""True multi-process distributed BA (config #5's DCN path).

Spawns two OS processes that form a jax.distributed cluster (Gloo over
localhost), each contributing 4 virtual CPU devices to one 8-device global
mesh, and runs the sharded LM solve jointly — the same code path a
multi-host TPU pod slice uses (mqslam_tpu/parallel/multihost.py), with
cross-process collectives actually exercised (unlike the in-process
8-device tests in test_parallel.py).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mh_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_ba():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the workers set their own XLA_FLAGS/JAX_PLATFORMS before importing jax
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"[proc {pid}] OK" in out, out[-3000:]
