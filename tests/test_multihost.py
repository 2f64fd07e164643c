"""Multi-host smoke test for parallel/distributed.py.

Two real processes on localhost (jax.distributed coordination service), two
virtual CPU devices each, forming one 4-device global mesh.  Each process
feeds only its host-local shard (`host_local_batch` + `make_global_array`)
and runs one full GAN train step; losses must be finite and EXACTLY equal
across hosts (they are global reductions over the same sharded computation).
"""

import pytest

pytestmark = pytest.mark.slow   # spawns a 2-process jax.distributed run (~4 min)

import json
import os
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_train_step():
    addr = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    env.pop("JAX_PLATFORM_NAME", None)
    procs = [
        subprocess.Popen([sys.executable, WORKER, addr, "2", str(pid)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            # 448s solo on the 1-core CI box; headroom for a loaded machine
            # (two jax processes compile the train step concurrently)
            out, err = p.communicate(timeout=2400)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-3000:]
        outs.append(out)

    losses = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("LOSSES ")]
        assert line, out[-2000:]
        losses.append(json.loads(line[-1][len("LOSSES "):]))

    assert losses[0].keys() == losses[1].keys() and losses[0]
    for name in losses[0]:
        a, b = losses[0][name], losses[1][name]
        assert a == a and abs(a) < 1e9, (name, a)   # finite
        assert a == b, (name, a, b)                 # cross-host agreement
