"""Multi-process distributed execution test (SURVEY.md §2.9/§6,
VERDICT.md round-2 item 9): a REAL 2-process jax.distributed CPU
cluster (2 hosts x 2 virtual devices) running the exact two-phase
sharded count over a process-sharded corpus — the fake-backend
strategy of SURVEY §4 item 5.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_count(tmp_path):
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    nproc = 2
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = []
    outs = []
    for pid in range(nproc):
        out = tmp_path / f"out{pid}.txt"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker, coord, str(nproc), str(pid),
             str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    results = [p.communicate(timeout=240) for p in procs]
    for pid, (p, (so, se)) in enumerate(zip(procs, results)):
        assert p.returncode == 0, (
            f"worker {pid} rc={p.returncode}\n{se.decode()[-2000:]}")
    got_exp = [tuple(map(int, out.read_text().split())) for out in outs]
    # every process agrees, and matches the host oracle
    assert got_exp[0] == got_exp[1]
    got, exp = got_exp[0]
    assert got == exp
