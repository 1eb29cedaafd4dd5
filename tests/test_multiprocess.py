"""Multi-process MG test tier: 2 OS processes x 4 CPU devices each over
jax.distributed — validates process-boundary behavior (distributed init,
per-process shard materialisation, cross-process collectives) that the
single-process 8-virtual-device mesh cannot (ref test strategy:
cpp/src/parallel_utils.cpp:35-79 forked runners + test_*_mg.py).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_mesh():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # belt and braces; the worker also forces cpu via jax.config (the
    # axon sitecustomize overrides env vars)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=540)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, (rc, out[-2000:], err[-2000:])
        assert "MP_OK" in out, (out[-2000:], err[-2000:])
