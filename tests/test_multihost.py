"""Multi-host bootstrap under real multi-process simulation (SURVEY.md §5).

Spawns 2 JAX processes (4 virtual CPU devices each) that initialize
``jax.distributed`` through the env-var wiring and run the depth-exchange
collective over the 2x4 global mesh — the standard JAX way to validate
multi-host logic without a pod.
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_bootstrap_and_exchange():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "DPE_MVS_COORDINATOR": f"127.0.0.1:{port}",
            "DPE_MVS_NUM_PROCS": "2",
            "DPE_MVS_PROC_ID": str(pid),
            "PYTHONPATH": str(REPO),
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "multihost_driver.py")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"MULTIHOST OK p{pid}" in out, out
