"""True multi-process mesh test: two jax.distributed processes on localhost
(the multi-host validation layer the reference lacks, SURVEY §4).

Each process owns 4 virtual CPU devices; the 8-device global mesh runs the
scenario-sharded Schur solve (cross-process collectives via Gloo) and the
batched instance-parallel solve (process_allgather for stats)."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_two_processes(mode: str, timeout=420):
    port = _free_port()
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "benchmarks", "multihost.py"),
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(i),
             "--mode", mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd=REPO, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"multi-process {mode} run timed out")
        outs.append(out)
    assert all(p.returncode == 0 for p in procs), outs[0][-2000:]
    return outs[0]


@pytest.mark.slow
def test_two_process_schur():
    out = _run_two_processes("schur")
    assert "SOLVE_SUCCEEDED" in out
    assert "over 8 devices" in out


@pytest.mark.slow
def test_two_process_batched():
    out = _run_two_processes("batched")
    assert "16/16 solved" in out
