"""Multi-process (multi-host) data-path test: two ``jax.distributed``
processes on localhost, each owning 2 virtual CPU devices, train one dRAM
step over the shared 4-device 'data' mesh.

Covers the DDP-world parity surface (reference ``train.py:70,103``,
``utils.py:66-80``): per-process sub-batch assembly
(``shard_batch`` → ``make_array_from_process_local_data``), cross-process
gradient psums, ``process_local_data`` extraction of per-sample outputs,
and the ``process_allgather`` epoch-end branch.
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "mp_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_step(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 2-device flag
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), "2", str(port),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
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
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"MP-OK pid={pid}" in out
    # both processes computed the same global-step loss
    losses = {(tmp_path / f"ok_{pid}").read_text() for pid in range(2)}
    assert len(losses) == 1, losses
