"""Real multi-process jax.distributed test (SURVEY §4: multi-host tests
via multi-process simulation): two OS processes, 4 virtual CPU devices
each, form one 8-device mesh; each process feeds only its half of the
stream and the sharded scan decodes packets living in both halves."""

import json
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = str(Path(__file__).resolve().parents[1])


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_scan(tmp_path):
    port = _free_port()
    out_path = tmp_path / "result.json"
    procs = []
    for pid in (0, 1):
        procs.append(subprocess.Popen(
            [sys.executable, "tests/multihost_worker.py", str(pid), "2",
             str(port), str(out_path)],
            cwd=REPO,
            env={"PYTHONPATH": REPO, "PATH": "/usr/bin:/bin",
                 "HOME": "/root"},
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-2000:]
    result = json.loads(out_path.read_text())
    chans = sorted(r["ch"] for r in result)
    # one packet in process 0's half (ch37) and one in process 1's (ch17)
    assert chans == [17, 37], result
