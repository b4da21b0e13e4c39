"""REAL multi-process jax.distributed execution (VERDICT r3 next #6).

Round 3 only tested the single-process degrade path of
parallel/multihost.py; jax.distributed.initialize had never executed
anywhere. Here two localhost CPU processes (4 forced host devices each)
join one runtime, build the (2-host DCN) x (4-device ICI) pod mesh, and
run a decode-style tp matvec whose psums cross both axes
(tests/_mh_worker.py). Reference scope: SURVEY §2.3 row 7 — the
reference is strictly single-process; this is the green-field
capability beyond it.
"""

import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "_mh_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_init_and_psum():
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    # children must pick the cpu backend themselves (the worker calls
    # jax.config.update); drop any inherited device-count flags so the
    # worker's own XLA_FLAGS append is authoritative
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, WORKER, coord, "2", str(pid)], cwd=ROOT,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, start_new_session=True)
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            try:
                os.killpg(p.pid, 9)
            except OSError:
                p.kill()
        pytest.fail("multihost workers timed out: "
                    + repr([p.returncode for p in procs]))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {pid} rc={rc}\n{err[-2000:]}"
        assert f"MH_OK {pid}" in out, (out, err[-2000:])
