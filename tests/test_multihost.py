"""True multi-process (2-host emulation) test of the DCN layer.

The reference has no multi-node story at all (SURVEY.md §2.4); this is
the multi-host test tier SURVEY.md §4 calls for: two OS processes with
2 CPU devices each join via `jax.distributed` (gloo collectives) and
run cross-process psum / sharded LS / a DP train step.
"""

import os
import socket
import subprocess
import sys

import pytest

CHILD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "_multihost_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_once():
    # NOTE: the port probe is inherently racy (probe socket closes
    # before the coordinator binds); the caller retries once.
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    return procs, outs


def test_two_process_distributed():
    procs, outs = _run_once()
    if any(p.returncode != 0 for p in procs):
        procs, outs = _run_once()          # retry once (port race)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
    oks = [[ln for ln in out.splitlines() if ln.startswith("MH_OK")]
           for out in outs]
    assert all(len(o) == 1 for o in oks), outs
    # both processes converged to the identical replicated state
    assert oks[0][0] == oks[1][0], oks
