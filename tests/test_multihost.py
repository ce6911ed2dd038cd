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


FIT_CHILD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "_multihost_fit_child.py")


def _run_fit_once(workdir):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, FIT_CHILD, str(i), str(port), workdir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
        )
        for i in range(2)
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
    return procs, outs


def test_two_process_fit(tmp_path):
    """VERDICT r4 #4: a FULL multi-process fit() — N epochs of
    cross-process DP with per-epoch validation, early-stop/plateau
    machinery, and mesh checkpoints written by process 0 — must keep
    the replicated state bitwise identical on both processes AND match
    the loss trajectory of a single-process 4-device fit of the same
    problem."""
    import json

    import jax
    import numpy as np

    wd = str(tmp_path / "mh_fit")
    procs, outs = _run_fit_once(wd)
    if any(p.returncode != 0 for p in procs):
        procs, outs = _run_fit_once(wd)    # retry once (port race)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
    oks = [[ln for ln in out.splitlines() if ln.startswith("MH_FIT_OK")]
           for out in outs]
    assert all(len(o) == 1 for o in oks), outs
    # bitwise-identical replicated final state + loss history
    assert oks[0][0] == oks[1][0], oks

    # process 0 wrote the mesh checkpoints + history artifact
    assert os.path.exists(os.path.join(wd, "best.json"))
    assert os.path.exists(os.path.join(wd, "history.json"))

    # loss parity with a single-process fit on a 4-device local mesh
    # (same corpus seed, same training seed; identical batch schedule)
    from mamimo_tpu.config import SimConfig, TrainConfig
    from mamimo_tpu.parallel.mesh import make_mesh
    from mamimo_tpu.pipeline.dataset import generate_dataset
    from mamimo_tpu.train import fit

    cfg = SimConfig(num_tx=8, num_rx=2, n_scatterers=8, n_rays=20)
    ds = generate_dataset(cfg, seed=5, num_packets=12, snr_db=120.0,
                          chunk=12)
    tcfg = TrainConfig(hidden=(32, 32), batch_size=32, epochs=4, seed=3,
                       dropout=0.0, early_stop_patience=50)
    mesh = make_mesh({"data": 4}, devices=jax.devices()[:4])
    res = fit(cfg, tcfg, ds, mesh=mesh, verbose=False)

    with open(os.path.join(wd, "history.json")) as f:
        mh_hist = json.load(f)
    for k in ("loss_real", "loss_imag", "val_loss_real", "val_loss_imag"):
        np.testing.assert_allclose(
            np.asarray(mh_hist[k]), np.asarray(res.history[k]),
            rtol=1e-4, err_msg=k)
