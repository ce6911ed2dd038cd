#!/usr/bin/env python
"""Hang-watchdog for the round-5 TPU chains.

The axon tunnel can hang an RPC indefinitely (verify skill: process
blocks on futex, log goes silent, a fresh client works fine). Every
chain stage is .done-sentinel gated and checkpoint-resumable, so the
correct remedy is: detect the hang, kill the chain's process TREE by
exact PID (never by pattern), relaunch the chain.

Hang detection: total CPU time of the chain's descendant tree (walked
via /proc PPIDs) advances < CPU_EPS_S over STALL_S seconds. This is
robust to stages that are silent-but-working (corpus drains, benches
redirected to files) and tolerates cold remote compiles, which burn no
host CPU but finish well under STALL_S on these shapes.

Runs chain_r5c.sh to completion (all sentinels present), then
chain_r5d.sh; per-chain launch cap so a deterministically failing
stage can't loop forever; hard deadline so it never fights a future
session for the chip.
"""

import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHAINS = [
    ("scripts/chain_r5c.sh", ["bs64_accuracy", "bench_r5", "gen_bench_r5",
                              "train_bench_r5", "fetch_probe",
                              "tpu_checks_final"], "r5c"),
    ("scripts/chain_r5d.sh", ["bs64_closed_loop", "cg_grid_nt64",
                              "cg_grid_nt32"], "r5d"),
]
STALL_S = 900          # CPU-flat window that counts as a hang
CPU_EPS_S = 2.0        # "flat" = less than this much CPU over STALL_S
POLL_S = 60
MAX_LAUNCHES = 6       # per chain: failing-stage loop guard
DEADLINE = time.time() + 5 * 3600

LOG = open(os.path.join(REPO, "results", "watchdog_r5.log"), "a", buffering=1)


def log(msg):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


def descendants(root_pid):
    """All live descendant pids of root_pid (incl. itself), via /proc."""
    ppid_map = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            ppid_map.setdefault(int(parts[1]), []).append(int(d))
        except (OSError, IndexError, ValueError):
            continue
    out, stack = [], [root_pid]
    while stack:
        p = stack.pop()
        out.append(p)
        stack.extend(ppid_map.get(p, []))
    return out


def tree_cpu_s(root_pid):
    total = 0.0
    hz = os.sysconf("SC_CLK_TCK")
    for p in descendants(root_pid):
        try:
            with open(f"/proc/{p}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            total += (int(parts[11]) + int(parts[12])) / hz
        except (OSError, IndexError, ValueError):
            continue
    return total


def kill_tree(root_pid):
    pids = descendants(root_pid)
    log(f"killing tree of {root_pid}: {pids}")
    for sig in (signal.SIGTERM, signal.SIGKILL):
        for p in pids:
            try:
                os.kill(p, sig)
            except OSError:
                pass
        time.sleep(3)


def chain_done(names, prefix):
    return all(os.path.exists(
        os.path.join(REPO, "results", f"{prefix}_{n}.done")) for n in names)


def run_chain(script, names, prefix):
    launches = 0
    while not chain_done(names, prefix):
        if time.time() > DEADLINE:
            log("deadline reached; stopping")
            return False
        if launches >= MAX_LAUNCHES:
            log(f"{script}: launch cap {MAX_LAUNCHES} hit; moving on")
            return False
        launches += 1
        log(f"launching {script} (attempt {launches})")
        proc = subprocess.Popen(["bash", script], cwd=REPO,
                                start_new_session=True)
        last_cpu, flat_since = 0.0, time.time()
        while proc.poll() is None:
            time.sleep(POLL_S)
            if time.time() > DEADLINE:
                log("deadline reached mid-chain; killing + stopping")
                kill_tree(proc.pid)
                return False
            cpu = tree_cpu_s(proc.pid)
            if cpu - last_cpu >= CPU_EPS_S:
                last_cpu, flat_since = cpu, time.time()
            elif time.time() - flat_since > STALL_S:
                log(f"HANG: tree CPU flat {time.time()-flat_since:.0f}s "
                    f"(cpu={cpu:.1f}s); restarting chain")
                kill_tree(proc.pid)
                break
        rc = proc.poll()
        log(f"{script} attempt {launches} ended rc={rc} "
            f"done={chain_done(names, prefix)}")
    return True


def main():
    # refuse to run twice (pidfile with liveness check)
    pidfile = os.path.join(REPO, "results", "watchdog_r5.pid")
    if os.path.exists(pidfile):
        try:
            old = int(open(pidfile).read())
            os.kill(old, 0)
            log(f"another watchdog (pid {old}) is alive; exiting")
            sys.exit(0)
        except (OSError, ValueError):
            pass
    with open(pidfile, "w") as f:
        f.write(str(os.getpid()))

    log(f"=== watchdog start (pid {os.getpid()}) ===")
    for script, names, prefix in CHAINS:
        ok = run_chain(script, names, prefix)
        log(f"{script}: {'complete' if ok else 'INCOMPLETE'}")
        if time.time() > DEADLINE:
            break
    log("=== watchdog exit ===")
    os.unlink(pidfile)


if __name__ == "__main__":
    main()
