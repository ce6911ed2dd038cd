#!/usr/bin/env python
"""Multi-user sweep with the DNN as a CSI source (VERDICT item 5).

The reference evaluates the DNN inside the full beamforming loop
(BER_test_maMIMO_LTF.m:347) and its generator has the numUsers>1 branch
that emits per-user datasets (generate_maMIMO_LTF.m:427-440). Here:

  1. per user u: generate a noiseless training corpus on that user's
     placement (the SAME placement the sweep uses — scenario passed
     explicitly) and train a denoiser with fit() (AWGN drawn in-jit);
  2. stack the per-user (params, bn) pytrees on a leading user axis;
  3. run the protocol-scale MU closed-loop sweep with
     sources=(ls, lmmse, dnn, perfect).

Stages are resumable (corpus .npz + fit(resume=True) checkpoints).
Writes results/mu_sweep_tpu.json.

Usage: nohup python scripts/run_mu_dnn_tpu.py > results/mu_dnn.log &
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=2)
    ap.add_argument("--packets", type=int, default=2000,
                    help="training packets per user (noiseless)")
    ap.add_argument("--sweep-packets", type=int, default=500)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--snr", type=float, nargs="+",
                    default=[-20.0, -10.0, 0.0, 10.0])
    ap.add_argument("--seed", type=int, default=3,
                    help="sweep seed = user-placement seed (3 is the "
                         "separable placement of results/mu_sweep_tpu)")
    ap.add_argument("--workdir", default="runs/mu_dnn")
    ap.add_argument("--out", default="results/mu_sweep_tpu.json")
    ap.add_argument("--num-tx", type=int, default=32)
    ap.add_argument("--num-rx", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=8)
    args = ap.parse_args()

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    from mamimo_tpu.config import SimConfig, TrainConfig
    from mamimo_tpu.eval.snr_sweep import run_mu_snr_sweep
    from mamimo_tpu.pipeline.dataset import CSIDataset, generate_dataset
    from mamimo_tpu.pipeline.multiuser import index_user, make_scenarios
    from mamimo_tpu.train import fit

    cfg = SimConfig(num_users=args.users, num_tx=args.num_tx,
                    num_rx=args.num_rx)
    tcfg = TrainConfig(epochs=args.epochs, seed=args.seed,
                       steps_per_call=16)
    # the sweep's placements: run_mu_snr_sweep does
    # make_scenarios(cfg, PRNGKey(seed)) — reproduce them here so each
    # model trains on the channel statistics of the user it will serve
    scens = make_scenarios(cfg, jax.random.PRNGKey(args.seed))

    per_user = []
    for u in range(args.users):
        udir = os.path.join(args.workdir, f"u{u}")
        os.makedirs(udir, exist_ok=True)
        train_path = os.path.join(udir, "train.npz")
        if os.path.exists(train_path):
            ds = CSIDataset.load(train_path)
            log(f"user {u}: loaded corpus ({ds.num_packets} pkts)")
        else:
            t0 = time.time()
            log(f"user {u}: generating {args.packets} noiseless pkts...")
            ds = generate_dataset(cfg, seed=args.seed,
                                  num_packets=args.packets, snr_db=120.0,
                                  chunk=32, scenario=index_user(scens, u),
                                  user=u)
            ds.save(train_path)
            log(f"user {u}: corpus in {time.time()-t0:.0f}s")
        t0 = time.time()
        res = fit(cfg, tcfg, ds, workdir=udir, resume=True)
        log(f"user {u}: trained {res.epochs_ran} epochs in "
            f"{time.time()-t0:.0f}s, best val {res.best_val.tolist()}")
        per_user.append((res.params, res.bn_state))

    # stack across users: every leaf gains a leading user axis
    mp = jax.tree.map(lambda *ls: np.stack([np.asarray(l) for l in ls]),
                      *[p for p, _ in per_user])
    mb = jax.tree.map(lambda *ls: np.stack([np.asarray(l) for l in ls]),
                      *[b for _, b in per_user])

    t0 = time.time()
    out = run_mu_snr_sweep(cfg, snr_levels=args.snr,
                           num_packets=args.sweep_packets, seed=args.seed,
                           chunk=args.chunk,
                           sources=("ls", "lmmse", "dnn", "perfect"),
                           dnn_models=(mp, mb), tcfg=tcfg)
    out["packets"] = args.sweep_packets
    out["train_packets"] = args.packets
    out["wall_s"] = round(time.time() - t0, 1)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    log(f"sweep done in {out['wall_s']}s -> {args.out}")


if __name__ == "__main__":
    main()
