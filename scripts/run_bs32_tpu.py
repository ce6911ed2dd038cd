#!/usr/bin/env python
"""Full BS32/BS64 paper-configuration run on the TPU.

Stages (each logged + checkpointed so the run is resumable):
  0. micro-fit sanity (32 packets, 2 epochs) — verifies every program
     compiles on the chip before committing to the long run
  1. generate the noiseless training corpus (SNR=120)
  2. train the denoiser (early stopping)
  3. per-SNR test sets + DNN predictions + NMSE sweep (+ optional
     closed loop)

Usage: nohup python scripts/run_bs32_tpu.py [--packets 3000] &
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--packets", type=int, default=3000)
    ap.add_argument("--num-tx", type=int, default=32)
    ap.add_argument("--num-rx", type=int, default=4)
    ap.add_argument("--test-packets", type=int, default=500)
    # BS32 val MSE plateaus by ~epoch 30 (runs/bs32_paper/history.json);
    # 150 caps the wall clock while staying well past the plateau +
    # early-stop window (patience 25)
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--snr", type=float, nargs="+",
                    default=[-25, -20, -15, -10, -5, 0, 5, 10])
    ap.add_argument("--workdir", default="runs/bs32")
    ap.add_argument("--closed-loop", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    from mamimo_tpu.config import SimConfig, TrainConfig
    from mamimo_tpu.pipeline.dataset import generate_dataset
    from mamimo_tpu.train import fit

    cfg = SimConfig(num_tx=args.num_tx, num_rx=args.num_rx)
    # 16 fused optimizer steps per dispatch: amortizes the ~60 ms tunnel
    # RPC per call (73 s/epoch -> ~10 s/epoch), bitwise-same trajectory
    tcfg = TrainConfig(epochs=args.epochs, seed=args.seed,
                       steps_per_call=16)
    os.makedirs(args.workdir, exist_ok=True)

    # ---- stage 0: micro sanity ----
    t0 = time.time()
    log("stage 0: micro-fit sanity (compiles every program)...")
    # chunk matches stage 1 so the generation program compiles once
    mini = generate_dataset(cfg, seed=99, num_packets=32, snr_db=120.0,
                            chunk=32)
    mini_t = TrainConfig(hidden=tcfg.hidden, batch_size=256, epochs=2,
                         early_stop_patience=50, seed=1)
    res = fit(cfg, mini_t, mini, verbose=False)
    log(f"stage 0 OK in {time.time()-t0:.0f}s "
        f"(losses {res.history['loss_real']})")

    # ---- stage 1: training corpus ----
    train_path = os.path.join(args.workdir, "train.npz")
    if os.path.exists(train_path):
        from mamimo_tpu.pipeline.dataset import CSIDataset
        train_ds = CSIDataset.load(train_path)
        log(f"stage 1: loaded existing corpus ({train_ds.num_packets} pkts)")
    else:
        t0 = time.time()
        log(f"stage 1: generating {args.packets} noiseless packets...")
        train_ds = generate_dataset(cfg, seed=args.seed,
                                    num_packets=args.packets,
                                    snr_db=120.0, chunk=32)
        train_ds.save(train_path)
        log(f"stage 1 OK in {time.time()-t0:.0f}s -> {train_path}")

    # ---- stage 2: train ----
    t0 = time.time()
    log("stage 2: training...")
    res = fit(cfg, tcfg, train_ds, workdir=args.workdir, resume=True)
    log(f"stage 2 OK in {time.time()-t0:.0f}s: {res.epochs_ran} epochs, "
        f"best val {res.best_val.tolist()}")

    # ---- stage 3: sweep (one subprocess per SNR level) ----
    # the tunnel client leaks host memory across RPCs (a single-process
    # 15-level sweep was OOM-killed at 108 GB); run_sweep_stage3.py is
    # per-level resumable, loads only the scenario from the corpus npz,
    # and each level's process exits cleanly
    import subprocess

    t0 = time.time()
    log("stage 3: SNR sweep (training placement, fresh channel seeds, "
        "per-level subprocesses)...")
    here = os.path.dirname(os.path.abspath(__file__))
    for snr in args.snr:
        rc = subprocess.run(
            [sys.executable, os.path.join(here, "run_sweep_stage3.py"),
             "--workdir", args.workdir, "--snr", str(snr),
             "--packets", str(args.test_packets),
             "--seed", str(args.seed + 1)]).returncode
        log(f"stage 3 level {snr:+.0f} rc={rc}")
    outdir = os.path.join(args.workdir, "test_results")
    log(f"stage 3 OK in {time.time()-t0:.0f}s -> {outdir}/sweep.json")
    with open(os.path.join(outdir, "sweep.json")) as f:
        nmse = json.load(f)["nmse"]
    log("summary NMSE(dB): " + json.dumps({
        s: [round(10 * __import__('math').log10(v + 1e-30), 2)
            for v in vals]
        for s, vals in nmse.items()}))


if __name__ == "__main__":
    main()
