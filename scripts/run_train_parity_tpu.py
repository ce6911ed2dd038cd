#!/usr/bin/env python
"""bf16-matmul training parity check (VERDICT r2 item 3): train the
BS32 model twice from the same seed — matmul_dtype='f32' vs 'bf16' —
and compare the early-stopped best validation MSE. Gates the bf16 train
option: it is a legitimate speed knob only if the converged quality is
the same within noise.

Writes results/train_parity.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--packets", type=int, default=1000)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--num-tx", type=int, default=32)
    ap.add_argument("--num-rx", type=int, default=4)
    ap.add_argument("--workdir", default="runs/train_parity")
    ap.add_argument("--out", default="results/train_parity.json")
    args = ap.parse_args()

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    from mamimo_tpu.config import SimConfig, TrainConfig
    from mamimo_tpu.pipeline.dataset import CSIDataset, generate_dataset
    from mamimo_tpu.train import fit

    cfg = SimConfig(num_tx=args.num_tx, num_rx=args.num_rx)
    os.makedirs(args.workdir, exist_ok=True)
    path = os.path.join(args.workdir, "train.npz")
    if os.path.exists(path):
        ds = CSIDataset.load(path)
        log(f"loaded corpus ({ds.num_packets} pkts)")
    else:
        t0 = time.time()
        log(f"generating {args.packets} noiseless packets...")
        ds = generate_dataset(cfg, seed=21, num_packets=args.packets,
                              snr_db=120.0, chunk=25)
        ds.save(path)
        log(f"corpus in {time.time()-t0:.0f}s")

    out = {"config": f"BS{args.num_tx}", "packets": ds.num_packets,
           "epochs": args.epochs, "runs": {}}
    for prec in ("f32", "bf16"):
        tcfg = TrainConfig(epochs=args.epochs, seed=0, steps_per_call=16,
                           matmul_dtype=prec)
        t0 = time.time()
        res = fit(cfg, tcfg, ds, workdir=os.path.join(args.workdir, prec),
                  resume=True)
        dt = time.time() - t0
        out["runs"][prec] = {
            "best_val_mse": [float(v) for v in res.best_val],
            "epochs_ran": res.epochs_ran,
            "wall_s": round(dt, 1),
            "s_per_epoch": round(dt / max(res.epochs_ran, 1), 2),
        }
        log(f"{prec}: best val {res.best_val.tolist()} "
            f"({res.epochs_ran} epochs, {dt:.0f}s)")

    f32 = np.asarray(out["runs"]["f32"]["best_val_mse"])
    b16 = np.asarray(out["runs"]["bf16"]["best_val_mse"])
    out["val_mse_ratio_bf16_over_f32"] = [float(r) for r in (b16 / f32)]
    out["parity_db"] = [float(10 * np.log10(r)) for r in (b16 / f32)]
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    log(f"parity (bf16 vs f32, dB per plane): {out['parity_db']} "
        f"-> {args.out}")


if __name__ == "__main__":
    main()
