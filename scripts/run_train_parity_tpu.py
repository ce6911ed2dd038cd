#!/usr/bin/env python
"""Training parity gates for the throughput knobs: train the BS32
model from the same seed under each variant and compare the best
validation MSE against the f32/threefry baseline. A knob is a
legitimate speed default only if converged quality is the same within
noise. Variants (VERDICT r3 item 1b):

  f32              baseline (threefry AWGN, f32 matmuls, f32 Adam)
  bf16             bf16 matmul operand storage
  f32_rbg          hardware RngBitGenerator AWGN draw
  bf16_rbg_mubf16  the full production-candidate stack: bf16 matmuls
                   + rbg AWGN + bf16 Adam first moment

Each run is checkpoint-resumable in its own workdir. Writes
results/train_parity.json with per-variant best val MSE and dB deltas
vs f32.
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
    ap.add_argument("--variants",
                    default="f32,bf16,f32_rbg,bf16_rbg_mubf16")
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

    variants = tuple(args.variants.split(","))
    out = {"config": f"BS{args.num_tx}", "packets": ds.num_packets,
           "epochs": args.epochs, "runs": {}}
    # merge an existing artifact so already-finished variants survive a
    # re-run with a wider variant list
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                prev = json.load(f)
            if (prev.get("packets") == out["packets"]
                    and prev.get("epochs") == out["epochs"]):
                out["runs"].update(prev.get("runs", {}))
        except Exception:
            pass
    for prec in variants:
        if prec in out["runs"]:
            log(f"{prec}: already in artifact, skipping")
            continue
        awgn = "threefry"
        if "_rbgclt" in prec:
            awgn = "rbg_clt"   # Irwin-Hall byte-sum draw (round 5)
        elif "_rbg" in prec:
            awgn = "rbg"
        tcfg = TrainConfig(
            epochs=args.epochs, seed=0, steps_per_call=16,
            matmul_dtype=prec.split("_")[0],
            awgn_rng=awgn,
            opt_dtype=("bf16" if "_mubf16" in prec else "f32"))
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
        # write incrementally so an interrupted chain keeps finished runs
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)

    if "f32" in out["runs"]:
        f32 = np.asarray(out["runs"]["f32"]["best_val_mse"])
        out["parity_db"] = {}
        for prec, run in out["runs"].items():
            if prec == "f32":
                continue
            r = np.asarray(run["best_val_mse"]) / f32
            out["parity_db"][prec] = [float(10 * np.log10(v)) for v in r]
        # backwards-compat field (round-3 consumers)
        if "bf16" in out["runs"]:
            b16 = np.asarray(out["runs"]["bf16"]["best_val_mse"])
            out["val_mse_ratio_bf16_over_f32"] = [
                float(r) for r in (b16 / f32)]
    else:
        # no f32 baseline among the variants (and none resumed from a
        # prior artifact): keep the per-run results, skip the ratio
        out["parity_db"] = {}
        log("f32 baseline absent; skipping parity computation")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    log(f"parity vs f32 (dB per plane): {out['parity_db']} -> {args.out}")


if __name__ == "__main__":
    main()
