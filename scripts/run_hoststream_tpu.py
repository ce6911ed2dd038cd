#!/usr/bin/env python
"""Host-streaming at real scale (VERDICT r2 item 9): train one epoch on
a LARGER-THAN-HBM BS64 corpus with fit(host_stream=True) — the native
C++ loader's reason to exist — and compare against the in-HBM path.

Corpus: real generated BS64 packets tiled on host to exceed the 16 GB
v5e HBM (tiling changes nothing about IO or step cost — only bytes
moved matter for throughput; the in-HBM comparison uses a slice of the
same corpus that fits). The in-HBM run measures per-step time on the
same batch size so the epoch figures are directly comparable.

Writes results/hoststream_scale.json.
"""

import dataclasses
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
    ap.add_argument("--seed-packets", type=int, default=250)
    ap.add_argument("--tile", type=int, default=48,
                    help="host replication factor (48*250=12000 pkts "
                         "= 19.4 GB raw > 16 GB HBM)")
    ap.add_argument("--inhbm-packets", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--workdir", default="runs/hoststream")
    ap.add_argument("--out", default="results/hoststream_scale.json")
    ap.add_argument("--num-tx", type=int, default=64)
    ap.add_argument("--num-rx", type=int, default=8)
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

    seed_path = os.path.join(args.workdir, "seed.npz")
    if os.path.exists(seed_path):
        seed_ds = CSIDataset.load(seed_path)
        log(f"loaded seed corpus ({seed_ds.num_packets} pkts)")
    else:
        t0 = time.time()
        log(f"generating {args.seed_packets} BS64 packets on-chip...")
        seed_ds = generate_dataset(cfg, seed=7,
                                   num_packets=args.seed_packets,
                                   snr_db=120.0, chunk=25)
        seed_ds.save(seed_path)
        log(f"seed corpus in {time.time()-t0:.0f}s")

    def tiled(ds, k):
        """Replicate packets k× on host (IO-identical to a k×-larger
        generated corpus; content does not affect step cost). Memory-
        lean: h_perfect is ALIASED to h_ls (fit never reads it; the
        first attempt OOM-killed the host at 125 GB with three 11.5 GiB
        replicas + the 25 GiB raw page cache)."""
        rep = lambda a: (np.concatenate([a] * k, axis=0)
                         if a is not None else None)
        h_ls = rep(ds.h_ls)
        return dataclasses.replace(
            ds, rx=rep(ds.rx), h_ls=h_ls,
            h_perfect=h_ls, snr_cs=rep(ds.snr_cs),
            noise_db=rep(ds.noise_db), tau=rep(ds.tau),
            chan_delay=rep(ds.chan_delay), h_mmse=None, ber=None)

    big = tiled(seed_ds, args.tile)
    raw_gb = (big.rx.nbytes + big.h_ls.nbytes) / 2**30
    log(f"host corpus: {big.num_packets} pkts, raw {raw_gb:.1f} GiB "
        f"(HBM is 16 GiB)")

    tcfg = TrainConfig(epochs=1, batch_size=args.batch, seed=0,
                       early_stop_patience=10**6, val_train_ratio=0.02)

    # --- host-streamed epoch on the larger-than-HBM corpus ---
    t0 = time.time()
    res = fit(cfg, tcfg, big, workdir=args.workdir, host_stream=True)
    t_stream = time.time() - t0
    n_steps = int(big.num_samples * (1 - tcfg.val_train_ratio)
                  // args.batch)
    log(f"host-stream epoch: {t_stream:.0f}s "
        f"(~{t_stream/max(n_steps,1)*1e3:.2f} ms/step, {n_steps} steps)")
    big_pkts = big.num_packets
    del big                     # free ~19 GiB before the in-HBM corpus

    # --- in-HBM epoch on a fitting slice, same step shape ---
    small = tiled(seed_ds, max(1, args.inhbm_packets
                               // seed_ds.num_packets))
    small_gb = (small.rx.nbytes + small.h_ls.nbytes) / 2**30
    t0 = time.time()
    res2 = fit(cfg, tcfg, small, host_stream=False)
    t_hbm = time.time() - t0
    n2 = int(small.num_samples * (1 - tcfg.val_train_ratio)
             // args.batch)
    log(f"in-HBM epoch ({small.num_packets} pkts, {small_gb:.1f} GiB): "
        f"{t_hbm:.0f}s (~{t_hbm/max(n2,1)*1e3:.2f} ms/step, {n2} steps)")

    out = {
        "config": f"BS{args.num_tx}", "batch": args.batch,
        "stream": {"packets": big_pkts, "raw_gib": round(raw_gb, 2),
                   "epoch_s": round(t_stream, 1), "steps": n_steps,
                   "ms_per_step": round(t_stream / max(n_steps, 1) * 1e3,
                                        3)},
        "in_hbm": {"packets": small.num_packets,
                   "gib": round(small_gb, 2),
                   "epoch_s": round(t_hbm, 1), "steps": n2,
                   "ms_per_step": round(t_hbm / max(n2, 1) * 1e3, 3)},
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
