#!/usr/bin/env python
"""Multi-user (JSDM) closed-loop sweep on the TPU — the numUsers>1
protocol leg (generate_maMIMO_LTF.m:427-440,531-640 equivalent).

U=2 spatially separable users, LS vs perfect CSI, BER/EVM/BF-gain with
95% CIs per user. Writes results/mu_sweep_tpu.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=2)
    ap.add_argument("--packets", type=int, default=100)
    ap.add_argument("--snr", type=float, nargs="+",
                    default=[-20.0, -10.0, 0.0, 10.0])
    ap.add_argument("--seed", type=int, default=3)  # separable placement
    ap.add_argument("--out", default="results/mu_sweep_tpu.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    from mamimo_tpu.config import SimConfig
    from mamimo_tpu.eval.snr_sweep import run_mu_snr_sweep

    cfg = SimConfig(num_users=args.users)
    t0 = time.time()
    out = run_mu_snr_sweep(cfg, snr_levels=args.snr,
                           num_packets=args.packets, seed=args.seed)
    out["packets"] = args.packets
    out["wall_s"] = round(time.time() - t0, 1)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    log(f"done in {out['wall_s']}s -> {args.out}")


if __name__ == "__main__":
    main()
