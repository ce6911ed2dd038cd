#!/usr/bin/env python
"""Measured artifact for the NoiseFigure receiver branch (VERDICT r3
weak #5): the useNoiseFig=true path of generate_maMIMO_LTF.m:252-295
(phased.ReceiverPreamp semantics, thermal noise from bandwidth + NF)
— implemented in channel/noise.py::receiver_chain_nf and unit-tested,
but never measured until now.

Sweeps the receiver noise figure, reporting the realized sounding SNR
and LS/LMMSE NMSE per level (500 pkts), plus one closed-loop row at
the default NF=8 dB. Writes results/nf_sweep.json.
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
    ap.add_argument("--packets", type=int, default=500)
    ap.add_argument("--cl-packets", type=int, default=100)
    ap.add_argument("--nf", type=float, nargs="+",
                    default=[2.0, 8.0, 14.0, 20.0])
    ap.add_argument("--seed", type=int, default=13)
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--out", default="results/nf_sweep.json")
    args = ap.parse_args()

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    from mamimo_tpu.config import SimConfig
    from mamimo_tpu.eval.closed_loop import evaluate_closed_loop, nmse_vs_snr
    from mamimo_tpu.eval.snr_sweep import compute_ci
    from mamimo_tpu.pipeline.dataset import generate_dataset

    t0 = time.time()
    out = {"config": "BS32", "packets": args.packets,
           "cl_packets": args.cl_packets, "noise_figure_db": args.nf,
           "levels": []}
    for nf in args.nf:
        cfg = SimConfig(noise_figure=nf)
        ds = generate_dataset(
            cfg, seed=args.seed, num_packets=args.packets, snr_db=0.0,
            noise_mode="nf", with_mmse=True, chunk=args.chunk)
        nm = nmse_vs_snr(ds)
        lvl = {
            "noise_figure_db": nf,
            "mean_snr_db": float(np.mean(ds.snr_cs)),
            "nmse_db": {k: float(10 * np.log10(np.mean(v) + 1e-30))
                        for k, v in nm.items()},
            "nmse_ci": {k: list(compute_ci(v)) for k, v in nm.items()},
        }
        if nf == 8.0:          # reference default: one closed-loop row
            cl = evaluate_closed_loop(
                ds, sources=("ls", "lmmse", "perfect"),
                max_packets=args.cl_packets)
            lvl["closed_loop"] = {k: m.summary() for k, m in cl.items()}
        out["levels"].append(lvl)
        log(f"NF={nf} dB: realized SNR {lvl['mean_snr_db']:.1f} dB, "
            f"LS {lvl['nmse_db']['ls']:.2f} dB, "
            f"LMMSE {lvl['nmse_db']['lmmse']:.2f} dB")
        out["wall_s"] = round(time.time() - t0, 1)
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
    log(f"done in {out['wall_s']}s -> {args.out}")


if __name__ == "__main__":
    main()
