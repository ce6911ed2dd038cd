#!/usr/bin/env python
"""SINR-mode measured artifact (generate_maMIMO_LTF_SINR.m equivalent):
fixed −85 dBm noise floor + explicit interference, swept over
interference power, NMSE + closed loop per level.

Writes results/sinr_sweep.json. Documented deviations from the
reference (channel/noise.py::interference_chain): SINR is computed from
the MEASURED received power (the reference predicts it from
Tx power − spLoss, :229-239), and noise/interference are proper
circular CN draws (the reference's std*(randn+1j*randn) is 3 dB hotter
than nominal, :243-250).
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
    ap.add_argument("--packets", type=int, default=500)
    ap.add_argument("--cl-packets", type=int, default=100)
    ap.add_argument("--interference", type=float, nargs="+",
                    default=[-75.0, -65.0, -55.0, -45.0])
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--out", default="results/sinr_sweep.json")
    args = ap.parse_args()

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    from mamimo_tpu.config import SimConfig
    from mamimo_tpu.eval.closed_loop import evaluate_closed_loop, nmse_vs_snr
    from mamimo_tpu.eval.snr_sweep import compute_ci
    from mamimo_tpu.pipeline.dataset import generate_dataset

    cfg = SimConfig()
    t0 = time.time()
    out = {"config": "BS32", "noise_floor_dbm": -85.0,
           "packets": args.packets, "cl_packets": args.cl_packets,
           "interference_dbm": args.interference, "levels": []}
    for intf in args.interference:
        ds = generate_dataset(
            cfg, seed=args.seed, num_packets=args.packets, snr_db=0.0,
            noise_mode="sinr", with_mmse=True, chunk=args.chunk,
            interference_dbm=intf)
        nm = nmse_vs_snr(ds)
        cl = evaluate_closed_loop(ds, sources=("ls", "lmmse", "perfect"),
                                  max_packets=args.cl_packets)
        lvl = {
            "interference_dbm": intf,
            "mean_sinr_db": float(np.mean(ds.snr_cs)),
            "nmse_db": {k: float(10 * np.log10(np.mean(v) + 1e-30))
                        for k, v in nm.items()},
            "nmse_ci": {k: list(compute_ci(v)) for k, v in nm.items()},
            "closed_loop": {k: m.summary() for k, m in cl.items()},
        }
        out["levels"].append(lvl)
        log(f"I={intf} dBm: SINR {lvl['mean_sinr_db']:.1f} dB, "
            f"LS {lvl['nmse_db']['ls']:.2f} dB, "
            f"LMMSE {lvl['nmse_db']['lmmse']:.2f} dB, "
            f"LS BER {lvl['closed_loop']['ls']['ber']:.4f}")
    out["wall_s"] = round(time.time() - t0, 1)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    log(f"done in {out['wall_s']}s -> {args.out}")


if __name__ == "__main__":
    main()
