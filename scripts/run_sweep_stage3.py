#!/usr/bin/env python
"""Resumable stage-3 NMSE sweep (paper fine SNR grid, 500 pkts/SNR).

Equivalent to stage 3 of scripts/run_bs32_tpu.py but writes the sweep
JSON incrementally after every SNR level so a killed run (tunnel hangs)
resumes where it stopped. Mirrors the per-SNR resume policy of
scripts/run_closed_loop_tpu.py.

Reference protocol: setenv.sh:17-20 (500 test packets/SNR, fine grid
{-22..-10 step 1} + coarse {-10..10 step 5}); curves per
snr_loop_testing.m:67-107.
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

FINE_GRID = [-25.0] + [float(s) for s in range(-22, -9)] + [-5.0, 0.0, 5.0, 10.0]


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="runs/bs32_paper")
    ap.add_argument("--snr", type=float, nargs="+", default=FINE_GRID)
    ap.add_argument("--packets", type=int, default=500)
    ap.add_argument("--seed", type=int, default=1)   # stage-3 test seed
    ap.add_argument("--chunk", type=int, default=32)
    args = ap.parse_args()

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    from mamimo_tpu.channel.scattering import Scenario
    from mamimo_tpu.eval.snr_sweep import SweepResult, plot_sweep, run_snr_sweep
    from mamimo_tpu.train.ckpt import load_checkpoint
    from mamimo_tpu.train.loop import evaluate_dataset

    ck = load_checkpoint(os.path.join(args.workdir, "best"))
    cfg = ck["cfg"]
    # lazy npz access: read ONLY the scenario_* members, not the
    # multi-GB corpus (np.load reads zip members on access)
    import jax.numpy as jnp

    z = np.load(os.path.join(args.workdir, "train.npz"))
    scenario = Scenario(**{
        k[len("scenario_"):]: jnp.asarray(z[k])
        for k in z.files if k.startswith("scenario_")})
    z.close()
    log("using the training scenario for test generation")

    def predictor(ds):
        # batch_packets=8 matches the program shape already in the
        # persistent compile cache (run_bs32_tpu.py stage 3)
        pred, _ = evaluate_dataset(ds.cfg, ck["tcfg"], ck["params"],
                                   ck["bn_state"], ds, batch_packets=8)
        return pred

    outdir = os.path.join(args.workdir, "test_results")
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, "sweep.json")
    if os.path.exists(path):
        with open(path) as f:
            acc = SweepResult(**json.load(f))
        log(f"resuming: {len(acc.snr_levels)} SNR levels already done")
    else:
        acc = SweepResult(snr_levels=[], nmse={}, nmse_ci={}, ber={},
                          evm={}, bf_gain={})

    for snr in args.snr:
        if snr in acc.snr_levels:
            continue
        t0 = time.time()
        one = run_snr_sweep(
            cfg, snr_levels=[snr], num_packets=args.packets,
            seed=args.seed, predictor=predictor, chunk=args.chunk,
            scenario=scenario,
        )
        acc.snr_levels.append(snr)
        for field in ("nmse", "nmse_ci", "ber", "evm", "bf_gain"):
            for s, vals in getattr(one, field).items():
                getattr(acc, field).setdefault(s, []).extend(vals)
        acc.save(path)
        log(f"SNR {snr:+.0f} done in {time.time()-t0:.0f}s -> {path}")

    # re-order by SNR for the plots
    order = np.argsort(acc.snr_levels)
    acc.snr_levels = [acc.snr_levels[i] for i in order]
    for field in ("nmse", "nmse_ci", "ber", "evm", "bf_gain"):
        d = getattr(acc, field)
        for s in d:
            if len(d[s]) == len(order):
                d[s] = [d[s][i] for i in order]
    acc.save(path)
    plot_sweep(acc, outdir)
    log("summary NMSE(dB): " + json.dumps({
        s: [round(10 * np.log10(v + 1e-30), 2) for v in vals]
        for s, vals in acc.nmse.items()}))


if __name__ == "__main__":
    main()
