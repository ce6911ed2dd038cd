#!/usr/bin/env python
"""Closed-loop BER/EVM/BF-gain evaluation with the trained BS32 model
(run after scripts/run_bs32_tpu.py): regenerates per-SNR test sets with
the same seeds and runs the full data-transmission loop for
{LS, LMMSE, DNN, perfect}."""

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="runs/bs32")
    ap.add_argument("--snr", type=float, nargs="+",
                    default=[-20.0, -10.0, 0.0, 10.0])
    ap.add_argument("--packets", type=int, default=24)
    ap.add_argument("--seed", type=int, default=1)   # stage-3 test seed
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    from mamimo_tpu.config import SimConfig
    from mamimo_tpu.eval.closed_loop import evaluate_closed_loop
    from mamimo_tpu.pipeline.dataset import generate_dataset
    from mamimo_tpu.train.ckpt import load_checkpoint
    from mamimo_tpu.train.loop import evaluate_dataset

    cfg = SimConfig()
    ck = load_checkpoint(os.path.join(args.workdir, "best"))
    # test on the TRAINING placement (the reference's rng(67) contract)
    scenario = None
    train_path = os.path.join(args.workdir, "train.npz")
    if os.path.exists(train_path):
        from mamimo_tpu.pipeline.dataset import CSIDataset

        scenario = CSIDataset.load(train_path).scenario
        log("using the training scenario for test generation")
    out = {"snr": args.snr, "sources": {}}
    for snr in args.snr:
        t0 = time.time()
        ds = generate_dataset(cfg, seed=args.seed, num_packets=args.packets,
                              snr_db=snr, with_mmse=True, chunk=args.packets,
                              scenario=scenario)
        pred, _ = evaluate_dataset(cfg, ck["tcfg"], ck["params"],
                                   ck["bn_state"], ds, batch_packets=8)
        cl = evaluate_closed_loop(ds, predictions=pred)
        for s, m in cl.items():
            out["sources"].setdefault(s, {"ber": [], "evm": [],
                                          "nmse_db": [], "bf_gain": []})
            summ = m.summary()
            for k in ("ber", "evm", "nmse_db", "bf_gain"):
                out["sources"][s][k].append(summ[k])
        log(f"SNR {snr:+.0f}: " + "  ".join(
            f"{s}: BER {cl[s].summary()['ber']:.4f} "
            f"EVM {cl[s].summary()['evm']:.1f}% "
            f"BF {cl[s].summary()['bf_gain']:.1f}dB"
            for s in cl) + f"  ({time.time()-t0:.0f}s)")
    path = os.path.join(args.workdir, "test_results", "closed_loop.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    log(f"wrote {path}")


if __name__ == "__main__":
    main()
