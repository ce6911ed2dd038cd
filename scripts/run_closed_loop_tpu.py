#!/usr/bin/env python
"""Protocol-scale closed-loop evaluation (VERDICT r1 #2).

The reference protocol: 500 test packets per SNR level through the full
data-transmission chain (setenv.sh:19-20, BER_test_maMIMO_LTF.m:177-647)
for every estimator source {LS, LMMSE, DNN, perfect}, aggregated with
95% t-CIs and the four plots (snr_loop_testing.m:67-107).

Run after scripts/run_bs32_tpu.py (needs its checkpoint + training
scenario). Per-SNR results are written incrementally so a killed run
resumes where it stopped (tunnel hangs happen — see the verify skill).
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


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="runs/bs32_paper")
    ap.add_argument("--snr", type=float, nargs="+",
                    default=[-25, -20, -15, -10, -5, 0, 5, 10])
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

    from mamimo_tpu.config import SimConfig
    from mamimo_tpu.eval.closed_loop import evaluate_closed_loop
    from mamimo_tpu.eval.snr_sweep import compute_ci
    from mamimo_tpu.pipeline.dataset import generate_dataset
    from mamimo_tpu.train.ckpt import load_checkpoint
    from mamimo_tpu.train.loop import evaluate_dataset

    ck = load_checkpoint(os.path.join(args.workdir, "best"))
    cfg = ck.get("cfg") or SimConfig()
    # test on the TRAINING placement (the reference's rng(67) contract)
    scenario = None
    train_path = os.path.join(args.workdir, "train.npz")
    if os.path.exists(train_path):
        # lazy npz access: read ONLY the scenario_* members, not the
        # multi-GB corpus (np.load reads zip members on access) — same
        # policy as run_sweep_stage3.py; the BS64 corpus is 5.7 GB
        import jax.numpy as jnp

        from mamimo_tpu.channel.scattering import Scenario

        z = np.load(train_path)
        scenario = Scenario(**{
            k[len("scenario_"):]: jnp.asarray(z[k])
            for k in z.files if k.startswith("scenario_")})
        z.close()
        log("using the training scenario for test generation")

    outdir = os.path.join(args.workdir, "test_results")
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, "closed_loop_protocol.json")
    out = {"snr": [], "packets": args.packets, "sources": {}}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
        log(f"resuming: {len(out['snr'])} SNR levels already done")

    for snr in args.snr:
        if snr in out["snr"]:
            continue
        t0 = time.time()
        ds = generate_dataset(cfg, seed=args.seed,
                              num_packets=args.packets, snr_db=snr,
                              with_mmse=True, chunk=args.chunk,
                              scenario=scenario)
        # batch_packets=8 matches the program shape already in the
        # persistent compile cache (run_bs32_tpu.py stage 3)
        pred, _ = evaluate_dataset(cfg, ck["tcfg"], ck["params"],
                                   ck["bn_state"], ds, batch_packets=8)
        t1 = time.time()
        cl = evaluate_closed_loop(ds, predictions=pred, chunk=args.chunk)
        for s, m in cl.items():
            d = out["sources"].setdefault(s, {
                "ber": [], "ber_ci": [], "evm": [], "evm_ci": [],
                "nmse_db": [], "bf_gain": [], "bf_gain_ci": []})
            d["ber"].append(float(np.mean(m.ber)))
            d["ber_ci"].append(list(compute_ci(m.ber)))
            d["evm"].append(float(np.mean(m.evm)))
            d["evm_ci"].append(list(compute_ci(m.evm)))
            d["nmse_db"].append(
                float(10 * np.log10(np.mean(m.nmse) + 1e-30)))
            d["bf_gain"].append(float(np.mean(m.bf_gain)))
            d["bf_gain_ci"].append(list(compute_ci(m.bf_gain)))
        out["snr"].append(snr)
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        log(f"SNR {snr:+.0f}: gen+pred {t1-t0:.0f}s loop "
            f"{time.time()-t1:.0f}s | " + "  ".join(
                f"{s}: BER {cl[s].summary()['ber']:.4f} "
                f"EVM {cl[s].summary()['evm']:.1f}% "
                f"BF {cl[s].summary()['bf_gain']:.1f}dB" for s in cl))

    # four reference plots with CI whiskers
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        order = np.argsort(out["snr"])
        snrs = np.asarray(out["snr"])[order]
        styles = {"ls": "-o", "lmmse": "-x", "dnn": "-*", "perfect": "-s"}
        labels = {"ls": "LS", "lmmse": "MMSE", "dnn": "Proposed",
                  "perfect": "Perfect"}
        for metric, ylabel, logy in (
            ("ber", "Bit error rate (BER)", True),
            ("evm", "EVM RMS (%)", False),
            ("nmse_db", "NMSE (dB)", False),
            ("bf_gain", "Beamforming gain (dB)", False),
        ):
            plt.figure()
            for s, d in out["sources"].items():
                v = np.asarray(d[metric])[order]
                if logy:
                    plt.semilogy(snrs, np.maximum(v, 1e-6),
                                 styles.get(s, "-"), label=labels.get(s, s))
                else:
                    plt.plot(snrs, v, styles.get(s, "-"),
                             label=labels.get(s, s))
                ci_key = metric + "_ci"
                if ci_key in d:
                    ci = np.asarray(d[ci_key])[order]
                    plt.fill_between(snrs, ci[:, 0], ci[:, 1], alpha=0.15)
            plt.grid(True)
            plt.xlabel("SNR (dB)")
            plt.ylabel(ylabel)
            plt.legend()
            plt.savefig(os.path.join(outdir, f"protocol_{metric}.png"))
            plt.close()
    except Exception as e:                         # pragma: no cover
        log(f"plotting skipped: {e}")
    log(f"wrote {path}")


if __name__ == "__main__":
    main()
