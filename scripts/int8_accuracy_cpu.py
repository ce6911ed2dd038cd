#!/usr/bin/env python
"""int8 inference fidelity on the TRAINED BS32 checkpoint (CPU).

Generates a fresh test set on the training placement at a mid-sweep
SNR, runs the f32 and int8 factored all-pairs paths on the trained
weights, and reports NMSE-vs-perfect for both plus the direct
int8-vs-f32 relative error. Evidence that the int8 throughput headline
costs no measurable accuracy (results/int8_accuracy.json).
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from mamimo_tpu.pipeline.dataset import CSIDataset, generate_dataset
    from mamimo_tpu.train.ckpt import load_checkpoint
    from mamimo_tpu.models.mlp import predict_all_pairs_planes_flat
    from mamimo_tpu.models.quant import (
        predict_all_pairs_planes_flat_int8,
        quantize_params_int8,
    )

    wd = "runs/bs32_paper"
    ck = load_checkpoint(os.path.join(wd, "best"))
    cfg, tcfg = ck["cfg"], ck["tcfg"]
    scenario = CSIDataset.load(os.path.join(wd, "train.npz")).scenario

    out = {"snr": [], "nmse_f32_db": [], "nmse_int8_db": [],
           "rel_int8_vs_f32_db": []}
    qparams = quantize_params_int8(tcfg, ck["params"], ck["bn_state"],
                                   sig_len=cfg.len_ltf)
    for snr in (-20.0, -10.0, 0.0):
        ds = generate_dataset(cfg, seed=7, num_packets=8, snr_db=snr,
                              chunk=8, scenario=scenario)
        planes = jnp.asarray(ds.rx_planes())           # (2, S, L)
        f32 = predict_all_pairs_planes_flat(
            cfg, tcfg, ck["params"], ck["bn_state"], planes)
        q8 = predict_all_pairs_planes_flat_int8(cfg, tcfg, qparams, planes)
        # perfect CSI in the same (S, ntx, C) rx-major layout
        hp = np.transpose(ds.h_perfect, (0, 3, 2, 1)).reshape(
            -1, cfg.num_tx, cfg.num_carriers)

        def nmse_db(h):
            h = np.asarray(h)
            return float(10 * np.log10(
                (np.abs(h - hp) ** 2).sum() / (np.abs(hp) ** 2).sum()))

        rel = float(10 * np.log10(
            (np.abs(np.asarray(q8 - f32)) ** 2).mean()
            / (np.abs(np.asarray(f32)) ** 2).mean()))
        out["snr"].append(snr)
        out["nmse_f32_db"].append(round(nmse_db(f32), 3))
        out["nmse_int8_db"].append(round(nmse_db(q8), 3))
        out["rel_int8_vs_f32_db"].append(round(rel, 1))
        print(f"SNR {snr:+.0f}: f32 {out['nmse_f32_db'][-1]} dB  "
              f"int8 {out['nmse_int8_db'][-1]} dB  "
              f"(int8 vs f32 {rel:.1f} dB)", flush=True)

    with open("results/int8_accuracy.json", "w") as f:
        json.dump(out, f, indent=2)
    print("-> results/int8_accuracy.json")


if __name__ == "__main__":
    main()
