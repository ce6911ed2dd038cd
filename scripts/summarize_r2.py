#!/usr/bin/env python
"""Summarize round-2 artifacts into markdown tables (stdout)."""
import json
import math
import os
import sys


def db(x):
    return 10 * math.log10(x + 1e-30)


def main():
    wd = "runs/bs32_paper/test_results"
    p = os.path.join(wd, "sweep.json")
    if os.path.exists(p):
        with open(p) as f:
            s = json.load(f)
        print("## NMSE vs SNR (fine grid, 500 pkts/SNR, training placement)\n")
        print("| SNR (dB) | LS | LMMSE | DNN |")
        print("|---|---|---|---|")
        order = sorted(range(len(s["snr_levels"])),
                       key=lambda i: s["snr_levels"][i])
        for i in order:
            print(f"| {s['snr_levels'][i]:+.0f} | "
                  f"{db(s['nmse']['ls'][i]):.2f} | "
                  f"{db(s['nmse']['lmmse'][i]):.2f} | "
                  f"{db(s['nmse']['dnn'][i]):.2f} |")
        print()
    p = os.path.join(wd, "closed_loop_protocol.json")
    if os.path.exists(p):
        with open(p) as f:
            c = json.load(f)
        print(f"## Closed loop ({c['packets']} pkts/SNR)\n")
        print("| SNR | src | BER | EVM % | NMSE dB | BF gain dB |")
        print("|---|---|---|---|---|---|")
        order = sorted(range(len(c["snr"])), key=lambda i: c["snr"][i])
        for i in order:
            for src, d in c["sources"].items():
                print(f"| {c['snr'][i]:+.0f} | {src} | {d['ber'][i]:.4f} | "
                      f"{d['evm'][i]:.1f} | {d['nmse_db'][i]:.2f} | "
                      f"{d['bf_gain'][i]:.1f} |")
        print()
    for p, title in (("results/mu_sweep_tpu.json", "Multi-user"),):
        if os.path.exists(p):
            with open(p) as f:
                m = json.load(f)
            print(f"## {title} (U={m['num_users']}, {m.get('packets','?')} "
                  f"pkts/SNR)\n")
            print("| SNR | src | BER/user | BF gain/user dB |")
            print("|---|---|---|---|")
            for i, snr in enumerate(m["snr"]):
                for src, d in m["sources"].items():
                    print(f"| {snr:+.0f} | {src} | "
                          f"{['%.4f' % b for b in d['ber'][i]]} | "
                          f"{['%.1f' % b for b in d['bf_gain'][i]]} |")


if __name__ == "__main__":
    main()
