#!/usr/bin/env python
"""BS64 accuracy chapter (VERDICT r4 #3): Nt=64, Nr=8 trained to
convergence + protocol NMSE sweep, mirroring the BS32 chapter.

Delegates to run_bs32_tpu.py (which is Nt-generic, like the reference
driver massiveMIMO_CSI_prediction_DNN.py:176-234), then copies the
durable artifacts out of the gitignored runs/ tree into results/bs64/.
"""

import json
import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
WORKDIR = os.path.join(REPO, "runs", "bs64")
OUTDIR = os.path.join(REPO, "results", "bs64")


def main():
    rc = subprocess.run(
        [sys.executable, os.path.join(HERE, "run_bs32_tpu.py"),
         "--num-tx", "64", "--num-rx", "8",
         "--packets", "2000", "--test-packets", "250",
         "--epochs", "100", "--workdir", WORKDIR,
         "--snr", "-25", "-20", "-15", "-10", "-5", "0", "5", "10"],
        cwd=REPO).returncode
    if rc != 0:
        sys.exit(rc)

    os.makedirs(OUTDIR, exist_ok=True)
    for name in ("history.json", "best.json"):
        src = os.path.join(WORKDIR, name)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(OUTDIR, name))
    tr = os.path.join(WORKDIR, "test_results")
    if os.path.isdir(tr):
        for name in os.listdir(tr):
            if name.endswith((".json", ".png")):
                shutil.copy(os.path.join(tr, name),
                            os.path.join(OUTDIR, name))

    sweep = os.path.join(OUTDIR, "sweep.json")
    if os.path.exists(sweep):
        import math
        with open(sweep) as f:
            nmse = json.load(f)["nmse"]
        summary = {
            "config": "BS64 (Nt=64, Nr=8)", "packets": 2000,
            "test_packets_per_snr": 250,
            "nmse_db": {s: [round(10 * math.log10(v + 1e-30), 2)
                            for v in vals]
                        for s, vals in nmse.items()}}
        with open(os.path.join(OUTDIR, "summary.json"), "w") as f:
            json.dump(summary, f, indent=1)
        print("[bs64] summary:", json.dumps(summary["nmse_db"]), flush=True)


if __name__ == "__main__":
    main()
