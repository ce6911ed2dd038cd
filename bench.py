#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line
{"metric", "value", "unit", "vs_baseline", ...} for the headline metric
channel-estimates/s/chip (BS32 fused LS + DNN estimation path).

Runs on whatever backend JAX selects (the real TPU chip under the
driver). See mamimo_tpu/bench.py for details and the baseline definition.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mamimo_tpu.bench import (  # noqa: E402
    run_bench,
    run_gen_bench,
    run_train_bench,
)

if __name__ == "__main__":
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    root = os.path.dirname(os.path.abspath(__file__))
    if "--train" in sys.argv:
        # training throughput (steps/s, achieved TFLOP/s); the headline
        # inference metric stays the default single JSON line
        run_train_bench(repo_root=root)
        sys.exit(0)
    if "--gen" in sys.argv:
        # dataset-generation throughput (packets/s, three modes)
        run_gen_bench(repo_root=root)
        sys.exit(0)
    if os.environ.get("BENCH_BATCH"):
        batches = [int(os.environ["BENCH_BATCH"])]
    else:
        # per-call tunnel latency dominates small batches; sweep and
        # keep the best (only the final JSON line is the result).
        # 1024 packets = 131072 estimates/call: the ~2 ms RPC amortizes
        # below the MXU time of the fused path.
        batches = [256, 1024]
    import json
    results = []
    for b in batches:
        results.append(run_bench(batch_packets=b, iters=iters,
                                 repo_root=root, print_result=False))
    best = max(results, key=lambda r: r["value"])
    print(json.dumps(best))
