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

from mamimo_tpu.bench import run_bench  # noqa: E402

if __name__ == "__main__":
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    run_bench(batch_packets=batch, iters=iters,
              repo_root=os.path.dirname(os.path.abspath(__file__)))
