"""Evaluation: closed-loop metrics per packet, SNR sweeps, plots."""

from mamimo_tpu.eval.closed_loop import (  # noqa: F401
    ClosedLoopMetrics,
    evaluate_closed_loop,
    nmse_vs_snr,
)
from mamimo_tpu.eval.snr_sweep import SweepResult, run_snr_sweep  # noqa: F401
