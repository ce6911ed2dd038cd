"""Throughput benchmark: channel estimates/s/chip.

The headline metric (BASELINE.md): complete channel estimates per second
per chip for the BS32 configuration — one "estimate" is one (Tx, Rx)
link's 234-subcarrier complex CSI produced from the raw time-domain
preamble, i.e. the full fused path

    rx preamble (B, 10240, Nr) ──demod+LS──▶ (B, C, Nt, Nr)
                                └─DNN (real+imag MLPs)─▶ (B, C, Nt, Nr)

The reference's corresponding harness is the TF-profiler timing loop at
``massiveMIMO_CSI_prediction_DNN.py:441-475`` (batch = Nt·Nr = 128) and
the published CPU-vs-GPU bar figure. Since the reference repo vendors no
machine-readable numbers (BASELINE.md), ``vs_baseline`` compares against
a reference-equivalent implementation measured on this host's CPU with
torch (two real-valued Keras-architecture MLPs, batch 128), cached in
``.bench_baseline.json``.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _torch_cpu_baseline(cfg, hidden=(1024, 1024), batch=128,
                        iters=10) -> float:
    """Reference-equivalent DNN inference on CPU (torch): two real MLPs,
    per-plane predict like CSIPredictor.inference (inference.py:24-32).

    Returns channel estimates per second.
    """
    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    in_dim = cfg.len_ltf + cfg.num_tx
    layers = []
    d = in_dim
    for h in hidden:
        layers += [torch.nn.Linear(d, h), torch.nn.ReLU(),
                   torch.nn.BatchNorm1d(h)]
        d = h
    layers += [torch.nn.Linear(d, cfg.num_carriers)]
    net_r = torch.nn.Sequential(*layers).eval()
    net_i = torch.nn.Sequential(*[type(m)(*_ctor_args(m)) for m in layers]
                                ).eval()
    x = torch.randn(batch, in_dim)
    with torch.no_grad():
        net_r(x); net_i(x)                       # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            net_r(x)
            net_i(x)
        dt = (time.perf_counter() - t0) / iters
    return batch / dt


def _ctor_args(m):
    import torch

    if isinstance(m, torch.nn.Linear):
        return (m.in_features, m.out_features)
    if isinstance(m, torch.nn.BatchNorm1d):
        return (m.num_features,)
    return ()


def _get_baseline(cfg, cache_path: str) -> float:
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            return json.load(f)["cpu_estimates_per_s"]
    try:
        val = _torch_cpu_baseline(cfg)
    except Exception as e:                        # pragma: no cover
        print(f"[bench] baseline measurement failed ({e}); using 1.0")
        val = 1.0
    with open(cache_path, "w") as f:
        json.dump({"cpu_estimates_per_s": val,
                   "note": "torch-CPU reference-equivalent DNN inference, "
                           "batch 128 (massiveMIMO_CSI_prediction_DNN.py:"
                           "441-475 harness equivalent)"}, f)
    return val


def make_estimation_fn(cfg, tcfg, params, bn_state, use_pallas: bool = True):
    """Build the jitted fused estimation step: raw preamble batch ->
    (LS estimate, DNN estimate)."""
    import jax
    import jax.numpy as jnp

    from mamimo_tpu.models.mlp import preprocess_input, stacked_apply
    from mamimo_tpu.ops.ltf import pilot_p_matrix
    from mamimo_tpu.pipeline.sounding import estimate_from_rx

    P = pilot_p_matrix(cfg.num_tx)

    @jax.jit
    def estimate(rx):
        """rx: (B, len_ltf, num_rx) complex64."""
        b = rx.shape[0]
        h_ls, _ = estimate_from_rx(cfg, rx)
        # DNN path: every (tx, rx) pair of every packet
        sig = jnp.transpose(rx, (0, 2, 1))             # (B, R, L)
        sig = jnp.repeat(sig[:, :, None, :], cfg.num_tx, axis=2)
        sig = sig.reshape(b * cfg.num_rx * cfg.num_tx, cfg.len_ltf)
        pil = jnp.tile(P.T, (b * cfg.num_rx, 1))       # (N, Nt)
        xr = preprocess_input(cfg, tcfg, jnp.real(sig), pil)
        xi = preprocess_input(cfg, tcfg, jnp.imag(sig), pil)
        y2, _ = stacked_apply(tcfg, params, bn_state,
                              jnp.stack([xr, xi]), train=False)
        h_dnn = (y2[0] + 1j * y2[1]).reshape(
            b, cfg.num_rx, cfg.num_tx, cfg.num_carriers
        )
        h_dnn = jnp.transpose(h_dnn, (0, 3, 2, 1))
        return h_ls, h_dnn

    return estimate


def run_bench(batch_packets: int = 64, iters: int = 20,
              profile_dir: str = "", repo_root: str | None = None) -> dict:
    import jax
    import jax.numpy as jnp

    from mamimo_tpu.config import SimConfig, TrainConfig
    from mamimo_tpu.models.mlp import init_stacked
    from mamimo_tpu.pipeline.sounding import estimate_from_rx

    cfg = SimConfig()
    tcfg = TrainConfig()
    dev = jax.devices()[0]
    key = jax.random.PRNGKey(0)
    params, bn_state = init_stacked(key, cfg, tcfg)

    # synthetic received preambles (content doesn't affect timing)
    z = jax.random.normal(key, (batch_packets, cfg.len_ltf, cfg.num_rx, 2))
    rx = (z[..., 0] + 1j * z[..., 1]).astype(jnp.complex64)

    estimate = make_estimation_fn(cfg, tcfg, params, bn_state)
    ls_only = jax.jit(lambda r: estimate_from_rx(cfg, r)[0])

    # warmup/compile
    jax.block_until_ready(estimate(rx))
    jax.block_until_ready(ls_only(rx))

    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = estimate(rx)
    jax.block_until_ready(out)
    dt_full = (time.perf_counter() - t0) / iters

    t0 = time.perf_counter()
    for _ in range(iters):
        out = ls_only(rx)
    jax.block_until_ready(out)
    dt_ls = (time.perf_counter() - t0) / iters

    if profile_dir:
        jax.profiler.stop_trace()

    n_est = batch_packets * cfg.num_tx * cfg.num_rx
    est_per_s = n_est / dt_full
    ls_per_s = n_est / dt_ls

    root = repo_root or os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    baseline = _get_baseline(cfg, os.path.join(root, ".bench_baseline.json"))

    result = {
        "metric": "channel_estimates_per_s_per_chip",
        "value": round(est_per_s, 1),
        "unit": "estimates/s",
        "vs_baseline": round(est_per_s / baseline, 2),
        "extra": {
            "device": str(dev),
            "batch_packets": batch_packets,
            "ls_only_estimates_per_s": round(ls_per_s, 1),
            "baseline_cpu_estimates_per_s": round(baseline, 1),
            "full_batch_ms": round(dt_full * 1e3, 3),
        },
    }
    print(json.dumps(result))
    return result
