#!/usr/bin/env python
"""Per-estimator inference-latency sweep over array size — the TPU
equivalent of the reference's published timing artifact
(`timing_cpu_vs_gpu_barplot.eps`, produced by the harness at
`massiveMIMO_CSI_prediction_DNN.py:441-475`): seconds per channel
estimate for LS, LMMSE and the DNN at Nt ∈ {4, 8, 16, 32, 64}.

Usage: python scripts/timing_nt_sweep.py [--nt 4 8 16 32 64]
       [--batch 64] [--iters 10] [-o runs/timing_nt_sweep.json]

Uses the same honest chained-timing harness as bench.py (one dispatch
per iteration, forced scalar fetch).
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nt", type=int, nargs="+", default=[4, 8, 16, 32, 64])
    ap.add_argument("--num-rx", type=int, default=4)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("-o", "--out", default="runs/timing_nt_sweep.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mamimo_tpu.bench import _chained_step, _time_fn
    from mamimo_tpu.config import SimConfig, TrainConfig
    from mamimo_tpu.models.mlp import init_stacked, predict_all_pairs
    from mamimo_tpu.ops.estimate import (
        lmmse_estimate,
        ls_estimate_matmul,
        ls_matmul_constants,
    )

    out = {"device": str(jax.devices()[0]), "batch": args.batch,
           "num_rx": args.num_rx, "per_estimate_s": {}}
    for nt in args.nt:
        cfg = SimConfig(num_tx=nt, num_rx=args.num_rx)
        tcfg = TrainConfig()
        key = jax.random.PRNGKey(0)
        params, bn = init_stacked(key, cfg, tcfg)
        lsc = ls_matmul_constants(cfg)
        n_est = args.batch * nt * args.num_rx

        @jax.jit
        def _mk(k, cfg=cfg):
            z = jax.random.normal(
                k, (args.batch, cfg.len_ltf, cfg.num_rx, 2))
            return jax.lax.complex(z[..., 0], z[..., 1])

        rx = _mk(key)
        tau = jnp.linspace(1e-7, 5e-7, cfg.n_scatterers)
        tau_b = jnp.broadcast_to(tau, (args.batch,) + tau.shape)
        snr = jnp.zeros((args.batch, cfg.num_rx))

        def ls_core(c, r, cfg=cfg):
            return ls_estimate_matmul(cfg, r, c)

        def lmmse_core(c, t, s, r, cfg=cfg):
            h = ls_estimate_matmul(cfg, r, c)
            return lmmse_estimate(cfg, h, t, s)

        def dnn_core(p, b, r, cfg=cfg, tcfg=tcfg):
            return predict_all_pairs(cfg, tcfg, p, b, r)

        res = {}
        for name, step in [
            ("ls", _chained_step(ls_core, (lsc,))),
            ("lmmse", _chained_step(lmmse_core, (lsc, tau_b, snr))),
            ("dnn", _chained_step(dnn_core, (params, bn))),
        ]:
            t0 = time.time()
            dt = _time_fn(step, rx, args.iters)
            res[name] = dt / n_est
            print(f"[timing] Nt={nt} {name}: {dt/n_est:.3e} s/estimate "
                  f"({dt*1e3:.2f} ms/call, setup {time.time()-t0:.0f}s)",
                  flush=True)
        out["per_estimate_s"][str(nt)] = res

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"[timing] wrote {args.out}")


if __name__ == "__main__":
    main()
