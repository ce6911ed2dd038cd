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

    from mamimo_tpu.bench import (
        _chained_step,
        _chained_step_invariant,
        _time_fn,
    )
    from mamimo_tpu.config import SimConfig, TrainConfig
    from mamimo_tpu.models.mlp import init_stacked, predict_all_pairs
    from mamimo_tpu.ops.estimate import (
        lmmse_estimate,
        lmmse_estimate_cg,
        lmmse_estimate_direct,
        lmmse_estimate_eig,
        ls_estimate_matmul,
        ls_matmul_constants,
    )

    on_tpu = jax.devices()[0].platform != "cpu"

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

        def dnn_bf16_core(p, b, r, cfg=cfg, tcfg=tcfg):
            return predict_all_pairs(cfg, tcfg, p, b, r,
                                     dtype=jnp.bfloat16)

        # round-3 fast LMMSE: eigendecompose Rf once per packet (shared
        # across rx antennas), diagonal rescale per (antenna, SNR) —
        # the eigh is INSIDE the timed step (honest single-dataset cost;
        # sweep reuse across SNR levels only makes it cheaper)
        def lmmse_eig_core(c, t, s, r, cfg=cfg):
            h = ls_estimate_matmul(cfg, r, c)
            return lmmse_estimate_eig(cfg, h, t, s)

        # round-3 production LMMSE: solve on the actual RHS columns +
        # Rf matvec — no dense M materialization
        def lmmse_direct_core(c, t, s, r, cfg=cfg):
            h = ls_estimate_matmul(cfg, r, c)
            return lmmse_estimate_direct(cfg, h, t, s)

        # round-3b TPU-native LMMSE: Toeplitz structure of Rf →
        # FFT-circulant matvecs + padded-circulant-preconditioned CG,
        # fixed 16-iteration trip count (no LU at all)
        def lmmse_cg_core(c, t, s, r, cfg=cfg):
            h = ls_estimate_matmul(cfg, r, c)
            return lmmse_estimate_cg(cfg, h, t, s)

        paths = [
            ("ls", _chained_step(ls_core, (lsc,)), rx, 1),
            ("lmmse", _chained_step(lmmse_core, (lsc, tau_b, snr)), rx, 1),
            ("lmmse_eig", _chained_step(lmmse_eig_core, (lsc, tau_b, snr)),
             rx, 1),
            ("lmmse_direct",
             _chained_step(lmmse_direct_core, (lsc, tau_b, snr)), rx, 1),
            ("lmmse_cg",
             _chained_step(lmmse_cg_core, (lsc, tau_b, snr)), rx, 1),
            ("dnn", _chained_step(dnn_core, (params, bn)), rx, 1),
            ("dnn_bf16", _chained_step(dnn_bf16_core, (params, bn)), rx, 1),
        ]
        if on_tpu:
            # the round-3 production LS: v2 Pallas kernel on flat bf16
            # planes under the invariant-operand harness (bench.py)
            from mamimo_tpu.ops.pallas import (
                ls_planes_pallas_v2_constants,
            )
            from mamimo_tpu.ops.pallas.fused_ls import ls_planes_pallas_v2

            block = 8
            dma = max(block, 1024 // nt)
            consts = ls_planes_pallas_v2_constants(cfg, block,
                                                   dtype=jnp.bfloat16)

            @jax.jit
            def _mk_planes(r, cfg=cfg):
                pl = jnp.stack([jnp.real(r), jnp.imag(r)])
                s_ = pl.shape[1] * pl.shape[3]
                return jnp.transpose(pl, (0, 1, 3, 2)).reshape(
                    2, s_, cfg.len_ltf).astype(jnp.bfloat16)

            planes = _mk_planes(rx)

            def ls_v2_core(c, pl, cfg=cfg):
                _, ssq = ls_planes_pallas_v2(
                    cfg, pl, c, block_samples=block, dma_samples=dma,
                    with_ssq=True, out_dtype=jnp.bfloat16)
                return ssq

            def ls_v2_perturb(ex, eps):
                (b, k), pl = ex
                return (b * (1.0 + eps).astype(b.dtype), k), pl

            unroll = 8
            paths.append(
                ("ls_v2",
                 _chained_step_invariant(ls_v2_core, (consts, planes),
                                         ls_v2_perturb, unroll=unroll),
                 1.0, unroll))

        res = {}
        for name, step, arg, per_call in paths:
            t0 = time.time()
            try:
                dt = _time_fn(step, arg, args.iters, per_call=per_call)
            except Exception as e:
                print(f"[timing] Nt={nt} {name} unavailable: {e}",
                      flush=True)
                continue
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
