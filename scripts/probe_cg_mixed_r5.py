#!/usr/bin/env python
"""Round-5 mixed-precision LMMSE-CG probe (VERDICT r4 #6).

At Nt=64/Nr=8 the precision-pinned CG's margin over the dense LU
collapsed to 1.32× (results/probe_lmmse_cg_nt64b.json): the HIGHEST
(multi-pass) DFT applies dominate. Only the MATVEC provably needs
exactness — the preconditioner is an approximate clamped-circulant
surrogate by construction — so this probe measures the (time, oracle
error) frontier of:

  dense      — lmmse_estimate (exact LU, the reference's blind solve)
  cg         — all dots HIGHEST (the round-4 production pick)
  cg_mixed   — matvec HIGHEST, preconditioner at DEFAULT precision

Accuracy is measured against the float64 HOST oracle (an on-chip
|A − B| cannot attribute error — PERF.md round-4 moral), on the worst
protocol-range SNR. Writes results/probe_cg_mixed_r5.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--num-tx", type=int, default=64)
    ap.add_argument("--num-rx", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--acc-batch", type=int, default=4)
    ap.add_argument("-o", "--out", default="results/probe_cg_mixed_r5.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    dev = jax.devices()[0]
    print(f"[probe] device: {dev}", flush=True)

    from mamimo_tpu.bench import _chained_step, _time_fn
    from mamimo_tpu.config import SimConfig
    from mamimo_tpu.ops.estimate import (
        lmmse_estimate,
        lmmse_estimate_cg,
        ls_estimate_matmul,
        ls_matmul_constants,
    )
    from mamimo_tpu.utils.numerics import get_complex, put_complex

    cfg = SimConfig(num_tx=args.num_tx, num_rx=args.num_rx)
    b = args.batch
    rng = np.random.default_rng(0)
    lsc = ls_matmul_constants(cfg)
    rx = jnp.asarray(
        rng.standard_normal((b, cfg.len_ltf, cfg.num_rx, 2)), jnp.float32)
    rx = jax.jit(lambda z: jax.lax.complex(z[..., 0], z[..., 1]))(rx)
    tau_b = jnp.asarray(
        rng.uniform(1e-6, 4e-6, (b, cfg.n_scatterers)), jnp.float32)
    snr = jnp.asarray(
        rng.uniform(-20.0, 10.0, (b, cfg.num_rx)), jnp.float32)

    DEF, HIGH = jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGH
    VARIANTS = {
        "cg": {},
        "cg_mixed": dict(precond_precision=DEF),
        "cg_high": dict(precond_precision=DEF, matvec_precision=HIGH),
        "cg_high_hp": dict(precond_precision=HIGH,
                           matvec_precision=HIGH),
    }
    mixed_kw = VARIANTS["cg_mixed"]

    def dense_core(c, t, s, r, cfg=cfg):
        h = ls_estimate_matmul(cfg, r, c)
        return lmmse_estimate(cfg, h, t, s)

    def make_cg_core(kw):
        def core(c, t, s, r, cfg=cfg):
            h = ls_estimate_matmul(cfg, r, c)
            return lmmse_estimate_cg(cfg, h, t, s, **kw)
        return core

    n_est = b * cfg.num_tx * cfg.num_rx
    out = {"device": str(dev), "batch": b, "num_tx": args.num_tx,
           "num_rx": args.num_rx, "per_call_ms": {}, "ratio_vs_dense": {},
           "oracle_nmse_db": {}}
    for name, core in [("dense", dense_core)] + [
            (n, make_cg_core(kw)) for n, kw in VARIANTS.items()]:
        fn = _chained_step(core, (lsc, tau_b, snr))
        t0 = time.time()
        dt = _time_fn(fn, rx, iters=args.iters)
        out["per_call_ms"][name] = round(dt * 1e3, 2)
        print(f"[probe] {name}: {dt*1e3:.2f} ms/call "
              f"({dt/n_est:.3e} s/est, setup {time.time()-t0:.0f}s)",
              flush=True)
    for name in VARIANTS:
        out["ratio_vs_dense"][name] = round(
            out["per_call_ms"]["dense"] / out["per_call_ms"][name], 2)

    # ---- float64 host-oracle accuracy, worst protocol-range SNRs ----
    C, R = cfg.num_carriers, cfg.num_rx
    ba = args.acc_batch
    tau_np = rng.uniform(1e-6, 4e-6, (ba, cfg.n_scatterers)).astype(
        np.float32)
    hls_np = (rng.standard_normal((ba, C, cfg.num_tx, R))
              + 1j * rng.standard_normal((ba, C, cfg.num_tx, R))).astype(
                  np.complex64)

    def oracle(snr_db_val):
        outp = np.zeros_like(hls_np, np.complex128)
        k = np.arange(cfg.n_scatterers)
        a = np.arange(C)
        for i in range(ba):
            t = tau_np[i].astype(np.float64)
            w = t * t
            hh = w.sum()
            tmp = w * k
            r1 = tmp.sum() / hh
            r2 = (tmp * k).sum() / hh
            tr = np.sqrt(max(r2 - r1 * r1, 0.0))
            jw = 1j * 2 * np.pi * tr / C
            rf = 1.0 / (1.0 + jw * (a[:, None] - a[None, :]))
            sig2 = 1.0 / 10 ** (snr_db_val / 10.0)
            rpp = rf + np.eye(C) * sig2
            for j in range(R):
                x = np.linalg.solve(
                    rpp, hls_np[i, :, :, j].astype(np.complex128))
                outp[i, :, :, j] = hls_np[i, :, :, j] - sig2 * x
        return outp

    h_dev = put_complex(hls_np)
    tau_dev = jnp.asarray(tau_np)
    acc_fns = {
        name: jax.jit(lambda h, t, s, kw=kw: lmmse_estimate_cg(
            cfg, h, t, s, **kw))
        for name, kw in VARIANTS.items()
    }
    acc_fns["dense"] = jax.jit(
        lambda h, t, s: lmmse_estimate(cfg, h, t, s))
    for name, fn in acc_fns.items():
        worst = -np.inf
        for snr_val in (-25.0, -10.0, 0.0, 10.0, 20.0):
            ref = oracle(snr_val)
            got = get_complex(fn(h_dev, tau_dev,
                                 jnp.full((ba, R), snr_val, jnp.float32)))
            d = np.abs(got.astype(np.complex128) - ref)
            v = float(10 * np.log10(
                (d ** 2).mean() / (np.abs(ref) ** 2).mean()))
            worst = max(worst, v)
        out["oracle_nmse_db"][name] = round(worst, 1)
        print(f"[probe] {name}: worst oracle NMSE {worst:.1f} dB "
              f"(protocol range)", flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[probe] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
