#!/usr/bin/env python
"""Decisive on-chip LMMSE accuracy attribution: compare EACH estimator
(CG with HIGHEST dots, direct jnp.linalg.solve, dense M-form) against a
float64 NumPy oracle computed on host — the |cg − direct| probe cannot
say WHICH side is off (the TPU LU solve runs its internal matmuls at
default precision too). Inputs are host-generated; only planes cross
the device boundary. Timing-insensitive (may run contended).

Writes results/probe_cg_accuracy.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("-o", "--out", default="results/probe_cg_accuracy.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"[probe] device: {jax.devices()[0]}", flush=True)

    from mamimo_tpu.config import SimConfig
    from mamimo_tpu.ops.estimate import (
        lmmse_estimate,
        lmmse_estimate_cg,
        lmmse_estimate_direct,
    )
    from mamimo_tpu.utils.numerics import get_complex, put_complex

    cfg = SimConfig()
    b, n, s_, r_ = args.batch, cfg.num_carriers, 2, 4
    rng = np.random.default_rng(5)
    tau_np = rng.uniform(1e-6, 4e-6, (b, cfg.n_scatterers)).astype(
        np.float32)
    h_np = (rng.standard_normal((b, n, s_, r_))
            + 1j * rng.standard_normal((b, n, s_, r_))).astype(
                np.complex64)
    snr_np = rng.uniform(-20.0, 10.0, (b, r_)).astype(np.float32)

    # float64 host oracle: hhat = h - sigma^2 Rpp^{-1} h, Rpp = Rf + I/snr
    def oracle():
        out = np.zeros_like(h_np, np.complex128)
        k = np.arange(cfg.n_scatterers)
        a = np.arange(n)
        for i in range(b):
            t = tau_np[i].astype(np.float64)
            w = t * t
            hh = w.sum()
            tmp = w * k
            rr = tmp.sum() / hh
            r2 = (tmp * k).sum() / hh
            tau_rms = np.sqrt(max(r2 - rr * rr, 0.0))
            jw = 1j * 2 * np.pi * tau_rms / n
            rf = 1.0 / (1.0 + jw * (a[:, None] - a[None, :]))
            for j in range(r_):
                sig2 = 1.0 / 10 ** (snr_np[i, j] / 10.0)
                rpp = rf + np.eye(n) * sig2
                x = np.linalg.solve(rpp, h_np[i, :, :, j].astype(
                    np.complex128))
                out[i, :, :, j] = h_np[i, :, :, j] - sig2 * x
        return out

    ref = oracle()
    h_dev = put_complex(h_np)
    tau = jnp.asarray(tau_np)
    snr = jnp.asarray(snr_np)

    out = {"batch": b, "device": str(jax.devices()[0]), "max_err": {},
           "nmse_db": {}}
    for name, fn in (("cg", lmmse_estimate_cg),
                     ("direct", lmmse_estimate_direct),
                     ("dense", lmmse_estimate)):
        got = get_complex(jax.jit(
            lambda h, t, s, fn=fn: fn(cfg, h, t, s))(h_dev, tau, snr))
        d = np.abs(got.astype(np.complex128) - ref)
        out["max_err"][name] = float(d.max())
        out["nmse_db"][name] = float(10 * np.log10(
            (d ** 2).mean() / (np.abs(ref) ** 2).mean()))
        print(f"[probe] {name}: max|err| {d.max():.3e}, "
              f"NMSE {out['nmse_db'][name]:.1f} dB", flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[probe] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
