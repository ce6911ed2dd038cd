#!/usr/bin/env python
"""Quick on-chip probe: dense-LU LMMSE vs the CG (FFT-circulant) form.

Run standalone (chip otherwise idle) for clean numbers; under
contention both paths inflate together, so the RATIO stays indicative.
Writes results/probe_lmmse_cg.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--num-tx", type=int, default=32)
    ap.add_argument("--num-rx", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("-o", "--out", default="results/probe_lmmse_cg.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

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
        lmmse_estimate_direct,
        ls_estimate_matmul,
        ls_matmul_constants,
    )

    cfg = SimConfig(num_tx=args.num_tx, num_rx=args.num_rx)
    b = args.batch
    rng = np.random.default_rng(0)
    lsc = ls_matmul_constants(cfg)
    rx = jnp.asarray(
        rng.standard_normal((b, cfg.len_ltf, cfg.num_rx, 2)),
        jnp.float32)
    rx = jax.jit(lambda z: jax.lax.complex(z[..., 0], z[..., 1]))(rx)
    tau_b = jnp.asarray(
        rng.uniform(1e-6, 4e-6, (b, cfg.n_scatterers)), jnp.float32)
    snr = jnp.asarray(
        rng.uniform(-20.0, 10.0, (b, cfg.num_rx)), jnp.float32)

    def dense_core(c, t, s, r, cfg=cfg):
        h = ls_estimate_matmul(cfg, r, c)
        return lmmse_estimate(cfg, h, t, s)

    def direct_core(c, t, s, r, cfg=cfg):
        h = ls_estimate_matmul(cfg, r, c)
        return lmmse_estimate_direct(cfg, h, t, s)

    def cg_core(c, t, s, r, cfg=cfg):
        h = ls_estimate_matmul(cfg, r, c)
        return lmmse_estimate_cg(cfg, h, t, s)

    # repo convention (timing_nt_sweep, bench): one "estimate" is the
    # (C,)-carrier vector of one (packet, tx, rx) antenna pair
    n_est = b * cfg.num_tx * cfg.num_rx
    out = {"device": str(dev), "batch": b, "num_tx": args.num_tx,
           "num_rx": args.num_rx, "per_call_s": {}, "per_estimate_s": {}}
    for name, core in (("lmmse", dense_core), ("lmmse_direct", direct_core),
                       ("lmmse_cg", cg_core)):
        fn = _chained_step(core, (lsc, tau_b, snr))
        t0 = time.time()
        dt = _time_fn(fn, rx, iters=args.iters)
        out["per_call_s"][name] = dt
        out["per_estimate_s"][name] = dt / n_est
        print(f"[probe] {name}: {dt*1e3:.2f} ms/call "
              f"({dt/n_est:.3e} s/est, setup {time.time()-t0:.0f}s)",
              flush=True)
    # CG accuracy bound on the same batch (max |cg − direct| over all
    # estimates; both computed on-device, fetched as the scalar max —
    # complex arrays never cross the host boundary)
    @jax.jit
    def _acc(c, t, s, r):
        h = ls_estimate_matmul(cfg, r, c)
        d = (lmmse_estimate_cg(cfg, h, t, s)
             - lmmse_estimate_direct(cfg, h, t, s))
        return jnp.max(jnp.abs(d))
    out["cg_max_abs_err"] = float(_acc(lsc, tau_b, snr, rx))
    print(f"[probe] cg max|err| vs direct: {out['cg_max_abs_err']:.2e}",
          flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[probe] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
