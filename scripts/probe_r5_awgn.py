#!/usr/bin/env python
"""Round-5 AWGN-stage probe (VERDICT r4 #2): measure the full training
step at batch 2048 for each AWGN draw variant. Round 4 established the
stage decomposition (results/probe_r4_train.json): fwd 94% of MXU bound,
bwd+Adam 78%, AWGN draw+add 1.39 ms (37% of the 3.73 ms step) —
transcendental-bound even under the hardware RNG, because Box-Muller
pays log/sqrt/sincos per normal. The 'rbg_clt' variant replaces the map
with an Irwin-Hall(4) byte-sum (integer lane ops only).

Timing follows probe_r4_train.py: scan-K fused dispatch, donated state,
forced scalar fetch per window; synthetic device-resident corpus.

Writes results/probe_r5_awgn.json.
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
    ap.add_argument("--batches", type=int, nargs="*", default=[2048])
    ap.add_argument("--steps-per-call", type=int, default=16)
    ap.add_argument("--packets", type=int, default=288)
    ap.add_argument("-o", "--out", default="results/probe_r5_awgn.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mamimo_tpu.config import SimConfig, TrainConfig
    from mamimo_tpu.models.mlp import init_stacked
    from mamimo_tpu.train.loop import make_optimizer, make_train_step

    cfg = SimConfig()
    key = jax.random.PRNGKey(0)
    K = args.steps_per_call
    print(f"[probe] device {jax.devices()[0]}", flush=True)

    # synthetic corpus in the production complex container layout
    # (content doesn't affect timing; complex built in-jit)
    B = args.packets
    T, R, L, C = cfg.num_tx, cfg.num_rx, cfg.len_ltf, cfg.num_carriers

    @jax.jit
    def _mk(k):
        k1, k2 = jax.random.split(k)
        rx = jax.lax.complex(
            jax.random.normal(k1, (B, L, R)),
            jax.random.normal(k1, (B, L, R)))
        h = jax.lax.complex(
            jax.random.normal(k2, (B, C, T, R)),
            jax.random.normal(k2, (B, C, T, R)))
        return {"rx": rx, "h": h,
                "P": jnp.asarray(np.eye(T, dtype=np.float32))}

    from mamimo_tpu.ops.ltf import pilot_p_matrix
    data = _mk(key)
    data["P"] = pilot_p_matrix(T).astype(jnp.float32)
    n_samples = B * T * R

    def timed(run, state, iters=10):
        # a host SCALAR FETCH is the only true barrier on this backend —
        # block_until_ready can acknowledge before execution (PERF.md)
        k0 = jax.random.PRNGKey(9)
        state, loss = run(state, k0)       # compile+warm
        float(loss.reshape(-1)[0])
        t0 = time.time()
        for i in range(iters):
            state, loss = run(state, jax.random.fold_in(k0, i))
        float(loss.reshape(-1)[0])
        return (time.time() - t0) / (iters * K)

    out = {"device": str(jax.devices()[0]), "steps_per_call": K,
           "flops_note": "fwd+bwd at 3x forward", "paths": {}}
    for bs in args.batches:
        paths = {}
        for name, tkw in (
            ("rbg", dict(awgn_rng="rbg")),
            ("rbg_clt", dict(awgn_rng="rbg_clt")),
            ("threefry", dict(awgn_rng="threefry")),
            ("no_awgn", dict(method="default")),
        ):
            tcfg = TrainConfig(batch_size=bs, steps_per_call=K, **tkw)
            params, bn = init_stacked(key, cfg, tcfg)
            opt = make_optimizer(tcfg)
            ostate = jax.jit(opt.init)(params)
            step = make_train_step(cfg, tcfg, data, 1.0, opt)[0]

            def mk_idx(k):
                return (jax.random.randint(k, (K, bs), 0, n_samples),
                        jax.random.split(k, K))

            def run(state, k, step=step, lr=tcfg.lr):
                p, b, o = state
                idx, keys = mk_idx(k)
                p, b, o, loss = step.multi(p, b, o, idx, keys, lr)
                return (p, b, o), loss

            dt = timed(run, (params, bn, ostate))
            # fwd GFLOP per sample: 2*(L+T)*H1 + 2*H1*H2 + 2*H2*C, x2 planes
            h1, h2 = tcfg.hidden
            gflop = 2 * ((L + T) * h1 + h1 * h2 + h2 * C) * 2 * bs / 1e9
            tf = 3 * gflop / dt / 1e3
            paths[name] = {"ms_per_step": round(dt * 1e3, 4),
                           "achieved_tflops": round(tf, 1)}
            print(f"[probe] bs{bs} {name}: {dt*1e3:.3f} ms/step "
                  f"= {tf:.1f} TFLOP/s", flush=True)
        base = paths.get("rbg", {}).get("ms_per_step")
        na = paths.get("no_awgn", {}).get("ms_per_step")
        for name, p in paths.items():
            if na is not None and name != "no_awgn":
                p["awgn_stage_ms"] = round(p["ms_per_step"] - na, 4)
        out["paths"][str(bs)] = paths
        if base:
            print(f"[probe] bs{bs}: awgn stage rbg "
                  f"{paths['rbg'].get('awgn_stage_ms')} ms -> rbg_clt "
                  f"{paths['rbg_clt'].get('awgn_stage_ms')} ms", flush=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[probe] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
