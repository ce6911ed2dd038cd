#!/usr/bin/env python
"""Round-3 train-step decomposition probe: where do the 2.77 ms/step
(52.8 TFLOP/s ≈ 27% MFU at batch 1024) go?

Variants timed with the same chained ×16-scan harness as
bench.run_train_bench (params thread through the scan → intrinsically
serialized; forced loss fetch closes the window):

  full        method=default_snr, dropout 0.15  (production)
  no_awgn     method=default (skips the 20.5M-normal AWGN draw)
  no_dropout  dropout=0.0 (skips two (2,bs,1024) uniform masks)
  no_rng      both off — all remaining RNG is the split chain
  fwd_only    eval_core scanned ×16 (no grad/optimizer): bwd cost

Writes results/probe_r3d.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    from mamimo_tpu.config import SimConfig, TrainConfig
    from mamimo_tpu.models.mlp import init_stacked
    from mamimo_tpu.ops.ltf import pilot_p_matrix
    from mamimo_tpu.train.loop import make_train_step

    cfg = SimConfig()
    bs, K, calls = 1024, 16, 10
    num_packets = 64
    key = jax.random.PRNGKey(0)

    @jax.jit
    def _mk_data(k):
        k1, k2 = jax.random.split(k)
        rx = jax.random.normal(k1, (num_packets, cfg.len_ltf,
                                    cfg.num_rx, 2))
        h = jax.random.normal(k2, (num_packets, cfg.num_carriers,
                                   cfg.num_tx, cfg.num_rx, 2))
        return {"rx": jax.lax.complex(rx[..., 0], rx[..., 1]),
                "h": jax.lax.complex(h[..., 0], h[..., 1]),
                "P": pilot_p_matrix(cfg.num_tx).astype(jnp.float32)}

    data = _mk_data(key)
    n_samples = num_packets * cfg.num_tx * cfg.num_rx

    variants = {
        "full": TrainConfig(batch_size=bs, steps_per_call=K),
        "no_awgn": TrainConfig(batch_size=bs, steps_per_call=K,
                               method="default"),
        "no_dropout": TrainConfig(batch_size=bs, steps_per_call=K,
                                  dropout=0.0),
        "no_rng": TrainConfig(batch_size=bs, steps_per_call=K,
                              method="default", dropout=0.0),
    }
    out = {"batch": bs, "steps_per_call": K, "paths": {}}
    for name, tcfg in variants.items():
        params, bn = init_stacked(key, cfg, tcfg)
        opt = optax.adam(tcfg.lr)
        opt_state = jax.jit(opt.init)(params)
        step = make_train_step(cfg, tcfg, data, 1.0, opt)[0]
        args = []
        for i in range(calls + 1):
            k = jax.random.PRNGKey(10 + i)
            args.append((jax.random.randint(k, (K, bs), 0, n_samples),
                         jax.random.split(k, K)))
        jax.block_until_ready(args)
        idx, keys = args[0]
        params, bn, opt_state, loss = step.multi(
            params, bn, opt_state, idx, keys, tcfg.lr)
        float(loss[0])
        t0 = time.perf_counter()
        for idx, keys in args[1:]:
            params, bn, opt_state, loss = step.multi(
                params, bn, opt_state, idx, keys, tcfg.lr)
        float(loss[0])
        dt = (time.perf_counter() - t0) / (calls * K)
        out["paths"][name] = round(dt * 1e3, 4)
        log(f"{name}: {dt*1e3:.3f} ms/step")

    # fwd-only: scanned eval over the same gathers (no bwd, no adam)
    tcfg = variants["no_rng"]
    params, bn = init_stacked(key, cfg, tcfg)
    step_pair = make_train_step(cfg, tcfg, data, 1.0,
                                optax.adam(tcfg.lr))
    eval_multi = step_pair[1].multi
    args = [jax.random.randint(jax.random.PRNGKey(30 + i), (K, bs), 0,
                               n_samples) for i in range(calls + 1)]
    jax.block_until_ready(args)
    r = eval_multi(params, bn, args[0]); float(r[0])
    t0 = time.perf_counter()
    for idx in args[1:]:
        r = eval_multi(params, bn, idx)
    float(r[0])
    dt = (time.perf_counter() - t0) / (calls * K)
    out["paths"]["fwd_only"] = round(dt * 1e3, 4)
    log(f"fwd_only: {dt*1e3:.3f} ms/step")

    with open("results/probe_r3d.json", "w") as f:
        json.dump(out, f, indent=2)
    log("wrote results/probe_r3d.json")


if __name__ == "__main__":
    main()
