#!/usr/bin/env python
"""Round-4 train-step decomposition at the contending batch sizes:
per-stage ms for the roofline byte-accounting table (PERF.md
§Training). Stages measured by ablation on the SAME jitted scan-16
harness as bench --train:

  full          gather + AWGN(rbg) + fwd/bwd + Adam
  full_threefry same with the counter-based RNG
  no_awgn       noise draw removed (method='default')
  fwd_only      gather + forward + loss (no grad, no Adam)
  gather_only   gather + full reductions (the batch-assembly floor)

Writes results/probe_r4_train.json, keyed per batch size.
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
    ap.add_argument("--batch", type=int, nargs="+", default=[2048, 4096])
    ap.add_argument("--steps-per-call", type=int, default=16)
    ap.add_argument("--calls", type=int, default=10)
    ap.add_argument("--packets", type=int, default=64)
    ap.add_argument("-o", "--out", default="results/probe_r4_train.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    if os.environ.get("JAX_PLATFORMS"):
        # the TPU plugin's sitecustomize force-resets jax_platforms on
        # interpreter start; honor an explicit env override (CPU smoke)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"[probe] device: {jax.devices()[0]}", flush=True)

    from mamimo_tpu.config import SimConfig, TrainConfig
    from mamimo_tpu.models.mlp import init_stacked
    from mamimo_tpu.ops.ltf import pilot_p_matrix
    from mamimo_tpu.train.loop import (
        _gather_batch,
        make_batch_update,
        make_optimizer,
        make_train_step,
    )

    cfg = SimConfig()
    key = jax.random.PRNGKey(0)
    K = args.steps_per_call

    @jax.jit
    def _mk_data(k):
        k1, k2 = jax.random.split(k)
        rx = jax.random.normal(
            k1, (args.packets, cfg.len_ltf, cfg.num_rx, 2))
        h = jax.random.normal(
            k2, (args.packets, cfg.num_carriers, cfg.num_tx,
                 cfg.num_rx, 2))
        return {
            "rx": jax.lax.complex(rx[..., 0], rx[..., 1]),
            "h": jax.lax.complex(h[..., 0], h[..., 1]),
            "P": pilot_p_matrix(cfg.num_tx).astype(jnp.float32),
        }

    data = _mk_data(key)
    n_samples = args.packets * cfg.num_tx * cfg.num_rx
    out = {"steps_per_call": K, "per_batch": {}}

    def timed(run, state):
        state, loss = run(state, jax.random.PRNGKey(1))   # warm/compile
        float(loss.reshape(-1)[0])
        t0 = time.perf_counter()
        for i in range(args.calls):
            state, loss = run(state, jax.random.PRNGKey(2 + i))
        float(loss.reshape(-1)[0])
        return (time.perf_counter() - t0) / (args.calls * K)

    for bs in args.batch:
        paths = {}

        def mk_idx(k, bs=bs):
            return (jax.random.randint(k, (K, bs), 0, n_samples),
                    jax.random.split(k, K))

        for name, tkw in (
            ("full", dict(awgn_rng="rbg")),
            ("full_threefry", dict(awgn_rng="threefry")),
            ("no_awgn", dict(method="default")),
        ):
            tcfg = TrainConfig(batch_size=bs, steps_per_call=K, **tkw)
            params, bn = init_stacked(key, cfg, tcfg)
            # bare Adam scaling: make_train_step applies -lr*u itself
            opt = make_optimizer(tcfg)
            ostate = jax.jit(opt.init)(params)
            step = make_train_step(cfg, tcfg, data, 1.0, opt)[0]

            def run(state, k, step=step, lr=tcfg.lr):
                p, b, o = state
                idx, keys = mk_idx(k)
                p, b, o, loss = step.multi(p, b, o, idx, keys, lr)
                return (p, b, o), loss

            dt = timed(run, (params, bn, ostate))
            paths[name] = round(dt * 1e3, 4)
            print(f"[probe] bs{bs} {name}: {dt*1e3:.3f} ms/step",
                  flush=True)

        # fwd_only: eval core on the same gather (scanned K/dispatch)
        tcfg = TrainConfig(batch_size=bs, steps_per_call=K)
        params, bn = init_stacked(key, cfg, tcfg)
        _, eval_core = make_batch_update(cfg, tcfg, 1.0,
                                         optax.scale_by_adam())

        @jax.jit
        def _fwd_multi(data, params, bn, idx2, eval_core=eval_core):
            def body(_, idx):
                x2, pilot, y2 = _gather_batch(cfg, data, idx)
                return None, eval_core(params, bn, x2, pilot, y2)
            _, per = jax.lax.scan(body, None, idx2)
            return jnp.sum(per, axis=0)

        def run_fwd(state, k):
            idx, _ = mk_idx(k)
            return state, _fwd_multi(data, params, bn, idx)

        paths["fwd_only"] = round(timed(run_fwd, None) * 1e3, 4)
        print(f"[probe] bs{bs} fwd_only: {paths['fwd_only']} ms/step",
              flush=True)

        # gather_only: batch assembly + FULL reductions (a strided
        # sample would let XLA gather only the touched columns and
        # under-measure the assembly)
        @jax.jit
        def _gather_multi(data, idx2):
            def body(_, idx):
                x2, pilot, y2 = _gather_batch(cfg, data, idx)
                return None, (jnp.sum(x2) + jnp.sum(y2)
                              + jnp.sum(pilot))
            _, per = jax.lax.scan(body, None, idx2)
            return jnp.sum(per).reshape(1)

        def run_gather(state, k):
            idx, _ = mk_idx(k)
            return state, _gather_multi(data, idx)

        paths["gather_only"] = round(timed(run_gather, None) * 1e3, 4)
        print(f"[probe] bs{bs} gather_only: {paths['gather_only']} "
              "ms/step", flush=True)
        out["per_batch"][str(bs)] = paths
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)

    print(f"[probe] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
