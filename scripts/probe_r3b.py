#!/usr/bin/env python
"""Probe R3B: invariant-operand harness, LS v2 DMA blocks, serving r3
path at unroll 8/16, int8-vs-bf16 at bigger mm blocks."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mamimo_tpu.bench import (                                # noqa: E402
    _abs_sum,
    _chained_step_invariant,
    _time_fn,
    make_estimation_fn_serving_r3,
)
from mamimo_tpu.config import SimConfig, TrainConfig          # noqa: E402
from mamimo_tpu.models.mlp import init_stacked                # noqa: E402
from mamimo_tpu.ops.pallas import (                           # noqa: E402
    ls_planes_pallas_v2,
    ls_planes_pallas_v2_constants,
)
from mamimo_tpu.ops.pallas.int8_mm import matmul_pallas       # noqa: E402


def main(batch=1024, iters=5):
    cfg = SimConfig()
    tcfg = TrainConfig()
    key = jax.random.PRNGKey(0)
    params, bn = init_stacked(key, cfg, tcfg)

    @jax.jit
    def _mk(k):
        return jax.random.normal(
            k, (2, batch * cfg.num_rx, cfg.len_ltf)).astype(jnp.bfloat16)

    planes = _mk(key)
    n_est = batch * cfg.num_tx * cfg.num_rx
    t = {}
    s0 = 1.0

    def run(name, step, per_call, arg=s0):
        t0 = time.time()
        try:
            t[name] = _time_fn(step, arg, iters, per_call=per_call)
            print(f"{name}: {t[name]*1e3:.3f} ms "
                  f"({n_est/t[name]/1e6:.2f} M est/s) "
                  f"[compile+run {time.time()-t0:.0f}s]", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    # harness floor with invariant operands
    run("noop_inv_u8", _chained_step_invariant(
        lambda s8, p: s8, (jnp.zeros((8, 8)), planes),
        lambda ex, eps: (ex[0] * (1.0 + eps), ex[1]), unroll=8), 8)

    # LS v2 alone, invariant harness, dma variants (ssq reduce)
    for dma in (8, 32, 64):
        c2 = ls_planes_pallas_v2_constants(cfg, 8, dtype=jnp.bfloat16)

        def core(c, p):
            return ls_planes_pallas_v2(
                cfg, p, c, block_samples=8, dma_samples=dma,
                with_ssq=True, out_dtype=jnp.bfloat16)[1]

        run(f"ls_v2_dma{dma}_inv", _chained_step_invariant(
            core, (c2, planes),
            lambda ex, eps: ((ex[0][0] * (1.0 + eps).astype(ex[0][0].dtype),
                              ex[0][1]), ex[1]),
            unroll=8), 8)

    # full serving r3 at unroll 8 and 16, dma 32
    for u in (8, 16):
        run(f"serving_r3_u{u}",
            make_estimation_fn_serving_r3(cfg, tcfg, params, bn,
                                          unroll=u)(planes), u)

    # int8 vs bf16 at bigger mm blocks
    M, K, N = n_est, 1024, 1024
    kb = jax.random.PRNGKey(7)
    a_bf = jax.jit(lambda k: jax.random.normal(k, (M, K)).astype(
        jnp.bfloat16))(kb)
    b_bf = jax.jit(lambda k: jax.random.normal(k, (K, N)).astype(
        jnp.bfloat16))(kb)
    a_i8 = jax.jit(lambda k: jax.random.randint(
        k, (M, K), -127, 127, jnp.int8))(kb)
    b_i8 = jax.jit(lambda k: jax.random.randint(
        k, (K, N), -127, 127, jnp.int8))(kb)
    flops = 2.0 * M * K * N
    for bm in (1024, 2048):
        for nm, a_, b_ in (("bf16", a_bf, b_bf), ("int8", a_i8, b_i8)):
            def core(b_c, a_c):
                out = matmul_pallas(a_c, b_c, block_m=bm,
                                    out_dtype=jnp.bfloat16
                                    if nm == "bf16" else jnp.int32)
                return _abs_sum(out)

            def pert(ex, eps):
                b_c, a_c = ex
                if nm == "bf16":
                    return b_c * (1.0 + eps).astype(b_c.dtype), a_c
                # int8 weight chain: flip the sign of row parity-selected
                # by s — value-visible, stays int8
                d = (eps * 1e6).astype(jnp.int32) % 3 - 1
                return b_c.at[:1].add(d.astype(jnp.int8)), a_c

            name = f"mm_{nm}_bm{bm}"
            t0 = time.time()
            try:
                dt = _time_fn(_chained_step_invariant(
                    core, (b_, a_), pert, unroll=8), s0, iters,
                    per_call=8)
                t[name] = dt
                print(f"{name}: {dt*1e3:.3f} ms ({flops/dt/1e12:.1f} T/s) "
                      f"[compile+run {time.time()-t0:.0f}s]", flush=True)
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {e}",
                      flush=True)

    print(json.dumps({k: round(v * 1e3, 3) for k, v in t.items()}))


if __name__ == "__main__":
    main(batch=int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
