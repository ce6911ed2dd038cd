#!/usr/bin/env python
"""Probe R3A: LS kernel v2 variants, harness decomposition, int8 MXU rate.

Everything at BS32, batch 1024 (131072 estimates/call), scan-unrolled
x8 — the steady-state regime of BENCH_r02.
"""

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
    _chained_step,
    _time_fn,
    make_estimation_fn_planes,
)
from mamimo_tpu.config import SimConfig, TrainConfig          # noqa: E402
from mamimo_tpu.models.mlp import _factored_all_pairs, init_stacked  # noqa: E402
from mamimo_tpu.ops.pallas import (                           # noqa: E402
    ls_planes_pallas,
    ls_planes_pallas_constants,
    ls_planes_pallas_v2,
    ls_planes_pallas_v2_constants,
)
from mamimo_tpu.ops.pallas.int8_mm import matmul_pallas       # noqa: E402


def main(batch=1024, unroll=8, iters=5):
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
    U = unroll
    t = {}

    def run(name, step, arg=None, per_call=U):
        t0 = time.time()
        try:
            t[name] = _time_fn(step, planes if arg is None else arg,
                               iters, per_call=per_call)
            print(f"{name}: {t[name]*1e3:.3f} ms "
                  f"({n_est/t[name]/1e6:.2f} M est/s) "
                  f"[compile+run {time.time()-t0:.0f}s]", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    # 1. harness floor: noop scan (carry the planes, perturb, reduce a
    #    scalar) — what every unrolled path pays per iteration
    run("noop_u8", _chained_step(lambda p: p[0, :8, :8], unroll=U))

    # 2. LS alone: v1 (round-2 winner) vs v2 block variants
    c1 = ls_planes_pallas_constants(cfg, 8, dtype=jnp.bfloat16)
    run("ls_v1_bs8", _chained_step(
        lambda c, p: ls_planes_pallas(cfg, p, c, raw=True,
                                      out_dtype=jnp.bfloat16),
        (c1,), unroll=U))
    for bs in (8, 16, 32):
        c2 = ls_planes_pallas_v2_constants(cfg, bs, dtype=jnp.bfloat16)
        run(f"ls_v2_bs{bs}", _chained_step(
            lambda c, p, bs=bs: ls_planes_pallas_v2(
                cfg, p, c, block_samples=bs, out_dtype=jnp.bfloat16)[0],
            (c2,), unroll=U))
    # v2 with the fused ssq reduction: the chain scalar comes from the
    # kernel's per-block partials — no HBM re-read of the estimates
    c2 = ls_planes_pallas_v2_constants(cfg, 8, dtype=jnp.bfloat16)
    run("ls_v2_bs8_ssq", _chained_step(
        lambda c, p: ls_planes_pallas_v2(
            cfg, p, c, block_samples=8, with_ssq=True,
            out_dtype=jnp.bfloat16)[1],
        (c2,), unroll=U))

    # 3. DNN alone (serving bf16 path)
    run("dnn_only", _chained_step(
        lambda p, b, pla: _factored_all_pairs(
            cfg, tcfg, p, b, pla, dtype=jnp.bfloat16
        ).astype(jnp.bfloat16),
        (params, bn), unroll=U))

    # 4. current full serving path (round-2 headline, cache-warm)
    run("serving_cur", make_estimation_fn_planes(
        cfg, tcfg, params, bn, input_bf16=True, ls_pallas=True,
        serving_planes=True, unroll=U))

    # 5. full serving with LS v2 + fused ssq
    def _serving_v2(p, b, c, pla):
        h, ssq = ls_planes_pallas_v2(cfg, pla, c, block_samples=8,
                                     with_ssq=True,
                                     out_dtype=jnp.bfloat16)
        y2 = _factored_all_pairs(cfg, tcfg, p, b, pla,
                                 dtype=jnp.bfloat16).astype(jnp.bfloat16)
        return ssq, y2

    run("serving_v2", _chained_step(_serving_v2, (params, bn, c2),
                                    unroll=U))

    # 6. bare MXU rate: bf16 vs int8, the layer-2 GEMM shape
    M, K, N = batch * cfg.num_tx * cfg.num_rx, 1024, 1024
    kb = jax.random.PRNGKey(7)
    a_bf = jax.jit(lambda k: jax.random.normal(k, (M, K)).astype(
        jnp.bfloat16))(kb)
    b_bf = jax.jit(lambda k: jax.random.normal(k, (K, N)).astype(
        jnp.bfloat16))(kb)
    a_i8 = jax.jit(lambda k: jax.random.randint(
        k, (M, K), -127, 127, jnp.int8))(kb)
    b_i8 = jax.jit(lambda k: jax.random.randint(
        k, (K, N), -127, 127, jnp.int8))(kb)

    @jax.jit
    def _mm_bf16_step(b_, a_):
        def one(a):
            out = matmul_pallas(a, b_, block_m=512, out_dtype=jnp.bfloat16)
            s = _abs_sum(out)
            eps = 1e-2 * s * jax.lax.rsqrt(s * s + 1.0)
            return a.at[:8].multiply((1.0 + eps).astype(a.dtype)), s
        a_, ss = jax.lax.scan(lambda a, _: one(a), a_, None, length=U)
        return a_, ss[-1]

    @jax.jit
    def _mm_int8_step(b_, a_):
        def one(a):
            out = matmul_pallas(a, b_, block_m=512)
            s = _abs_sum(out)
            # int8 chain: shift the first 8 rows by a value-visible int
            d = (s.astype(jnp.int32) & 1) + 1
            return a.at[:8].add(d.astype(jnp.int8)), s
        a_, ss = jax.lax.scan(lambda a, _: one(a), a_, None, length=U)
        return a_, ss[-1]

    flops = 2.0 * M * K * N
    for name, step, arg in (("mm_bf16", _mm_bf16_step, (b_bf, a_bf)),
                            ("mm_int8", _mm_int8_step, (b_i8, a_i8))):
        t0 = time.time()
        try:
            dt = _time_fn(lambda a, s=step, b_=arg[0]: s(b_, a), arg[1],
                          iters, per_call=U)
            t[name] = dt
            print(f"{name}: {dt*1e3:.3f} ms ({flops/dt/1e12:.1f} "
                  f"T{'OP' if 'int8' in name else 'FLOP'}/s) "
                  f"[compile+run {time.time()-t0:.0f}s]", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    print(json.dumps({k: round(v * 1e3, 3) for k, v in t.items()}))


if __name__ == "__main__":
    main(batch=int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
