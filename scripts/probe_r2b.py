#!/usr/bin/env python
"""Round-2 probe B: decompose the fused-path time at large batch with
the despread-on-real fix, bf16 LS, and scan-unrolled steady state.

Usage: python scripts/probe_r2b.py [batch] [unroll]
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
    _chained_step,
    _time_fn,
    make_estimation_fn_planes,
)
from mamimo_tpu.config import SimConfig, TrainConfig          # noqa: E402
from mamimo_tpu.models.mlp import (                           # noqa: E402
    init_stacked,
    predict_all_pairs_planes_flat,
)
from mamimo_tpu.ops.estimate import (                         # noqa: E402
    ls_estimate_planes,
    ls_planes_constants,
)


def main(batch=1024, unroll=4, iters=5):
    cfg = SimConfig()
    tcfg = TrainConfig()
    key = jax.random.PRNGKey(0)
    params, bn = init_stacked(key, cfg, tcfg)

    @jax.jit
    def _mk(k):
        return jax.random.normal(
            k, (2, batch * cfg.num_rx, cfg.len_ltf))

    planes = _mk(key)
    n_est = batch * cfg.num_tx * cfg.num_rx
    lsp = ls_planes_constants(cfg)

    t = {}

    def run(name, step, per_call=1):
        t0 = time.time()
        t[name] = _time_fn(step, planes, iters, per_call=per_call)
        print(f"{name}: {t[name]*1e3:.3f} ms "
              f"({n_est/t[name]/1e6:.2f} M est/s) "
              f"[compile+run {time.time()-t0:.0f}s]", flush=True)

    U = unroll
    run("noop", _chained_step(lambda p: p))
    run(f"noop_u{U}", _chained_step(lambda p: p, unroll=U), per_call=U)
    run(f"ls_f32_u{U}", _chained_step(
        lambda c, p: ls_estimate_planes(
            cfg, p, c), (lsp,), unroll=U),
        per_call=U)
    run(f"ls_bf16_u{U}", _chained_step(
        lambda c, p: ls_estimate_planes(
            cfg, p, c, dtype=jnp.bfloat16),
        (lsp,), unroll=U), per_call=U)
    run(f"dnn_bf16_u{U}", _chained_step(
        lambda pp, bb, p: predict_all_pairs_planes_flat(
            cfg, tcfg, pp, bb, p, dtype=jnp.bfloat16),
        (params, bn), unroll=U), per_call=U)
    run(f"dnn_f32_u{U}", _chained_step(
        lambda pp, bb, p: predict_all_pairs_planes_flat(
            cfg, tcfg, pp, bb, p, dtype=None),
        (params, bn), unroll=U), per_call=U)
    run(f"full_bf16_u{U}", make_estimation_fn_planes(
        cfg, tcfg, params, bn, use_bf16=True, ls_bf16=True, unroll=U),
        per_call=U)

    # bf16 STORAGE input: no in-graph downcasts to elide
    planes16 = jax.jit(lambda p: p.astype(jnp.bfloat16))(planes)
    lsp16 = ls_planes_constants(cfg, dtype=jnp.bfloat16)

    def run16(name, step, per_call=1):
        t0 = time.time()
        t[name] = _time_fn(step, planes16, iters, per_call=per_call)
        print(f"{name}: {t[name]*1e3:.3f} ms "
              f"({n_est/t[name]/1e6:.2f} M est/s) "
              f"[compile+run {time.time()-t0:.0f}s]", flush=True)

    run16(f"noop16_u{U}", _chained_step(lambda p: p, unroll=U), per_call=U)
    run16(f"ls_bf16in_u{U}", _chained_step(
        lambda c, p: ls_estimate_planes(cfg, p, c), (lsp16,), unroll=U),
        per_call=U)
    run16(f"dnn_bf16in_u{U}", _chained_step(
        lambda pp, bb, p: predict_all_pairs_planes_flat(
            cfg, tcfg, pp, bb, p, dtype=jnp.bfloat16),
        (params, bn), unroll=U), per_call=U)
    run16(f"full_bf16in_u{U}", make_estimation_fn_planes(
        cfg, tcfg, params, bn, input_bf16=True, unroll=U), per_call=U)

    # fused Pallas LS (DFT + Kronecker block-despread, z in VMEM)
    from mamimo_tpu.ops.pallas import (
        ls_planes_pallas,
        ls_planes_pallas_constants,
    )
    lspk = ls_planes_pallas_constants(cfg, dtype=jnp.bfloat16)
    run16(f"ls_pallas16_u{U}", _chained_step(
        lambda c, p: ls_planes_pallas(cfg, p, c), (lspk,), unroll=U),
        per_call=U)
    run16(f"full_pallasls16_u{U}", make_estimation_fn_planes(
        cfg, tcfg, params, bn, input_bf16=True, ls_pallas=True, unroll=U),
        per_call=U)
    print(json.dumps({k: round(v * 1e3, 3) for k, v in t.items()}))


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    u = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    main(batch=b, unroll=u)
