#!/usr/bin/env python
"""Probe R3C: invariant harness (aval-pinned) — LS v2 + serving r3."""

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


def main(batch=1024, iters=10):
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

    def run(name, step, per_call):
        t0 = time.time()
        try:
            t[name] = _time_fn(step, 1.0, iters, per_call=per_call)
            print(f"{name}: {t[name]*1e3:.3f} ms "
                  f"({n_est/t[name]/1e6:.2f} M est/s) "
                  f"[compile+run {time.time()-t0:.0f}s]", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    run("noop_inv_u8", _chained_step_invariant(
        lambda s8, p: s8, (jnp.zeros((8, 8)), planes),
        lambda ex, eps: (ex[0] * (1.0 + eps), ex[1]), unroll=8), 8)

    for dma in (8, 32):
        c2 = ls_planes_pallas_v2_constants(cfg, 8, dtype=jnp.bfloat16)

        def core(c, p, dma=dma):
            return ls_planes_pallas_v2(
                cfg, p, c, block_samples=8, dma_samples=dma,
                with_ssq=True, out_dtype=jnp.bfloat16)[1]

        run(f"ls_v2_dma{dma}_inv", _chained_step_invariant(
            core, (c2, planes),
            lambda ex, eps: ((ex[0][0] * (1.0 + eps).astype(ex[0][0].dtype),
                              ex[0][1]), ex[1]),
            unroll=8), 8)

    for u in (8, 16):
        run(f"serving_r3_u{u}",
            make_estimation_fn_serving_r3(cfg, tcfg, params, bn,
                                          unroll=u)(planes), u)

    print(json.dumps({k: round(v * 1e3, 3) for k, v in t.items()}))


if __name__ == "__main__":
    main(batch=int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
