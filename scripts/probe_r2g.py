#!/usr/bin/env python
"""Probe G: pallas LS block-size sweep + full hybrid at batch 1024/2048."""

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
from mamimo_tpu.models.mlp import init_stacked                # noqa: E402
from mamimo_tpu.ops.pallas import (                           # noqa: E402
    ls_planes_pallas,
    ls_planes_pallas_constants,
)


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
    t = {}

    def run(name, step, per_call=1):
        t0 = time.time()
        t[name] = _time_fn(step, planes, iters, per_call=per_call)
        print(f"{name}: {t[name]*1e3:.3f} ms "
              f"({n_est/t[name]/1e6:.2f} M est/s) "
              f"[compile+run {time.time()-t0:.0f}s]", flush=True)

    U = unroll
    for bs in (4, 8, 16, 32):
        c = ls_planes_pallas_constants(cfg, bs, dtype=jnp.bfloat16)
        run(f"ls_pallas_bs{bs}", _chained_step(
            lambda c, p, bs=bs: ls_planes_pallas(
                cfg, p, c, block_samples=bs), (c,), unroll=U), per_call=U)
    run(f"full_hybrid_u{U}", make_estimation_fn_planes(
        cfg, tcfg, params, bn, input_bf16=True, ls_pallas=True, unroll=U),
        per_call=U)
    print(json.dumps({k: round(v * 1e3, 3) for k, v in t.items()}))


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    main(batch=b)
