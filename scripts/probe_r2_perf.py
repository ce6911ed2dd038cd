#!/usr/bin/env python
"""Round-2 perf probe: decompose the fused-path time on the real chip.

Times (chained + forced, see bench._time_fn):
  noop            — perturb+reduce only: the per-dispatch floor
  ls_dft_only     — the 4 planes DFT matmuls (no despread)
  ls_planes       — full planes LS
  dnn_xla_bf16    — factored XLA DNN only
  dnn_pallas_a    — fused factored kernel, block_s=128, block_k=1024
  dnn_pallas_b    — fused factored kernel, block_s=256, block_k=512
  full_pallas     — pallas DNN + planes LS (the bench path)
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

from mamimo_tpu.bench import _chained_step, _time_fn          # noqa: E402
from mamimo_tpu.config import SimConfig, TrainConfig          # noqa: E402
from mamimo_tpu.models.mlp import (                           # noqa: E402
    init_stacked,
    predict_all_pairs_planes,
)
from mamimo_tpu.ops.estimate import (                         # noqa: E402
    ls_estimate_planes,
    ls_planes_constants,
)
from mamimo_tpu.ops.pallas import (                           # noqa: E402
    fused_factored_planes,
    prepare_factored_weights,
)


def main(batch=256, iters=20):
    cfg = SimConfig()
    tcfg = TrainConfig()
    key = jax.random.PRNGKey(0)
    params, bn = init_stacked(key, cfg, tcfg)

    @jax.jit
    def _mk(k):
        return jax.random.normal(k, (2, batch, cfg.num_rx, cfg.len_ltf))

    planes = _mk(key)
    n_est = batch * cfg.num_tx * cfg.num_rx
    lsp = ls_planes_constants(cfg)
    prep = prepare_factored_weights(cfg, tcfg, params, bn)

    t = {}

    def run(name, step):
        t0 = time.time()
        t[name] = _time_fn(step, planes, iters)
        print(f"{name}: {t[name]*1e3:.3f} ms "
              f"({n_est/t[name]/1e6:.2f} M est/s) "
              f"[compile+run {time.time()-t0:.0f}s]", flush=True)

    run("noop", _chained_step(lambda p: p))
    run("ls_dft_only", _chained_step(
        lambda c, p: (
            lambda x: (x[0] @ c[0] - x[1] @ c[1],
                       x[0] @ c[1] + x[1] @ c[0])
        )(p.reshape(2, -1, cfg.sym_len)), (lsp,)))
    run("ls_planes", _chained_step(
        lambda c, p: ls_estimate_planes(
            cfg, p.reshape(2, -1, cfg.len_ltf), c), (lsp,)))
    run("dnn_xla_bf16", _chained_step(
        lambda pp, bb, p: predict_all_pairs_planes(
            cfg, tcfg, pp, bb, p, dtype=jnp.bfloat16), (params, bn)))
    run("dnn_pallas_a", _chained_step(
        lambda pr, p: fused_factored_planes(
            cfg, tcfg, pr, p.reshape(2, -1, cfg.len_ltf),
            block_s=128, block_k=1024), (prep,)))
    run("dnn_pallas_b", _chained_step(
        lambda pr, p: fused_factored_planes(
            cfg, tcfg, pr, p.reshape(2, -1, cfg.len_ltf),
            block_s=256, block_k=512), (prep,)))

    def _full(pr, c, p):
        flat = p.reshape(2, -1, cfg.len_ltf)
        return (ls_estimate_planes(cfg, flat, c),
                fused_factored_planes(cfg, tcfg, pr, flat,
                                      block_s=128, block_k=1024))

    run("full_pallas", _chained_step(_full, (prep, lsp)))

    print(json.dumps({k: round(v * 1e3, 3) for k, v in t.items()}))


if __name__ == "__main__":
    main(batch=int(os.environ.get("PROBE_BATCH", "256")),
         iters=int(os.environ.get("PROBE_ITERS", "20")))
