#!/usr/bin/env python
"""Diagnose the fused Pallas kernels on the real chip: run each kernel
standalone with full tracebacks, then compare values vs the XLA path."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
os.environ["JAX_TRACEBACK_FILTERING"] = "off"

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from mamimo_tpu.config import SimConfig, TrainConfig
from mamimo_tpu.models.mlp import init_csi_mlp
from mamimo_tpu.ops.pallas.fused_ls import ls_estimate_pallas
from mamimo_tpu.ops.pallas.mlp_infer import mlp_infer_pallas

print(jax.devices(), flush=True)
cfg = SimConfig()
tcfg = TrainConfig()
key = jax.random.PRNGKey(0)


def report(name, fn):
    try:
        out = fn()
        v = float(jnp.sum(jnp.abs(out)))
        print(f"{name} OK |sum|={v:.3f}", flush=True)
    except Exception as e:
        import traceback

        print(f"{name} FAIL: {type(e).__name__}", flush=True)
        traceback.print_exc()


# fused LS
@jax.jit
def mk_rx(k):
    z = jax.random.normal(k, (4, cfg.len_ltf, cfg.num_rx, 2))
    return jax.lax.complex(z[..., 0], z[..., 1])


rx = mk_rx(key)
report("fused_ls", lambda: jax.jit(
    lambda r: jnp.abs(ls_estimate_pallas(cfg, r, interpret=False)))(rx))

# fused MLP
params, bn = init_csi_mlp(key, cfg, tcfg)
x = jax.random.normal(key, (256, cfg.len_ltf + cfg.num_tx))
report("fused_mlp", lambda: jax.jit(
    lambda p, b, xx: mlp_infer_pallas(tcfg, p, b, xx, interpret=False)
)(params, bn, x))
