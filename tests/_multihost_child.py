"""Child process for tests/test_multihost.py — NOT collected by pytest.

Runs as one of two `jax.distributed` processes on the CPU backend
(2 local devices each -> a 4-device global mesh spanning both), and
exercises the actual multi-host entry points:

  * `parallel.multihost.init` (gloo CPU collectives)
  * `parallel.multihost.local_batch_slice` + global array assembly
  * cross-process psum inside `sharded_ls_estimate` (the seq axis spans
    the process boundary)
  * one DP train step of `make_sharded_train_step` with the batch
    sharded across processes

Prints "MH_OK <param-checksum>" on success; the parent asserts both
processes print the same checksum (replicated params stayed in sync
through the cross-process gradient allreduce).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

process_id = int(sys.argv[1])
port = sys.argv[2]

from mamimo_tpu.parallel.multihost import init, local_batch_slice  # noqa: E402

init(coordinator_address=f"127.0.0.1:{port}", num_processes=2,
     process_id=process_id)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from mamimo_tpu.config import SimConfig, TrainConfig  # noqa: E402
from mamimo_tpu.parallel.mesh import make_mesh  # noqa: E402
from mamimo_tpu.parallel.sharded import (  # noqa: E402
    make_sharded_train_step,
    sharded_ls_estimate,
)
from mamimo_tpu.pipeline.sounding import estimate_from_rx  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()
assert len(jax.local_devices()) == 2

cfg = SimConfig(num_tx=8, num_rx=2, n_scatterers=20, n_rays=50)

# ---- global batch assembly + reduction across processes ----
mesh = make_mesh({"data": 4})
full = np.arange(16.0, dtype=np.float32).reshape(16, 1)
sl = local_batch_slice(16)
assert sl == slice(process_id * 8, (process_id + 1) * 8), sl
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), full[sl])
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
np.testing.assert_allclose(float(total), full.sum())

# ---- seq-parallel LS: the psum crosses the process boundary ----
z = jax.random.normal(jax.random.PRNGKey(3), (2, cfg.len_ltf, cfg.num_rx, 2))
rx = (z[..., 0] + 1j * z[..., 1]).astype(jnp.complex64)
ref, _ = estimate_from_rx(cfg, rx)
seq_mesh = make_mesh({"seq": 4})
out = sharded_ls_estimate(cfg, seq_mesh, rx)
np.testing.assert_allclose(np.asarray(jax.device_get(out)),
                           np.asarray(ref), atol=2e-5)

# ---- one DP train step with the batch sharded across processes ----
tcfg = TrainConfig(hidden=(32, 32), batch_size=16, dropout=0.0,
                   method="default", seed=0)
init_fn, step_fn = make_sharded_train_step(cfg, tcfg, mesh)
params, bn, opt_state = init_fn(jax.random.PRNGKey(0))

rng = np.random.default_rng(0)
x2_full = rng.standard_normal((2, 16, cfg.len_ltf)).astype(np.float32)
pil_full = rng.standard_normal((16, cfg.num_tx)).astype(np.float32)
y2_full = rng.standard_normal((2, 16, cfg.num_carriers)).astype(np.float32)
batch_sh = NamedSharding(mesh, P(None, "data"))
x2 = jax.make_array_from_process_local_data(batch_sh, x2_full[:, sl])
y2 = jax.make_array_from_process_local_data(batch_sh, y2_full[:, sl])
pilot = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), pil_full[sl])
params, bn, opt_state, loss = step_fn(params, bn, opt_state, x2, pilot,
                                      y2, jax.random.PRNGKey(7), 1e-3)
loss = np.asarray(jax.device_get(loss))
assert np.all(np.isfinite(loss)), loss

# replicated-param checksum (all leaves) must agree across processes
rep = jax.jit(lambda p: sum(jnp.sum(jnp.abs(l))
                            for l in jax.tree.leaves(p)),
              out_shardings=NamedSharding(mesh, P()))(params)
print(f"MH_OK {float(rep):.6f} loss={loss.tolist()}", flush=True)
