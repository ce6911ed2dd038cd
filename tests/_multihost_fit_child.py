"""Child process for test_multihost.py::test_two_process_fit — NOT
collected by pytest.

Runs a FULL fit() (several epochs, early-stop/plateau machinery, mesh
checkpoints from process 0) as one of two `jax.distributed` processes
(2 CPU devices each -> a 4-device global data mesh spanning both).
Each process holds the identical corpus (same generation seed) and the
batch gathers run sharded over the cross-process mesh, so every
optimizer step's gradient allreduce crosses the process boundary.

Prints "MH_FIT_OK <checksum> hist=<loss history>" — the parent asserts
both processes print identical lines (replicated params stayed bitwise
in sync through N epochs) and that the loss history matches a
single-process 4-device fit of the same problem.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
# match the pytest conftest: the parity assertion against the parent's
# single-process fit requires the same matmul precision
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

process_id = int(sys.argv[1])
port = sys.argv[2]
workdir = sys.argv[3] if len(sys.argv) > 3 else None

from mamimo_tpu.parallel.multihost import init  # noqa: E402

init(coordinator_address=f"127.0.0.1:{port}", num_processes=2,
     process_id=process_id)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mamimo_tpu.config import SimConfig, TrainConfig  # noqa: E402
from mamimo_tpu.parallel.mesh import make_mesh  # noqa: E402
from mamimo_tpu.pipeline.dataset import generate_dataset  # noqa: E402
from mamimo_tpu.train import fit  # noqa: E402

assert jax.process_count() == 2
assert len(jax.devices()) == 4

cfg = SimConfig(num_tx=8, num_rx=2, n_scatterers=8, n_rays=20)
# identical corpus on both processes: same generation seed
ds = generate_dataset(cfg, seed=5, num_packets=12, snr_db=120.0, chunk=12)

tcfg = TrainConfig(hidden=(32, 32), batch_size=32, epochs=4, seed=3,
                   dropout=0.0, early_stop_patience=50)
mesh = make_mesh({"data": 4})

res = fit(cfg, tcfg, ds, mesh=mesh,
          workdir=(workdir if process_id == 0 and workdir else None),
          verbose=False)

# checksum over the final best params (host copies after restore-best)
ck = float(sum(np.abs(np.asarray(jax.device_get(lf))).sum()
               for lf in jax.tree.leaves(res.params)))
hist = [round(float(v), 10) for v in
        res.history["loss_real"] + res.history["val_loss_real"]]
print(f"MH_FIT_OK {ck:.8f} hist={hist}", flush=True)
