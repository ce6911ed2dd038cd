"""Device meshes, sharded estimation (sequence-parallel LS) and
DP+TP training."""

from mamimo_tpu.parallel.mesh import make_mesh  # noqa: F401
from mamimo_tpu.parallel.sharded import (  # noqa: F401
    make_sharded_train_step,
    param_shardings,
    sharded_ls_estimate,
)
