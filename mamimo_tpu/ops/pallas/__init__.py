"""Pallas TPU kernels for the hot ops: fused MLP inference and fused
OFDM-demod + LS despread."""

from mamimo_tpu.ops.pallas.mlp_infer import (  # noqa: F401
    fold_bn_into_dense,
    mlp_infer_pallas,
)
from mamimo_tpu.ops.pallas.fused_ls import (  # noqa: F401
    ls_estimate_pallas,
    ls_planes_pallas,
    ls_planes_pallas_constants,
    ls_planes_pallas_v2,
    ls_planes_pallas_v2_constants,
    ls_v2_to_complex,
)
from mamimo_tpu.ops.pallas.fused_factored import (  # noqa: F401
    fused_factored_planes,
    predict_all_pairs_planes_pallas,
    prepare_factored_weights,
)
