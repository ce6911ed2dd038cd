"""DNN models: the CSI denoiser MLP and deployment inference wrapper."""

from mamimo_tpu.models.mlp import (  # noqa: F401
    init_csi_mlp,
    init_stacked,
    csi_mlp_apply,
    stacked_apply,
    predict_complex,
    predict_all_pairs,
    model_input_spec,
)
from mamimo_tpu.models.predictor import CSIPredictor  # noqa: F401
