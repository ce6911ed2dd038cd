"""Dataset containers and reference-format interop."""

from mamimo_tpu.data.matlab_io import (  # noqa: F401
    export_predictions_mat,
    load_pickle_dataset,
    load_reference_mat,
    save_pickle_dataset,
)
from mamimo_tpu.data.sources import get_datasource, register_datasource  # noqa: F401
