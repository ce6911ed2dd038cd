"""Core DSP ops — pure JAX, jit/vmap-able, complex64."""

from mamimo_tpu.ops.ofdm import ofdm_modulate, ofdm_demodulate  # noqa: F401
from mamimo_tpu.ops.ltf import (  # noqa: F401
    ltf_sequence,
    hadamard,
    pilot_p_matrix,
    gen_preamble,
)
from mamimo_tpu.ops.estimate import (  # noqa: F401
    lmmse_eig_factor,
    lmmse_estimate,
    lmmse_estimate_cg,
    lmmse_estimate_direct,
    lmmse_estimate_eig,
    ls_estimate,
    ls_estimate_matmul,
)
from mamimo_tpu.ops.metrics import nmse_subk, mse_abs, evm_rms  # noqa: F401
from mamimo_tpu.ops.omp import omp_decomp, omp_hyb_weights  # noqa: F401
from mamimo_tpu.ops.jsdm import jsdm_transmit_weights  # noqa: F401
