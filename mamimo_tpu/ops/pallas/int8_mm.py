"""Hand-tiled int8 matmul kernel (Pallas, TPU).

The v5e MXU's nominal s8×s8→s32 rate is 2× bf16 (~394 TOPS), but the
XLA lowering of `lax.dot_general` on int8 operands measured only 1.09×
bf16 on this backend (PERF.md round 2b). This kernel settles whether
the chip can actually be driven at the int8 rate: a minimal, explicitly
tiled s8 GEMM with the weight matrix VMEM-resident and int32 MXU
accumulation — the shape probed is the hot DNN layer-2 GEMM
(S·num_tx × H) @ (H × H) from the serving path
(massiveMIMO_CSI_prediction_DNN.py:195-234 architecture).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mamimo_tpu.ops.pallas.util import _round_up


def _mm_kernel(a_ref, b_ref, o_ref, *, acc_dtype):
    o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                       preferred_element_type=acc_dtype
                       ).astype(o_ref.dtype)


def matmul_pallas(a, b, *, block_m: int = 512, out_dtype=None,
                  interpret: bool | None = None):
    """C = A @ B with A (M, K), B (K, N) — B held VMEM-resident, A
    streamed in row blocks. int8 operands accumulate in int32 on the
    MXU; bf16/f32 accumulate in f32. M is padded to the block size.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, k = a.shape
    k2, n = b.shape
    assert k == k2
    is_int = a.dtype in (jnp.int8, jnp.uint8)
    acc = jnp.int32 if is_int else jnp.float32
    out_dtype = out_dtype or acc

    mp = _round_up(m, block_m)
    if mp != m:
        a = jnp.zeros((mp, k), a.dtype).at[:m].set(a)

    out = pl.pallas_call(
        functools.partial(_mm_kernel, acc_dtype=acc),
        grid=(mp // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        interpret=interpret,
    )(a, b)
    return out[:m]
