"""Fused 3-layer MLP inference kernel (Pallas, TPU).

The CSI denoiser's inference path is the FLOPs-dominant op of the
framework (~11.7 MFLOP per channel estimate, two planes). This kernel
fuses the whole network — (x@W1+b1).relu() @ W2 ... @ W3 + b3 — into one
`pallas_call`:

* W1 (in_dim×H, ~21 MB bf16) is streamed through VMEM in K-blocks via
  the BlockSpec pipeline (double-buffered DMA handled by Mosaic), with
  an f32 accumulator in scratch;
* W2/W3/biases are VMEM-resident for the whole grid;
* batch-norm is folded into the dense weights beforehand
  (inference-mode BN is an affine transform), so the kernel sees plain
  matmul+bias+relu chains;
* matmuls run in bf16 on the MXU with f32 accumulation
  (`preferred_element_type`).

Equivalent to `csi_mlp_apply(..., train=False)` for the (1024, 1024)
paper architecture; validated against it in tests (interpret mode on
CPU, compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mamimo_tpu.config import TrainConfig
from mamimo_tpu.ops.pallas.util import _round_up


def fold_bn_into_dense(tcfg: TrainConfig, params, bn_state):
    """Fold inference-mode BatchNorm into the preceding dense layer.

    y = ((x@W + b).relu() − μ)·γ/√(σ²+ε) + β cannot fold through the
    relu, so BN is folded into the *following* layer's input instead:
    we return per-layer (post-relu) affine (scale, shift) pairs applied
    before the next matmul — algebraically exact for the
    Dense→ReLU→BN→[Dropout]→Dense chain of the reference model.

    Returns (w_list, b_list, scale_list, shift_list) where scale/shift
    apply to the *output* of layer i's relu (identity when BN disabled).
    """
    ws = [l["w"] for l in params["dense"]] + [params["out"]["w"]]
    bs = [l["b"] for l in params["dense"]] + [params["out"]["b"]]
    scales, shifts = [], []
    for i in range(len(params["dense"])):
        if params["bn"]:
            inv = 1.0 / jnp.sqrt(bn_state["var"][i] + tcfg.bn_eps)
            g = params["bn"][i]["scale"] * inv
            scales.append(g)
            shifts.append(params["bn"][i]["bias"]
                          - bn_state["mean"][i] * g)
        else:
            h = ws[i].shape[1]
            scales.append(jnp.ones((h,), jnp.float32))
            shifts.append(jnp.zeros((h,), jnp.float32))
    return ws, bs, scales, shifts


def _kernel(x_ref, w1_ref, b1_ref, s1_ref, t1_ref,
            w2_ref, b2_ref, s2_ref, t2_ref,
            w3_ref, b3_ref, o_ref, acc_ref, *, nk: int, dot_dtype):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        x_ref[:].astype(dot_dtype), w1_ref[:].astype(dot_dtype),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _():
        h1 = jnp.maximum(acc_ref[:] + b1_ref[:], 0.0)
        h1 = h1 * s1_ref[:] + t1_ref[:]
        h2 = jnp.dot(h1.astype(dot_dtype), w2_ref[:].astype(dot_dtype),
                     preferred_element_type=jnp.float32) + b2_ref[:]
        h2 = jnp.maximum(h2, 0.0) * s2_ref[:] + t2_ref[:]
        o_ref[:] = jnp.dot(
            h2.astype(dot_dtype), w3_ref[:].astype(dot_dtype),
            preferred_element_type=jnp.float32,
        ) + b3_ref[:]


def mlp_infer_pallas(
    tcfg: TrainConfig,
    params,
    bn_state,
    x,
    *,
    block_b: int = 256,
    block_k: int = 1152,
    dot_dtype=jnp.bfloat16,
    interpret: bool | None = None,
):
    """Run fused inference on a preprocessed batch.

    Args:
      params/bn_state: ONE plane's pytrees (no stacked axis); currently
        supports the 2-hidden-layer architecture (the paper's 1024/1024).
      x: (B, in_dim) float32.

    Returns (B, out_dim) float32.
    """
    assert len(params["dense"]) == 2, "fused kernel supports 2 hidden layers"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    ws, bs, scales, shifts = fold_bn_into_dense(tcfg, params, bn_state)
    w1, w2, w3 = ws
    b1, b2, b3 = bs
    s1, s2 = scales
    t1, t2 = shifts

    b_in, k_in = x.shape
    h1 = w1.shape[1]
    h2 = w2.shape[1]
    out = w3.shape[1]

    # pad every dim to hardware-friendly multiples
    bp = _round_up(b_in, block_b)
    kp = _round_up(k_in, block_k)
    op = _round_up(out, 128)
    nk = kp // block_k
    nb = bp // block_b

    xp = jnp.zeros((bp, kp), jnp.float32).at[:b_in, :k_in].set(x)
    w1p = jnp.zeros((kp, h1), jnp.float32).at[:k_in].set(w1)
    w3p = jnp.zeros((h2, op), jnp.float32).at[:, :out].set(w3)
    b3p = jnp.zeros((op,), jnp.float32).at[:out].set(b3)

    row = lambda v: v.reshape(1, -1)  # noqa: E731

    grid = (nb, nk)
    outp = pl.pallas_call(
        functools.partial(_kernel, nk=nk, dot_dtype=dot_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, block_k), lambda i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, h1), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h1), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h1), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h1), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h1, h2), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h2), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h2), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h2), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h2, op), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, op), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, op), lambda i, k: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, op), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_b, h1), jnp.float32)],
        interpret=interpret,
    )(xp, w1p, row(b1), row(s1), row(t1),
      w2, row(b2), row(s2), row(t2),
      w3p, row(b3p))
    return outp[:b_in, :out]


def predict_complex_pallas(cfg, tcfg, params, bn_state, sig, pilot,
                           **kw):
    """Complex CSI prediction via the fused kernel (both planes).

    Drop-in fast path for models.mlp.predict_complex.
    """
    from mamimo_tpu.models.mlp import preprocess_input

    xr = preprocess_input(cfg, tcfg, jnp.real(sig), pilot)
    xi = preprocess_input(cfg, tcfg, jnp.imag(sig), pilot)
    pr = jax.tree.map(lambda l: l[0], {"p": params, "b": bn_state})
    pi = jax.tree.map(lambda l: l[1], {"p": params, "b": bn_state})
    yr = mlp_infer_pallas(tcfg, pr["p"], pr["b"], xr, **kw)
    yi = mlp_infer_pallas(tcfg, pi["p"], pi["b"], xi, **kw)
    return (yr + 1j * yi).astype(jnp.complex64)
