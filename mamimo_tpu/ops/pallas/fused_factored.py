"""Fused FACTORED all-pairs CSI inference kernel (Pallas, TPU).

This is the production DNN hot path. The factored all-pairs inference
(models/mlp.py::factored_plane_apply — an exact algebraic restructuring
of the reference's concatenated-input forward pass,
``massiveMIMO_CSI_prediction_DNN.py:195-234``) has three stages:

    sig_proj = x @ W1[:L]                  # (S, H)   — the big matmul
    h[s,t]   = relu(sig_proj[s] + headbias[t]) · a1 + c1
    y[s,t]   = (relu(h @ W2 + b2) · a2 + c2) @ W3 + b3

where ``headbias[t] = P[:,t] @ W1[L:] + b1`` folds the pilot column and
layer-1 bias into one per-head bias row (the num_tx pilot heads differ
ONLY by this bias), and (a_i, c_i) are the eval-mode BatchNorm affines.

Under XLA the (S, num_tx, H) intermediates h and h2 round-trip HBM
(~0.5 GB/plane at bench batch) because broadcasts can't fuse into dot
operands. This kernel keeps them entirely in VMEM:

* grid = (S-blocks, K-blocks); W1 streams through VMEM in K-blocks with
  an f32 accumulator (double-buffered DMA handled by Mosaic);
* on the last K-block the num_tx heads are expanded IN REGISTERS/VMEM:
  per head, bias-add + relu + BN-affine + the fused (block_s,H)@(H,H)
  and (block_s,H)@(H,op) matmuls — h/h2 never exist in HBM;
* W2/W3/biases/head-biases are VMEM-resident for the whole grid;
* matmuls run on the MXU in ``dot_dtype`` (default bf16) with f32
  accumulation; output is written in ``out_dtype`` (default bf16 —
  −48 dB quantization, far below the estimator noise floor).

Inputs are real PLANES in the framework's canonical rx-major layout
(see pipeline/dataset.py): the complex received preamble never needs a
transpose or a complex-extraction pass on the hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mamimo_tpu.config import SimConfig, TrainConfig
from mamimo_tpu.ops.pallas.util import _round_up


def prepare_factored_weights(cfg: SimConfig, tcfg: TrainConfig, params,
                             bn_state, dot_dtype=jnp.bfloat16):
    """Fold BN + pilot heads into a kernel-ready pytree (do this ONCE per
    set of weights, outside the per-batch hot loop — the W1 cast alone is
    an 84 MB pass at f32).

    Returns a dict of stacked (plane-leading) arrays:
      w1   (2, L, H)       dot_dtype — signal half of layer 1
      hb   (2, num_tx, H)  f32       — per-head bias  P[:,t]@W1[L:] + b1
      a1,c1,a2,c2 (2,1,H)  f32       — eval-mode BN affines (identity if
                                       BN is disabled)
      w2   (2, H, H)       dot_dtype
      b2   (2, 1, H)       f32
      w3   (2, H, OP)      dot_dtype — OP = round_up(num_carriers, 128)
      b3   (2, 1, OP)      f32
    """
    from mamimo_tpu.ops.ltf import pilot_p_matrix

    assert len(tcfg.hidden) == 2, "fused kernel supports 2 hidden layers"
    L = cfg.len_ltf
    C = cfg.num_carriers
    op = _round_up(C, 128)
    P = pilot_p_matrix(cfg.num_tx)                      # (ntx, ntx)

    w1_full = params["dense"][0]["w"]                   # (2, L+ntx, H)
    b1 = params["dense"][0]["b"]                        # (2, H)
    w2 = params["dense"][1]["w"]
    b2 = params["dense"][1]["b"]
    w3 = params["out"]["w"]                             # (2, H, C)
    b3 = params["out"]["b"]

    # per-head bias: pil_rows (ntx, ntx) = P.T; hb[d] = P.T @ w1p[d] + b1[d]
    hb = jnp.einsum("tj,djh->dth", P.T, w1_full[:, L:]) \
        + b1[:, None, :]

    def bn_affine(i, h_dim):
        if params["bn"]:
            inv = jax.lax.rsqrt(bn_state["var"][i] + tcfg.bn_eps)
            a = inv * params["bn"][i]["scale"]          # (2, H)
            c = params["bn"][i]["bias"] - bn_state["mean"][i] * a
        else:
            a = jnp.ones((2, h_dim), jnp.float32)
            c = jnp.zeros((2, h_dim), jnp.float32)
        return a[:, None, :], c[:, None, :]

    h1 = w2.shape[1]
    a1, c1 = bn_affine(0, w2.shape[-2])
    a2, c2 = bn_affine(1, h1)

    w3p = jnp.zeros((2, w3.shape[1], op), w3.dtype).at[:, :, :C].set(w3)
    b3p = jnp.zeros((2, op), b3.dtype).at[:, :C].set(b3)

    return {
        "w1": w1_full[:, :L].astype(dot_dtype),
        "hb": hb.astype(jnp.float32),
        "a1": a1, "c1": c1, "a2": a2, "c2": c2,
        "w2": w2.astype(dot_dtype),
        "b2": b2[:, None, :].astype(jnp.float32),
        "w3": w3p.astype(dot_dtype),
        "b3": b3p[:, None, :].astype(jnp.float32),
    }


def _kernel(x_ref, w1_ref, hb_ref, a1_ref, c1_ref, w2_ref, b2_ref,
            a2_ref, c2_ref, w3_ref, b3_ref, o_ref, acc_ref,
            *, nk: int, ntx: int, dot_dtype):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        x_ref[:].astype(dot_dtype), w1_ref[:],
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _():
        acc = acc_ref[:]
        a1 = a1_ref[:]                                  # (1, H)
        c1 = c1_ref[:]
        w2 = w2_ref[:]
        b2 = b2_ref[:]
        a2 = a2_ref[:]
        c2 = c2_ref[:]
        w3 = w3_ref[:]
        b3 = b3_ref[:]
        for t in range(ntx):
            h = jnp.maximum(acc + hb_ref[t:t + 1, :], 0.0) * a1 + c1
            h2 = jnp.dot(h.astype(dot_dtype), w2,
                         preferred_element_type=jnp.float32) + b2
            h2 = jnp.maximum(h2, 0.0) * a2 + c2
            y = jnp.dot(h2.astype(dot_dtype), w3,
                        preferred_element_type=jnp.float32) + b3
            # head-major output: o_ref[t] is a contiguous (block_s, op)
            # slab — a [:, t, :] write would scatter one sublane per
            # (8,128) tile across the whole block
            o_ref[t] = y.astype(o_ref.dtype)


def _one_plane(cfg, prep_d, x, *, block_s, block_k, dot_dtype, out_dtype,
               interpret):
    """x: (S, L) real plane. Returns (ntx, S, OP) out_dtype (head-major)."""
    s_in, L = x.shape
    ntx = cfg.num_tx
    H = prep_d["w2"].shape[0]
    op = prep_d["w3"].shape[1]

    sp = _round_up(s_in, block_s)
    kp = _round_up(L, block_k)
    if sp != s_in or kp != L:
        x = jnp.zeros((sp, kp), x.dtype).at[:s_in, :L].set(x)
    w1 = prep_d["w1"]
    if kp != L:
        w1 = jnp.zeros((kp, H), w1.dtype).at[:L].set(w1)
    nk = kp // block_k
    nb = sp // block_s

    kern = functools.partial(_kernel, nk=nk, ntx=ntx, dot_dtype=dot_dtype)
    const = lambda *_: (0, 0)                     # noqa: E731
    out = pl.pallas_call(
        kern,
        grid=(nb, nk),
        in_specs=[
            pl.BlockSpec((block_s, block_k), lambda i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, H), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ntx, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, op), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, op), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ntx, block_s, op), lambda i, k: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ntx, sp, op), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_s, H), jnp.float32)],
        interpret=interpret,
    )(x, w1, prep_d["hb"], prep_d["a1"], prep_d["c1"],
      prep_d["w2"], prep_d["b2"], prep_d["a2"], prep_d["c2"],
      prep_d["w3"], prep_d["b3"])
    return out[:, :s_in]


def fused_factored_planes(
    cfg: SimConfig,
    tcfg: TrainConfig,
    prepared,
    planes,
    *,
    block_s: int = 128,
    block_k: int = 1024,
    dot_dtype=jnp.bfloat16,
    out_dtype=jnp.bfloat16,
    interpret: bool | None = None,
):
    """Run the fused factored all-pairs inference on both planes.

    Args:
      prepared: pytree from prepare_factored_weights (same dot_dtype).
      planes: (2, S, len_ltf) float32 — [0]=real, [1]=imag rx planes,
        S = batch·num_rx in rx-major order.

    Returns:
      (2, num_tx, S, num_carriers) out_dtype — per-plane head outputs in
      the kernel's native HEAD-MAJOR layout (each head's (S, C) slab is
      written contiguously; a [:, t, :] scatter would touch one sublane
      per tile).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert tcfg.in_fraction == 1 and tcfg.decimate == "none", (
        "factored inference requires the default input pipeline"
    )
    outs = []
    for d in range(2):
        prep_d = jax.tree.map(lambda l, d=d: l[d], prepared)
        outs.append(_one_plane(
            cfg, prep_d, planes[d], block_s=block_s, block_k=block_k,
            dot_dtype=dot_dtype, out_dtype=out_dtype, interpret=interpret,
        ))
    y = jnp.stack(outs)                               # (2, ntx, S, OP)
    return y[..., :cfg.num_carriers]


def predict_all_pairs_planes_pallas(cfg, tcfg, prepared, rx_planes, **kw):
    """All-pairs DNN CSI from canonical rx-major planes via the fused
    kernel.

    Args:
      rx_planes: (2, B, num_rx, len_ltf) float32.

    Returns:
      (B, num_rx, num_tx, num_carriers) complex64 (rx-major layout;
      transpose(0, 3, 2, 1) recovers the time-major convention).
    """
    _, b, nrx, L = rx_planes.shape
    y = fused_factored_planes(
        cfg, tcfg, prepared, rx_planes.reshape(2, b * nrx, L), **kw
    )                                           # (2, ntx, S, C) head-major
    y = (y[0].astype(jnp.float32) + 1j * y[1].astype(jnp.float32))
    y = y.reshape(cfg.num_tx, b, nrx, cfg.num_carriers)
    return jnp.transpose(y, (1, 2, 0, 3)).astype(jnp.complex64)
