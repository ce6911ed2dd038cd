"""int8 quantized factored inference — the v5e MXU runs s8×s8→s32 at
2× the bf16 rate (~394 TOPS), so quantizing the three dense layers
nearly halves the DNN half of the estimation hot path.

Scheme (standard dynamic-activation / static-weight PTQ):

* weights: symmetric per-output-channel int8, folded offline by
  :func:`quantize_params_int8` (scales kept float32);
* activations: symmetric per-row dynamic int8 — the row absmax is a
  cheap VPU reduction that XLA fuses into the surrounding elementwise
  chain; raw-signal rows have SNR-dependent power so static scales
  would clip;
* accumulation: int32 on the MXU (``preferred_element_type``), dequant
  is one f32 multiply by (row_scale × col_scale);
* the eval-mode BN affine, biases, relu and the pilot-head expansion
  stay float32 exactly as in the bf16 path (models/mlp.py::
  factored_heads_apply) — only the three big matmuls change.

Accuracy: int8 dynamic quantization adds ~−40 dB relative error per
layer; the estimator's own noise floor is ≈−10 dB NMSE (the training
noise floor, results/RESULTS.md), so the end-to-end NMSE impact is
negligible (asserted < 0.05 dB in tests/test_quant.py).

Reference parity: this accelerates the same inference contract as
massiveMIMO_CSI_prediction_DNN.py:337-339 (all-pairs CSI prediction);
the reference has no quantized path — this is TPU-native headroom.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mamimo_tpu.config import SimConfig, TrainConfig


def _quant_weight(w):
    """Symmetric per-output-channel int8: w (K, N) -> (int8 (K, N),
    float32 (N,) scale)."""
    absmax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _quant_rows(x):
    """Symmetric per-row dynamic int8: x (..., K) -> (int8 x,
    float32 (...,) scale)."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _int8_matmul(xq, xs, wq, ws):
    """(xq (S, K) int8 · xs (S, 1) f32) @ (wq (K, N) int8 · ws (N,) f32)
    with int32 MXU accumulation."""
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * xs * ws[None, :]


def quantize_params_int8(tcfg: TrainConfig, params, bn_state,
                         sig_len: int | None = None):
    """Fold trained stacked params to the int8 inference pytree.

    Every dense/output kernel becomes (int8 weights, f32 per-column
    scales); biases and the folded eval-mode BN affine stay float32.
    Leaves keep the leading plane axis of 2 (models/mlp.py::
    init_stacked).

    sig_len (= cfg.len_ltf) splits layer 1 into signal rows [:sig_len]
    and pilot rows [sig_len:]: the trained pilot-row weights are much
    larger than the signal-row weights (pilot inputs are ±1 vs
    small-amplitude samples), so sharing per-column scales across both
    starves the signal rows of quantization levels — measured +0.15 dB
    NMSE on the trained BS32 checkpoint vs +0.02 dB with the split.
    The pilot block is (num_tx, H) — tiny — and stays float32.
    """

    def one_plane(pp, bb):
        out = {"dense": [], "bn_a": [], "bn_c": [], "b": [],
               "out_w": None, "out_s": None, "out_b": pp["out"]["b"],
               "w1_pil": None}
        for i, lyr in enumerate(pp["dense"]):
            w = lyr["w"]
            if i == 0 and sig_len is not None:
                out["w1_pil"] = w[sig_len:]
                w = w[:sig_len]
            q, s = _quant_weight(w)
            out["dense"].append({"wq": q, "ws": s})
            out["b"].append(lyr["b"])
            if pp["bn"]:
                inv = jax.lax.rsqrt(bb["var"][i] + tcfg.bn_eps)
                a = inv * pp["bn"][i]["scale"]
                out["bn_a"].append(a)
                out["bn_c"].append(pp["bn"][i]["bias"] - bb["mean"][i] * a)
        q, s = _quant_weight(pp["out"]["w"])
        out["out_w"], out["out_s"] = q, s
        if out["w1_pil"] is None:
            # keep the pytree static: empty pilot block when unsplit
            out["w1_pil"] = jnp.zeros((0, pp["dense"][0]["w"].shape[1]),
                                      jnp.float32)
        return out

    return jax.vmap(one_plane)(params, bn_state)


def factored_plane_apply_int8(cfg: SimConfig, qp, x, pil_rows):
    """One plane's factored eval-mode MLP with int8 matmuls (the exact
    int8 analogue of models/mlp.py::factored_plane_apply).

    Args:
      qp: one plane's quantized params (quantize_params_int8 leaf).
      x: (S, L) float32/bfloat16 signal plane.
      pil_rows: (n_heads, num_tx) pilot rows.

    Returns:
      (S, n_heads, num_carriers) float32.
    """
    L = x.shape[-1]
    s_count = x.shape[0]
    n_heads = pil_rows.shape[0]

    # layer 1, signal half: int8 dot over the 10240-sample axis
    xq, xs = _quant_rows(x.astype(jnp.float32))
    w1q, w1s = qp["dense"][0]["wq"], qp["dense"][0]["ws"]
    sig_proj = _int8_matmul(xq, xs, w1q[:L], w1s)          # (S, H) f32

    # layer 1, pilot half: tiny (n_heads × num_tx), float32 exact —
    # from the unquantized pilot block when quantize_params_int8 was
    # given sig_len (the accurate split), else dequantized int8 rows
    if qp["w1_pil"].shape[0] > 0:
        w1_pil = qp["w1_pil"].astype(jnp.float32)
    else:
        w1_pil = w1q[L:].astype(jnp.float32) * w1s[None, :]
    pil_proj = pil_rows.astype(jnp.float32) @ w1_pil       # (n_heads, H)

    h = sig_proj[:, None, :] + pil_proj[None, :, :] + qp["b"][0]
    h = jax.nn.relu(h)
    if len(qp["bn_a"]):
        h = h * qp["bn_a"][0] + qp["bn_c"][0]

    for i in range(1, len(qp["dense"])):
        hq, hs = _quant_rows(h.reshape(s_count * n_heads, -1))
        h = _int8_matmul(hq, hs, qp["dense"][i]["wq"], qp["dense"][i]["ws"])
        h = jax.nn.relu(h + qp["b"][i])
        if len(qp["bn_a"]):
            h = h * qp["bn_a"][i] + qp["bn_c"][i]
        h = h.reshape(s_count, n_heads, -1)

    hq, hs = _quant_rows(h.reshape(s_count * n_heads, -1))
    y = _int8_matmul(hq, hs, qp["out_w"], qp["out_s"]) + qp["out_b"]
    return y.reshape(s_count, n_heads, -1).astype(jnp.float32)


def predict_all_pairs_planes_flat_int8(cfg: SimConfig, tcfg: TrainConfig,
                                       qparams, planes):
    """int8 factored all-pairs inference from FLAT canonical planes
    (2, S, len_ltf) — drop-in for models/mlp.py::
    predict_all_pairs_planes_flat with qparams from
    quantize_params_int8.

    Returns:
      (S, num_tx, num_carriers) complex64.
    """
    from mamimo_tpu.ops.ltf import pilot_p_matrix

    assert tcfg.in_fraction == 1 and tcfg.decimate == "none", (
        "factored inference requires the default input pipeline"
    )
    P = pilot_p_matrix(cfg.num_tx)
    y2 = jax.vmap(
        lambda qp, x: factored_plane_apply_int8(cfg, qp, x, P.T)
    )(qparams, planes)                                # (2, S, ntx, C)
    return jax.lax.complex(y2[0], y2[1])


def predict_all_pairs_planes_int8(cfg: SimConfig, tcfg: TrainConfig,
                                  qparams, rx_planes):
    """int8 factored all-pairs inference from rx-major planes
    (2, B, num_rx, len_ltf) — the int8 twin of models/mlp.py::
    predict_all_pairs_planes.

    Returns:
      (B, num_rx, num_tx, num_carriers) complex64.
    """
    _, b, nrx, L = rx_planes.shape
    y = predict_all_pairs_planes_flat_int8(
        cfg, tcfg, qparams, rx_planes.reshape(2, b * nrx, L))
    return y.reshape(b, nrx, cfg.num_tx, cfg.num_carriers)
