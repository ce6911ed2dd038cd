"""The CSI denoiser MLP — the heart of the reference (its FC model,
``massiveMIMO_CSI_prediction_DNN.py:195-234``):

    [time-domain LTF at one Rx antenna  ⧺  pilot column P[:, iTx]]
        → Dense(h₀, relu) → BN → Dropout
        → Dense(h₁, relu) → BN
        → Dense(num_carriers, linear)

Two independent real-valued networks (one for the real plane, one for
the imaginary plane, ``:167-173``) are trained *simultaneously* here as
one stacked model with a leading dim-axis of size 2 (vmap), instead of
two sequential Keras fits.

Implemented as plain-JAX pytrees (init/apply), so parameters can be
sharded with `jax.sharding` and fed to Pallas inference kernels without
framework indirection. Keras-compatible details: glorot-uniform init,
BatchNormalization with momentum 0.99 / eps 1e-3 *after* the ReLU,
inverted dropout, GaussianNoise applied only in training.

Input options mirrored from the reference CLI: ``--inFraction`` (keep
the first 1/f of the LTF), ``--decimate_max/avg`` (pool-2 decimation,
``:198-203``).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from mamimo_tpu.config import SimConfig, TrainConfig

Params = Dict[str, Any]


def model_input_spec(cfg: SimConfig, tcfg: TrainConfig) -> Tuple[int, int]:
    """(signal_len, total_in_dim) after fraction/decimation options."""
    sig_len = cfg.len_ltf // int(tcfg.in_fraction)
    if tcfg.decimate in ("max", "avg"):
        sig_len //= 2
    return sig_len, sig_len + cfg.num_tx


def _glorot(key, fan_in, fan_out):
    lim = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(
        key, (fan_in, fan_out), jnp.float32, -lim, lim
    )


def init_csi_mlp(key, cfg: SimConfig, tcfg: TrainConfig) -> Tuple[Params, Params]:
    """Initialize one plane's parameters.

    Returns (params, bn_state) pytrees:
      params: {'dense': [(w,b)...], 'out': (w,b), 'bn': [(scale,bias)...]}
      bn_state: {'mean': [...], 'var': [...]} running statistics.
    """
    _, in_dim = model_input_spec(cfg, tcfg)
    dims = (in_dim,) + tuple(tcfg.hidden)
    keys = jax.random.split(key, len(tcfg.hidden) + 1)
    dense = []
    bn = []
    bn_mean = []
    bn_var = []
    for i, h in enumerate(tcfg.hidden):
        dense.append(
            {"w": _glorot(keys[i], dims[i], h), "b": jnp.zeros((h,))}
        )
        if tcfg.use_bn:
            bn.append({"scale": jnp.ones((h,)), "bias": jnp.zeros((h,))})
            bn_mean.append(jnp.zeros((h,)))
            bn_var.append(jnp.ones((h,)))
    out = {
        "w": _glorot(keys[-1], dims[-1], cfg.num_carriers),
        "b": jnp.zeros((cfg.num_carriers,)),
    }
    params = {"dense": dense, "out": out, "bn": bn}
    bn_state = {"mean": bn_mean, "var": bn_var}
    return params, bn_state


def preprocess_input(cfg: SimConfig, tcfg: TrainConfig, sig, pilot):
    """Apply fraction/decimation and concat the pilot column.

    sig: (..., len_sig) real plane of the received LTF;
    pilot: (..., num_tx).
    """
    sig = sig[..., : cfg.len_ltf // int(tcfg.in_fraction)]
    if tcfg.decimate == "max":
        s = sig.reshape(sig.shape[:-1] + (-1, 2))
        sig = jnp.max(s, axis=-1)
    elif tcfg.decimate == "avg":
        s = sig.reshape(sig.shape[:-1] + (-1, 2))
        sig = jnp.mean(s, axis=-1)
    return jnp.concatenate([sig, pilot], axis=-1)


def csi_mlp_apply(
    tcfg: TrainConfig,
    params: Params,
    bn_state: Params,
    x,
    *,
    train: bool = False,
    rng=None,
):
    """Forward pass on a preprocessed input batch x (batch, in_dim).

    Returns (y, new_bn_state). In train mode, BN uses batch statistics
    and updates the running stats; dropout is active (between hidden
    layers only — the last hidden layer has BN but no dropout,
    massiveMIMO_CSI_prediction_DNN.py:222-226).
    """
    new_mean, new_var = [], []
    h = x
    n_hidden = len(params["dense"])
    # 'bf16': explicit bf16 operand storage per dense matmul (halved HBM
    # activation/weight traffic; f32 accumulation via
    # preferred_element_type). Params/BN/loss stay float32.
    mm_dt = jnp.bfloat16 if tcfg.matmul_dtype == "bf16" else None

    def mm(a, w):
        if mm_dt is None:
            return a @ w
        return jnp.matmul(a.astype(mm_dt), w.astype(mm_dt),
                          preferred_element_type=jnp.float32)

    for i, lyr in enumerate(params["dense"]):
        h = mm(h, lyr["w"]) + lyr["b"]
        h = jax.nn.relu(h)
        if params["bn"]:
            if train:
                mu = jnp.mean(h, axis=0)
                var = jnp.var(h, axis=0)
                m = tcfg.bn_momentum
                new_mean.append(m * bn_state["mean"][i] + (1 - m) * mu)
                new_var.append(m * bn_state["var"][i] + (1 - m) * var)
            else:
                mu = bn_state["mean"][i]
                var = bn_state["var"][i]
            h = (h - mu) * jax.lax.rsqrt(var + tcfg.bn_eps)
            h = h * params["bn"][i]["scale"] + params["bn"][i]["bias"]
        if train and tcfg.dropout > 0.0 and i < n_hidden - 1:
            rng, sub = jax.random.split(rng)
            keep = 1.0 - tcfg.dropout
            mask = jax.random.bernoulli(sub, keep, h.shape)
            h = jnp.where(mask, h / keep, 0.0)
    y = mm(h, params["out"]["w"]) + params["out"]["b"]
    if train and params["bn"]:
        bn_state = {"mean": new_mean, "var": new_var}
    return y, bn_state


# ----------------------------------------------------------------------
# Stacked real+imag model (leading axis 2)
# ----------------------------------------------------------------------

def init_stacked(key, cfg: SimConfig, tcfg: TrainConfig):
    """Init both planes: every leaf gains a leading axis of size 2
    ([0]=real, [1]=imag)."""
    keys = jax.random.split(key, 2)
    p0, s0 = init_csi_mlp(keys[0], cfg, tcfg)
    p1, s1 = init_csi_mlp(keys[1], cfg, tcfg)
    params = jax.tree.map(lambda a, b: jnp.stack([a, b]), p0, p1)
    bn = jax.tree.map(lambda a, b: jnp.stack([a, b]), s0, s1)
    return params, bn


def stacked_apply(tcfg, params, bn_state, x2, *, train=False, rng=None):
    """Apply both planes: x2 (2, batch, in_dim) → (2, batch, C)."""
    if rng is not None:
        rngs = jax.random.split(rng, 2)
    else:
        rngs = jnp.zeros((2, 2), jnp.uint32)

    def one(p, s, x, r):
        return csi_mlp_apply(tcfg, p, s, x, train=train,
                             rng=r if train else None)

    return jax.vmap(one)(params, bn_state, x2, rngs)


def factored_heads_apply(tcfg: TrainConfig, pp, bb, sig_proj, pil_rows,
                         sig_len: int, dtype=None):
    """Everything after the shared layer-1 signal matmul of the factored
    eval-mode MLP: per-head pilot projection + bias, relu, folded BN
    affine, remaining dense layers, output head. Split out so sharded
    paths can compute ``sig_proj`` as a psum of per-device partial
    contractions (sequence-parallel layer 1) and finish locally.

    Args:
      sig_proj: (S, H) precomputed ``signal @ W1[:sig_len]``.
      pil_rows: (n_heads, num_tx) pilot rows.
      sig_len: the signal length L that splits W1 into signal/pilot rows.

    Returns:
      (S, n_heads, num_carriers) float32.
    """
    cast = (lambda t: t.astype(dtype)) if dtype is not None else (lambda t: t)

    def bn_affine(i):
        # eval-mode BN is affine; fold to (a, c) in float32, then cast
        inv = jax.lax.rsqrt(bb["var"][i] + tcfg.bn_eps)
        a = inv * pp["bn"][i]["scale"]
        c = pp["bn"][i]["bias"] - bb["mean"][i] * a
        return cast(a), cast(c)

    w1 = cast(pp["dense"][0]["w"])
    pil_proj = cast(pil_rows) @ w1[sig_len:]     # (n_heads, H)
    h = cast(sig_proj)[:, None, :] + pil_proj[None, :, :] \
        + cast(pp["dense"][0]["b"])
    h = jax.nn.relu(h)
    if pp["bn"]:
        a, c = bn_affine(0)
        h = h * a + c
    for i in range(1, len(pp["dense"])):
        h = jax.nn.relu(h @ cast(pp["dense"][i]["w"])
                        + cast(pp["dense"][i]["b"]))
        if pp["bn"]:
            a, c = bn_affine(i)
            h = h * a + c
    y = h @ cast(pp["out"]["w"]) + cast(pp["out"]["b"])
    return y.astype(jnp.float32)


def factored_plane_apply(tcfg: TrainConfig, pp, bb, x, pil_rows,
                         dtype=None):
    """One plane's factored eval-mode MLP: the (len, H) signal matmul is
    shared across the pilot heads (exact algebraic restructuring of the
    concatenated-input forward pass — see predict_all_pairs).

    Args:
      pp / bb: one plane's params / BN state.
      x: (S, L) real signal plane.
      pil_rows: (n_heads, num_tx) pilot rows (P[:, t] per head; the
        Sylvester Hadamard P is symmetric so rows == columns).
      dtype: optional matmul compute dtype (e.g. bfloat16); eval-mode BN
        folds to a float32-computed affine either way.

    Returns:
      (S, n_heads, num_carriers) float32.
    """
    cast = (lambda t: t.astype(dtype)) if dtype is not None else (lambda t: t)
    L = x.shape[-1]
    w1 = cast(pp["dense"][0]["w"])
    sig_proj = cast(x) @ w1[:L]                  # (S, H) — the big matmul
    return factored_heads_apply(tcfg, pp, bb, sig_proj, pil_rows, L,
                                dtype=dtype)


def _factored_all_pairs(cfg: SimConfig, tcfg: TrainConfig, params,
                        bn_state, planes, dtype=None):
    """Shared factored all-pairs body: real planes in, per-plane head
    outputs out. Single source of truth for every input layout wrapper
    (time-major / rx-major / canonical planes).

    Args:
      planes: (2, S, len_ltf) float32, S = batch·num_rx rx-major.

    Returns:
      (2, S, num_tx, num_carriers) float32.
    """
    from mamimo_tpu.ops.ltf import pilot_p_matrix

    assert tcfg.in_fraction == 1 and tcfg.decimate == "none", (
        "factored inference requires the default input pipeline"
    )
    P = pilot_p_matrix(cfg.num_tx)                   # (ntx, ntx)
    return jax.vmap(
        lambda pp, bb, x: factored_plane_apply(tcfg, pp, bb, x, P.T,
                                               dtype=dtype)
    )(params, bn_state, planes)                      # (2, S, ntx, C)


def predict_all_pairs_planes_flat(cfg: SimConfig, tcfg: TrainConfig,
                                  params, bn_state, planes, dtype=None):
    """Factored all-pairs inference from FLAT canonical planes — the
    TPU-native storage layout (2, S, len_ltf) with S = B·num_rx: the
    sample axis stays a multiple of 8 (sublane-aligned), unlike a
    (2, B, num_rx=4, L) form whose size-4 sublane dim pads to 8 and
    DOUBLES the HBM footprint/traffic of every touch (measured: a bare
    read+write of the 4-D form ran 3× slower than the flat form at
    batch 1024, scripts/probe_r2b.py).

    Returns:
      (S, num_tx, num_carriers) complex64.
    """
    y2 = _factored_all_pairs(cfg, tcfg, params, bn_state, planes,
                             dtype=dtype)
    return jax.lax.complex(y2[0], y2[1])


def predict_all_pairs_planes(cfg: SimConfig, tcfg: TrainConfig, params,
                             bn_state, rx_planes, dtype=None):
    """Factored all-pairs inference from canonical rx-major planes.

    Args:
      rx_planes: (2, B, num_rx, len_ltf) float32.

    Returns:
      (B, num_rx, num_tx, num_carriers) complex64 (rx-major layout).
    """
    _, b, nrx, L = rx_planes.shape
    y = predict_all_pairs_planes_flat(
        cfg, tcfg, params, bn_state, rx_planes.reshape(2, b * nrx, L),
        dtype=dtype)
    return y.reshape(b, nrx, cfg.num_tx, cfg.num_carriers)


def predict_all_pairs(cfg: SimConfig, tcfg: TrainConfig, params, bn_state,
                      rx, dtype=None):
    """Batch inference over ALL (tx, rx) pairs of received preambles —
    the test/deployment case (batch = nTX·nRX,
    massiveMIMO_CSI_prediction_DNN.py:337-339) — with the first layer
    factored:

        h1[s, t] = relu(sig[s] @ W1_sig + P[:,t] @ W1_pil + b1)

    The received signal is shared by all num_tx pilot columns, so the
    dominant (len_ltf × H) matmul runs once per (packet, rx-antenna)
    instead of num_tx times — an exact ~num_tx-fold FLOP reduction of
    layer 1 vs materializing the concatenated inputs. (Also avoids the
    repeat/concat expansion entirely.)

    Requires default input options (no fraction/decimation) and eval
    mode.

    Args:
      rx: (B, len_ltf, num_rx) complex64.
      dtype: optional compute dtype for the MLP matmuls (e.g.
        jnp.bfloat16 — halves the HBM activation/weight traffic on the
        MXU inference path; BN folds into a per-layer affine computed in
        float32). Output is always complex64.

    Returns:
      (B, num_carriers, num_tx, num_rx) complex64 DNN CSI.
    """
    b, L, nrx = rx.shape
    sig2 = jnp.transpose(rx, (0, 2, 1)).reshape(b * nrx, L)
    planes = jnp.stack([jnp.real(sig2), jnp.imag(sig2)])   # (2, S, L)
    y2 = _factored_all_pairs(cfg, tcfg, params, bn_state, planes,
                             dtype=dtype)
    y = (y2[0] + 1j * y2[1]).astype(jnp.complex64)
    y = y.reshape(b, nrx, cfg.num_tx, cfg.num_carriers)
    return jnp.transpose(y, (0, 3, 2, 1))


def predict_all_pairs_rxmajor(cfg: SimConfig, tcfg: TrainConfig, params,
                              bn_state, rx, dtype=None):
    """predict_all_pairs in the TPU-native rx-major layout: rx arrives
    antenna-major (B, num_rx, len_ltf) — the (B·num_rx, len_ltf) signal
    matrix for the factored layer-1 matmul is then a free reshape (no
    transpose of the hundreds-of-MB preamble batch), and the output
    stays antenna-major (no output transpose).

    Args:
      rx: (B, num_rx, len_ltf) complex64.

    Returns:
      (B, num_rx, num_tx, num_carriers) complex64 DNN CSI;
      transpose(0, 3, 2, 1) recovers the predict_all_pairs convention.
    """
    b, nrx, L = rx.shape
    sig2 = rx.reshape(b * nrx, L)                # free: contiguous
    planes = jnp.stack([jnp.real(sig2), jnp.imag(sig2)])   # (2, S, L)
    y2 = _factored_all_pairs(cfg, tcfg, params, bn_state, planes,
                             dtype=dtype)
    y = (y2[0] + 1j * y2[1]).astype(jnp.complex64)
    return y.reshape(b, nrx, cfg.num_tx, cfg.num_carriers)


def predict_complex(cfg, tcfg, params, bn_state, sig, pilot):
    """Deployment-style complex prediction (inference.py:24-32): run the
    real plane through model[0] and the imaginary plane through model[1],
    recombine into a complex estimate.

    sig: (batch, len_ltf) complex64; pilot: (batch, num_tx) float.
    Returns (batch, num_carriers) complex64.
    """
    xr = preprocess_input(cfg, tcfg, jnp.real(sig), pilot)
    xi = preprocess_input(cfg, tcfg, jnp.imag(sig), pilot)
    x2 = jnp.stack([xr, xi])
    y2, _ = stacked_apply(tcfg, params, bn_state, x2, train=False)
    return (y2[0] + 1j * y2[1]).astype(jnp.complex64)
