"""Factored all-pairs inference equals the materialized repeat/concat
path exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from mamimo_tpu.config import SimConfig, TrainConfig
from mamimo_tpu.models.mlp import (
    init_stacked,
    predict_all_pairs,
    preprocess_input,
    stacked_apply,
)
from mamimo_tpu.ops.ltf import pilot_p_matrix


def test_predict_all_pairs_matches_materialized():
    cfg = SimConfig(num_tx=8, num_rx=2)
    tcfg = TrainConfig(hidden=(64, 32))
    key = jax.random.PRNGKey(0)
    params, bn = init_stacked(key, cfg, tcfg)
    # perturb BN stats so folding is non-trivial
    bn = jax.tree.map(lambda l: l * 1.3 + 0.1, bn)
    z = jax.random.normal(key, (3, cfg.len_ltf, cfg.num_rx, 2))
    rx = (z[..., 0] + 1j * z[..., 1]).astype(jnp.complex64)

    out = predict_all_pairs(cfg, tcfg, params, bn, rx)
    assert out.shape == (3, cfg.num_carriers, cfg.num_tx, cfg.num_rx)

    # materialized reference
    P = pilot_p_matrix(cfg.num_tx)
    b = 3
    sig = jnp.transpose(rx, (0, 2, 1))
    sig = jnp.repeat(sig[:, :, None, :], cfg.num_tx, axis=2)
    sig = sig.reshape(-1, cfg.len_ltf)
    pil = jnp.tile(P.T, (b * cfg.num_rx, 1))
    xr = preprocess_input(cfg, tcfg, jnp.real(sig), pil)
    xi = preprocess_input(cfg, tcfg, jnp.imag(sig), pil)
    y2, _ = stacked_apply(tcfg, params, bn, jnp.stack([xr, xi]),
                          train=False)
    ref = (y2[0] + 1j * y2[1]).reshape(b, cfg.num_rx, cfg.num_tx,
                                       cfg.num_carriers)
    ref = jnp.transpose(ref, (0, 3, 2, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5)


def test_predict_all_pairs_bf16_close_to_f32():
    """The bfloat16 inference path tracks float32 within bf16 rounding
    (relative error bounded on the output's scale)."""
    cfg = SimConfig(num_tx=8, num_rx=2)
    tcfg = TrainConfig(hidden=(64, 32))
    key = jax.random.PRNGKey(1)
    params, bn = init_stacked(key, cfg, tcfg)
    bn = jax.tree.map(lambda l: l * 1.3 + 0.1, bn)
    z = jax.random.normal(key, (3, cfg.len_ltf, cfg.num_rx, 2))
    rx = (z[..., 0] + 1j * z[..., 1]).astype(jnp.complex64)

    f32 = np.asarray(predict_all_pairs(cfg, tcfg, params, bn, rx))
    b16 = np.asarray(predict_all_pairs(cfg, tcfg, params, bn, rx,
                                       dtype=jnp.bfloat16))
    assert b16.dtype == np.complex64
    rel = (np.linalg.norm(b16 - f32) / np.linalg.norm(f32))
    assert rel < 5e-2, rel
