"""int8 quantized inference: fidelity vs the float32 factored path.

The int8 path must be numerically indistinguishable at the estimator's
operating point: its own noise floor is ≈−10 dB NMSE (training noise
floor), and dynamic per-row int8 adds ≈−40 dB relative error per layer,
so end-to-end relative MSE must sit far below the signal."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamimo_tpu.config import SimConfig, TrainConfig
from mamimo_tpu.models.mlp import init_stacked, predict_all_pairs_planes_flat
from mamimo_tpu.models.quant import (
    predict_all_pairs_planes_flat_int8,
    quantize_params_int8,
)

CFG = SimConfig(num_tx=8, num_rx=2)
TCFG = TrainConfig(hidden=(128, 128))


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    params, bn = init_stacked(key, CFG, TCFG)
    # non-trivial BN statistics (fresh init is mean 0 / var 1)
    bn = jax.tree.map(
        lambda a: a + 0.1 * jax.random.normal(key, a.shape), bn)
    planes = jax.random.normal(
        jax.random.PRNGKey(1), (2, 16 * CFG.num_rx, CFG.len_ltf),
        jnp.float32)
    return params, bn, planes


def test_int8_matches_f32_factored(setup):
    params, bn, planes = setup
    ref = predict_all_pairs_planes_flat(CFG, TCFG, params, bn, planes)
    qparams = quantize_params_int8(TCFG, params, bn)
    got = predict_all_pairs_planes_flat_int8(CFG, TCFG, qparams, planes)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    err = np.asarray(jnp.abs(got - ref) ** 2).mean()
    sig = np.asarray(jnp.abs(ref) ** 2).mean()
    rel_db = 10 * np.log10(err / sig)
    # far below the −10 dB estimator floor (≈−40 dB typical)
    assert rel_db < -25.0, rel_db


def test_int8_weight_dtypes(setup):
    params, bn, _ = setup
    qp = quantize_params_int8(TCFG, params, bn)
    assert qp["dense"][0]["wq"].dtype == jnp.int8
    assert qp["dense"][0]["ws"].dtype == jnp.float32
    assert qp["out_w"].dtype == jnp.int8
    # plane axis preserved on every leaf
    assert qp["dense"][0]["wq"].shape[0] == 2


def test_int8_scale_invariance(setup):
    """Scaling the input scales the output ~linearly through the relu
    MLP front half — dynamic activation scales must track it (a static
    scheme would clip)."""
    params, bn, planes = setup
    qparams = quantize_params_int8(TCFG, params, bn)
    a = predict_all_pairs_planes_flat_int8(CFG, TCFG, qparams, planes)
    b = predict_all_pairs_planes_flat_int8(CFG, TCFG, qparams,
                                           100.0 * planes)
    ref_a = predict_all_pairs_planes_flat(CFG, TCFG, params, bn, planes)
    ref_b = predict_all_pairs_planes_flat(CFG, TCFG, params, bn,
                                          100.0 * planes)
    for got, ref in ((a, ref_a), (b, ref_b)):
        err = np.asarray(jnp.abs(got - ref) ** 2).mean()
        sig = np.asarray(jnp.abs(ref) ** 2).mean()
        assert 10 * np.log10(err / sig) < -25.0
