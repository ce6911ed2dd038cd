"""Matmul-form LS estimator equals the FFT-form estimator."""

import jax.numpy as jnp
import numpy as np

from mamimo_tpu.ops.estimate import (
    ls_estimate_matmul,
    ls_estimate_rxmajor,
    ls_matmul_constants,
    ls_matmul_constants_rxmajor,
)
from mamimo_tpu.pipeline.dataset import generate_dataset
from mamimo_tpu.pipeline.sounding import estimate_from_rx


def test_ls_matmul_matches_fft(small_cfg):
    cfg = small_cfg
    ds = generate_dataset(cfg, seed=11, num_packets=3, snr_db=0.0,
                          chunk=3, fft_size=8192)
    rx = jnp.asarray(ds.rx)
    ref, _ = estimate_from_rx(cfg, rx)
    out = ls_estimate_matmul(cfg, rx)
    err = (np.linalg.norm(np.asarray(out) - np.asarray(ref))
           / np.linalg.norm(np.asarray(ref)))
    assert err < 2e-5, err
    # with precomputed constants too
    out2 = ls_estimate_matmul(cfg, rx, ls_matmul_constants(cfg))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_ls_rxmajor_matches(small_cfg):
    """rx-major layout (CP folded into the padded DFT matrix) computes
    the same estimate, antenna-major: out[b,r,j,c] == ref[b,c,j,r]."""
    cfg = small_cfg
    ds = generate_dataset(cfg, seed=12, num_packets=3, snr_db=0.0,
                          chunk=3, fft_size=8192)
    rx = jnp.asarray(ds.rx)                        # (B, L, R)
    ref = ls_estimate_matmul(cfg, rx)              # (B, C, Nt, R)
    out = ls_estimate_rxmajor(cfg, jnp.transpose(rx, (0, 2, 1)),
                              ls_matmul_constants_rxmajor(cfg))
    out_t = np.transpose(np.asarray(out), (0, 3, 2, 1))
    err = (np.linalg.norm(out_t - np.asarray(ref))
           / np.linalg.norm(np.asarray(ref)))
    assert err < 2e-5, err


def test_predict_all_pairs_rxmajor_matches(small_cfg):
    import jax

    from mamimo_tpu.config import TrainConfig
    from mamimo_tpu.models.mlp import (
        init_stacked,
        predict_all_pairs,
        predict_all_pairs_rxmajor,
    )

    cfg = small_cfg
    tcfg = TrainConfig(hidden=(32, 32))
    params, bn = init_stacked(jax.random.PRNGKey(3), cfg, tcfg)
    key = jax.random.PRNGKey(4)
    z = jax.random.normal(key, (2, cfg.len_ltf, cfg.num_rx, 2))
    rx = jnp.asarray(z[..., 0] + 1j * z[..., 1], jnp.complex64)
    ref = predict_all_pairs(cfg, tcfg, params, bn, rx)   # (B, C, Nt, R)
    out = predict_all_pairs_rxmajor(cfg, tcfg, params, bn,
                                    jnp.transpose(rx, (0, 2, 1)))
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 2, 1)), np.asarray(ref),
        rtol=0, atol=1e-5)
