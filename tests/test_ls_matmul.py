"""Matmul-form LS estimator equals the FFT-form estimator."""

import jax.numpy as jnp
import numpy as np

from mamimo_tpu.ops.estimate import ls_estimate_matmul, ls_matmul_constants
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
