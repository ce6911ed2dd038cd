"""bf16 corpus-drain option (VERDICT r4 #9): quantization bound and
the noiseless-label refusal."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamimo_tpu.config import SimConfig
from mamimo_tpu.pipeline.dataset import generate_dataset
from mamimo_tpu.utils.numerics import get_complex, put_complex

TINY = SimConfig(num_tx=4, num_rx=2, n_scatterers=10)


def test_bf16_fetch_quantization_bound():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((64, 128))
         + 1j * rng.standard_normal((64, 128))).astype(np.complex64)
    dev = put_complex(x)
    exact = get_complex(dev)
    quant = get_complex(dev, fetch_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(exact, x)
    err = np.mean(np.abs(quant - x) ** 2) / np.mean(np.abs(x) ** 2)
    # bf16 has ~8 mantissa bits: relative error ~2^-9 per plane
    # -> NMSE around -50 dB, far below any operating noise floor
    assert 10 * np.log10(err) < -45.0, 10 * np.log10(err)
    assert quant.dtype == np.complex64


def test_bf16_fetch_generation_end_to_end():
    ds32 = generate_dataset(TINY, seed=4, num_packets=4, snr_db=0.0,
                            chunk=4, fft_size=4096)
    dsb = generate_dataset(TINY, seed=4, num_packets=4, snr_db=0.0,
                          chunk=4, fft_size=4096, fetch_dtype="bf16")
    # non-complex leaves (SNRs, delays) transfer exact
    np.testing.assert_array_equal(dsb.snr_cs, ds32.snr_cs)
    np.testing.assert_array_equal(dsb.tau, ds32.tau)
    # complex corpus within the bf16 bound
    err = (np.mean(np.abs(dsb.rx - ds32.rx) ** 2)
           / np.mean(np.abs(ds32.rx) ** 2))
    assert 10 * np.log10(err + 1e-300) < -45.0


def test_bf16_fetch_refused_for_noiseless_labels():
    with pytest.raises(AssertionError, match="noiseless"):
        generate_dataset(TINY, seed=4, num_packets=2, snr_db=120.0,
                         chunk=2, fft_size=4096, fetch_dtype="bf16")
