"""Quality metrics: NMSE, MSE, EVM, BER.

Definitions match ``BER_test_maMIMO_LTF.m:574-691``.
"""

from __future__ import annotations

import jax.numpy as jnp


def nmse_subk(ref, pred):
    """Per-(tx,rx) subchannel NMSE averaged over antenna pairs
    (``NMSE_subk``, BER_test_maMIMO_LTF.m:675-686).

    Args:
      ref, pred: (..., num_carriers, num_tx, num_rx) complex.

    Returns:
      (...,) scalar NMSE (linear, not dB).
    """
    diff = ref - pred
    num = jnp.sum(jnp.abs(diff) ** 2, axis=-3)
    den = jnp.sum(jnp.abs(ref) ** 2, axis=-3)
    return jnp.mean(num / den, axis=(-2, -1))


def mse_abs(ref, pred):
    """``MSE`` helper (BER_test_maMIMO_LTF.m:688-691): mean |diff|."""
    return jnp.mean(jnp.abs(ref - pred), axis=(-3, -2, -1))


def evm_rms(rx_syms, constellation):
    """RMS EVM in percent, reference estimated by nearest constellation
    point, normalized by average constellation power
    (comm.EVM config at BER_test_maMIMO_LTF.m:574-578).

    Args:
      rx_syms: (..., n) complex received symbols.
      constellation: (m,) complex reference constellation.

    Returns:
      (...,) EVM in %.
    """
    rx = jnp.asarray(rx_syms)
    c = jnp.asarray(constellation)
    d2 = jnp.abs(rx[..., None] - c) ** 2          # (..., n, m)
    err2 = jnp.min(d2, axis=-1)
    avg_pow = jnp.mean(jnp.abs(c) ** 2)
    return 100.0 * jnp.sqrt(jnp.mean(err2, axis=-1) / avg_pow)


def bit_error_rate(tx_bits, rx_bits):
    """BER (comm.ErrorRate equivalent)."""
    tx = jnp.asarray(tx_bits)
    rx = jnp.asarray(rx_bits)
    return jnp.mean((tx != rx).astype(jnp.float32), axis=-1)
