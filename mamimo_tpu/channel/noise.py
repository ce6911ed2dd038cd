"""Receiver front-end: gain + AWGN at a target SNR, power scaling, sync.

Replicates the ``useNoiseFig=false`` power accounting of
``generate_maMIMO_LTF.m:239-332``:

* per-antenna signal power  sig_dB = 10·log10(mean|x|²)
* noise power  noise_dB = mean_antennas(sig_dB − SNR_target + gain_dB)
* realized per-antenna SNR  snr_CS = sig_dB − noise_dB + gain_dB
  (varies slightly around the target because the noise is averaged)
* preamp output  y = 10^(gain/20)·x + n,  n ~ CN(0, 10^(noise_dB/10))
* used-subcarrier power scaling  y *= sqrt(used_sc)/fft
  (generate_maMIMO_LTF.m:303)
* sync: slice [chan_delay : chan_delay + (nsamp − num_pad_zeros)]
  (generate_maMIMO_LTF.m:326-327)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from mamimo_tpu.config import SimConfig


def sync_slice(cfg: SimConfig, y, chan_delay):
    """Remove channel delay + tail padding: output length nsamp − pad."""
    out_len = y.shape[0] - cfg.num_pad_zeros
    return jax.lax.dynamic_slice_in_dim(y, chan_delay, out_len, axis=0)


def receiver_chain(
    cfg: SimConfig,
    key,
    rx_sig,
    snr_db,
    gain_db,
    chan_delay,
    noise_power_db=None,
):
    """Apply preamp gain + AWGN, subcarrier power scaling and sync.

    Args:
      rx_sig: (nsamp, num_rx) complex channel output (with tail padding).
      snr_db: target sounding SNR (scalar, dB). Ignored when
        noise_power_db is given.
      gain_db: preamp gain (= spLoss, generate_maMIMO_LTF.m:236).
      chan_delay: () int32 sync offset in samples.
      noise_power_db: fixed noise power override — the "perfect CSI" path
        uses −100 dB (BER_test_maMIMO_LTF.m:268-271).

    Returns:
      (y_sync, snr_cs, noise_db):
        y_sync  (nsamp − pad, num_rx) complex
        snr_cs  (num_rx,) realized per-antenna SNR [dB]
        noise_db () applied noise power [dB]
    """
    rx_sig = jnp.asarray(rx_sig, jnp.complex64)
    sig_pwr = jnp.mean(jnp.abs(rx_sig) ** 2, axis=0)         # (R,)
    sig_db = 10.0 * jnp.log10(sig_pwr)
    if noise_power_db is None:
        noise_db = jnp.mean(sig_db - snr_db + gain_db)
    else:
        noise_db = jnp.asarray(noise_power_db, jnp.float32)
    snr_cs = sig_db - noise_db + gain_db

    n_var = 10.0 ** (noise_db / 10.0)
    nr = jax.random.normal(key, rx_sig.shape + (2,))
    noise = (nr[..., 0] + 1j * nr[..., 1]) * jnp.sqrt(n_var / 2.0)
    gain_amp = 10.0 ** (gain_db / 20.0)
    y = gain_amp * rx_sig + noise.astype(jnp.complex64)

    y = y * (math.sqrt(cfg.used_sc) / cfg.fft_length)
    return sync_slice(cfg, y, chan_delay), snr_cs, noise_db


def thermal_noise_power(cfg: SimConfig) -> float:
    """MATLAB ``noisepow(fs, NF, 290)``: k·T·fs·10^(NF/10) [W] — the
    thermal noise floor of the useNoiseFig=true receiver branch
    (generate_maMIMO_LTF.m:270-292)."""
    k_boltz = 1.380649e-23
    return k_boltz * 290.0 * cfg.chan_srate * 10.0 ** (
        cfg.noise_figure / 10.0)


def receiver_chain_nf(cfg: SimConfig, key, rx_sig, gain_db, chan_delay):
    """Noise-figure-based receiver (the useNoiseFig=true branch):
    thermal noise set by bandwidth + noise figure instead of a target
    SNR, with the subcarrier scale factor applied to the variance
    (generate_maMIMO_LTF.m:280-292).

    Returns (y_sync, snr_db_per_antenna, noise_db).
    """
    rx_sig = jnp.asarray(rx_sig, jnp.complex64)
    sc_fact = (cfg.used_sc / cfg.fft_length**2) / cfg.num_tx
    n_var = thermal_noise_power(cfg) / sc_fact
    noise_db = 10.0 * math.log10(n_var)

    sig_pwr = jnp.mean(jnp.abs(rx_sig) ** 2, axis=0)
    # realized SNR = input signal power over input-referred noise power
    # — the TRUE post-chain SNR (both are amplified together below, so
    # the ratio survives to the demodulator; LS NMSE ≈ −snr_cs like
    # every other noise mode). Deliberate deviation: the reference's
    # printed value scales the signal POWER by the AMPLITUDE factor
    # sqrt(usedSC)/FFT (generate_maMIMO_LTF.m:287-289), a ~12 dB
    # bookkeeping slip it flags itself with "TODO: NEED TO DOUBLE
    # CHECK THIS VALUE" (:293).
    snr_db = 10.0 * jnp.log10(sig_pwr) - noise_db

    z = jax.random.normal(key, rx_sig.shape + (2,))
    noise = (z[..., 0] + 1j * z[..., 1]) * math.sqrt(n_var / 2.0)
    gain_amp = 10.0 ** (gain_db / 20.0)
    # phased.ReceiverPreamp refers the thermal noise to the INPUT and
    # amplifies signal and noise together (y = g·(x + n)) — so the
    # output SNR equals the input SNR reported above. Round-3 applied
    # the gain to the signal only, which inflated the realized SNR by
    # gain_db (~+100 dB: LS NMSE came out −70 dB at a reported −14 dB
    # SNR in the first measured nf sweep).
    y = gain_amp * (rx_sig + noise.astype(jnp.complex64))
    y = y * (math.sqrt(cfg.used_sc) / cfg.fft_length)
    return sync_slice(cfg, y, chan_delay), snr_db, jnp.asarray(
        noise_db, jnp.float32)


def interference_chain(
    cfg: SimConfig,
    key,
    rx_sig,
    chan_delay,
    noise_power_dbm: float = -85.0,
    interference_power_dbm: float = -55.0,
):
    """SINR variant (generate_maMIMO_LTF_SINR.m:225-251): fixed thermal
    noise floor (−85 dBm) plus explicit complex-Gaussian interference
    (−55 dBm); no preamp gain. Returns
    (y_sync, sinr_db_per_antenna, noise_db).

    Deviations from the reference, on purpose: the SINR here is computed
    from the *measured* received power (the reference predicts it from
    Tx power − spLoss + 10log10(Ns), :229-239); and noise/interference
    are proper unit-variance circular Gaussians (the reference's
    ``std*(randn + 1j*randn)`` draw is 3 dB hotter than its nominal
    power, :243-250 — a quirk not worth replicating).
    """
    rx_sig = jnp.asarray(rx_sig, jnp.complex64)
    sig_pwr = jnp.mean(jnp.abs(rx_sig) ** 2, axis=0)
    sig_db = 10.0 * jnp.log10(sig_pwr)
    noise_db = jnp.asarray(noise_power_dbm - 30.0, jnp.float32)
    intf_db = jnp.asarray(interference_power_dbm - 30.0, jnp.float32)
    denom_db = 10.0 * jnp.log10(
        10.0 ** (noise_db / 10.0) + 10.0 ** (intf_db / 10.0)
    )
    sinr_db = sig_db - denom_db

    kn, ki = jax.random.split(key)
    def _cn(k, var):
        z = jax.random.normal(k, rx_sig.shape + (2,))
        return ((z[..., 0] + 1j * z[..., 1]) * jnp.sqrt(var / 2.0)).astype(
            jnp.complex64
        )

    y = (
        rx_sig
        + _cn(kn, 10.0 ** (noise_db / 10.0))
        + _cn(ki, 10.0 ** (intf_db / 10.0))
    )
    y = y * (math.sqrt(cfg.used_sc) / cfg.fft_length)
    # report the SUMMED noise+interference power: two independent white
    # Gaussian draws are one draw at the summed variance, and this is
    # the level every downstream consumer (LMMSE weights, the data-leg
    # receiver) must reuse — the reference's data leg likewise applies
    # baseNoise AND interference (generate_maMIMO_LTF_SINR.m:457,484-491)
    return sync_slice(cfg, y, chan_delay), sinr_db, denom_db
