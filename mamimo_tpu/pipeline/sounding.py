"""Channel sounding: preamble → channel → receiver → demod → LS/LMMSE.

On-device replacement for the per-packet hot loop of
``generate_maMIMO_LTF.m:197-386`` (the isOnlyCSI=true path used for
dataset generation), plus the "perfect CSI" −100 dB-noise pass of
``BER_test_maMIMO_LTF.m:262-288`` so that every packet carries its own
oracle label. Fully jit/vmap-able over packets.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mamimo_tpu.config import SimConfig
from mamimo_tpu.channel.noise import (
    interference_chain,
    receiver_chain,
    receiver_chain_nf,
)
from mamimo_tpu.channel.scattering import (
    ChannelRealization,
    Scenario,
    apply_channel_model,
    realize_channel,
)
from mamimo_tpu.ops.estimate import (
    lmmse_estimate,
    lmmse_estimate_cg,
    lmmse_estimate_direct,
    lmmse_estimate_eig,
    ls_estimate,
)
from mamimo_tpu.ops.ltf import gen_preamble
from mamimo_tpu.ops.ofdm import ofdm_demodulate


class SoundingResult(NamedTuple):
    rx: jnp.ndarray          # (len_ltf, num_rx) received preamble (saved LTF)
    h_ls: jnp.ndarray        # (C, num_tx, num_rx) LS estimate
    h_perfect: jnp.ndarray   # (C, num_tx, num_rx) −100 dB-noise LS estimate
    h_mmse: jnp.ndarray      # (C, num_tx, num_rx) LMMSE (zeros if disabled)
    snr_cs: jnp.ndarray      # (num_rx,) realized sounding SNR [dB]
    noise_db: jnp.ndarray    # () applied noise power [dB]
    tau: jnp.ndarray         # (ns,) path delays (for LMMSE / diagnostics)
    chan_delay: jnp.ndarray  # () int32


def pad_signal(cfg: SimConfig, sig):
    """Append the channel-delay zero padding (helperApplyMUChannel.m:34)."""
    pad = jnp.zeros((cfg.num_pad_zeros, sig.shape[1]), sig.dtype)
    return jnp.concatenate([sig, pad], axis=0)


def estimate_from_rx(cfg: SimConfig, rx, tau=None, snr_db=None,
                     with_mmse: bool = False,
                     mmse_estimator: str = "cg",
                     mmse_n_iter: int = 16):
    """OFDM-demod + LS (+LMMSE) from a synced received preamble.

    The analytic half of the DNN's job: ``ofdmdemod`` + LS despread
    (generate_maMIMO_LTF.m:336-342). rx: (..., len_ltf, num_rx).

    Args:
      mmse_estimator: which LMMSE form to run when with_mmse:
        'cg' (default — circulant-preconditioned CG, 6.9× the LU forms
        on-chip, results/probe_lmmse_cg.json; ≤3e-5 from the dense
        solve across the protocol SNR range, tested to +120 dB in
        tests/test_estimate.py::test_lmmse_cg_high_snr), 'direct'
        (exact solve on the actual RHS — the escape hatch for regimes
        where a fixed CG trip count is not wanted), 'dense' (faithful
        LMMSE_ce.m M-matrix form), or 'eig' (eigenbasis form).
      mmse_n_iter: CG trip count ('cg' only).
    """
    grid, _ = ofdm_demodulate(cfg, rx, nsym=cfg.num_tx)
    h_ls = ls_estimate(cfg, grid, cfg.num_tx)
    if with_mmse:
        if mmse_estimator == "cg":
            h_mmse = lmmse_estimate_cg(cfg, h_ls, tau, snr_db,
                                       n_iter=mmse_n_iter)
        elif mmse_estimator == "direct":
            h_mmse = lmmse_estimate_direct(cfg, h_ls, tau, snr_db)
        elif mmse_estimator == "dense":
            h_mmse = lmmse_estimate(cfg, h_ls, tau, snr_db)
        elif mmse_estimator == "eig":
            h_mmse = lmmse_estimate_eig(cfg, h_ls, tau, snr_db)
        else:
            raise ValueError(
                f"unknown mmse_estimator {mmse_estimator!r}")
    else:
        h_mmse = jnp.zeros_like(h_ls)
    return h_ls, h_mmse


def sound_packet(
    cfg: SimConfig,
    key,
    scen: Scenario,
    snr_db,
    preamble=None,
    with_mmse: bool = False,
    noise_mode: str = "snr",
    fft_size: int | None = None,
    interference_dbm: float = -55.0,
    noise_floor_dbm: float = -85.0,
    mmse_estimator: str = "cg",
    mmse_n_iter: int = 16,
) -> tuple[SoundingResult, ChannelRealization]:
    """Simulate one sounding packet.

    Args:
      key: per-packet PRNG key (the per-packet channel seed contract of
        prm.seed_p, generate_maMIMO_LTF.m:33-41 — fold the packet index
        into the experiment key to regenerate identical channels later).
      snr_db: target sounding SNR (ignored in 'sinr' mode).
      preamble: optional precomputed sounding preamble
        (len_ltf, num_tx) — static across packets.
      noise_mode: 'snr' (generate_maMIMO_LTF.m) or 'sinr'
        (generate_maMIMO_LTF_SINR.m fixed noise + interference).
      interference_dbm / noise_floor_dbm: 'sinr'-mode powers (the
        reference hard-codes −55/−85 dBm,
        generate_maMIMO_LTF_SINR.m:225-251; exposed here so an
        interference sweep is one parameter away).
    """
    if fft_size is None:
        from mamimo_tpu.config import default_fft_size

        fft_size = default_fft_size(cfg)
    if preamble is None:
        preamble = gen_preamble(cfg, cfg.num_tx)
    k_chan, k_noise, k_perf = jax.random.split(key, 3)
    chan = realize_channel(cfg, k_chan, scen)
    sig = pad_signal(cfg, preamble)
    faded = apply_channel_model(cfg, sig, chan, fft_size=fft_size)

    gain_db = scen.sp_loss_db
    if noise_mode == "snr":
        rx, snr_cs, noise_db = receiver_chain(
            cfg, k_noise, faded, snr_db, gain_db, chan.chan_delay
        )
    elif noise_mode == "sinr":
        rx, snr_cs, noise_db = interference_chain(
            cfg, k_noise, faded, chan.chan_delay,
            noise_power_dbm=noise_floor_dbm,
            interference_power_dbm=interference_dbm,
        )
    elif noise_mode == "nf":
        rx, snr_cs, noise_db = receiver_chain_nf(
            cfg, k_noise, faded, gain_db, chan.chan_delay
        )
    else:
        raise ValueError(f"unknown noise_mode {noise_mode!r}")

    h_ls, h_mmse = estimate_from_rx(
        cfg, rx, chan.tau, snr_cs, with_mmse=with_mmse,
        mmse_estimator=mmse_estimator, mmse_n_iter=mmse_n_iter,
    )

    # "perfect" oracle: same chain with negligible noise. The gain
    # convention must match the noisy leg or NMSE compares different
    # scales: the snr/nf chains amplify by spLoss (preamp), the sinr
    # chain deliberately does not (gain_dB=0,
    # generate_maMIMO_LTF_SINR.m:213,253-261) — so its oracle runs at
    # gain 0 with noise pinned 100 dB below the received signal.
    if noise_mode == "sinr":
        rx_p, _, _ = receiver_chain(
            cfg, k_perf, faded, 100.0, 0.0, chan.chan_delay
        )
    else:
        rx_p, _, _ = receiver_chain(
            cfg, k_perf, faded, snr_db, gain_db, chan.chan_delay,
            noise_power_db=-100.0,
        )
    h_perfect, _ = estimate_from_rx(cfg, rx_p)

    res = SoundingResult(
        rx=rx,
        h_ls=h_ls,
        h_perfect=h_perfect,
        h_mmse=h_mmse,
        snr_cs=snr_cs,
        noise_db=noise_db,
        tau=chan.tau,
        chan_delay=chan.chan_delay,
    )
    return res, chan
