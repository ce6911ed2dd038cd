"""Closed-loop data-transmission leg: hybrid precoding → QPSK/OFDM data
frame → channel → receiver → equalize → decode → BER/EVM/BF-gain.

On-device replacement for the ``~isOnlyCSI`` branch of
``generate_maMIMO_LTF.m:403-640`` and the per-estimator evaluation loop
of ``BER_test_maMIMO_LTF.m:347-647`` (single-user path): given a CSI
estimate from any source (LS / LMMSE / DNN / perfect), compute OMP hybrid
weights, transmit a coded QPSK frame through the *same* per-packet channel
(preamble-primed, helperApplyMUChannel.m:26-35), and recover the bits.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mamimo_tpu.config import SimConfig
from mamimo_tpu.channel.noise import sync_slice
from mamimo_tpu.channel.scattering import (
    ChannelRealization,
    Scenario,
    apply_channel_model,
    array_positions,
    steering_vectors,
)
from mamimo_tpu.ops.coding import (
    conv_encode,
    gen_pilots,
    mimo_equalize,
    qpsk_constellation,
    qpsk_demod_llr,
    qpsk_mod,
    viterbi_decode,
)
from mamimo_tpu.ops.estimate import ls_estimate
from mamimo_tpu.ops.ltf import gen_preamble
from mamimo_tpu.ops.metrics import bit_error_rate, evm_rms
from mamimo_tpu.ops.ofdm import ofdm_demodulate, ofdm_modulate
from mamimo_tpu.ops.omp import omp_hyb_weights


class DataTxResult(NamedTuple):
    ber: jnp.ndarray          # ()
    evm: jnp.ndarray          # () RMS EVM %
    snr_dt: jnp.ndarray       # (num_rx,) data-transmission SNR [dB]
    bf_gain: jnp.ndarray      # () mean(snr_DT) − mean(snr_CS) [dB]


def steering_dictionary(cfg: SimConfig, key):
    """Random-ray steering dictionary At (generate_maMIMO_LTF.m:413-418):
    nRays random [az; el] directions over the actual BS array geometry
    (steervec(prm.posTxElem, txang))."""
    k1, k2 = jax.random.split(key)
    az = jax.random.uniform(k1, (cfg.n_rays,), minval=-180.0, maxval=180.0)
    el = jax.random.uniform(k2, (cfg.n_rays,), minval=-90.0, maxval=90.0)
    pos_wl = jnp.asarray(array_positions(
        cfg.num_tx, cfg.tx_geometry, 0.5, cfg.num_sts))  # in wavelengths
    return steering_vectors(pos_wl, az, el)               # (Nt, nRays)


def run_data_transmission(
    cfg: SimConfig,
    key,
    scen: Scenario,
    chan: ChannelRealization,
    csi,
    noise_db,
    snr_cs,
    fft_size: int | None = None,
    gain_db=None,
) -> DataTxResult:
    """One packet's closed-loop data transmission with a given CSI source.

    Args:
      key: PRNG key (steering rays, data bits, receiver noise).
      chan: the packet's channel realization (same seed as sounding).
      csi: (C, num_tx, num_rx) channel estimate used for precoding.
      noise_db: scalar noise power from the sounding stage (the evaluator
        reuses it, BER_test_maMIMO_LTF.m:254-257,502).
      snr_cs: (num_rx,) sounding SNR for the beamforming-gain metric.
      gain_db: receiver preamp gain override. Default (None) is the
        snr-mode convention, spLoss. SINR-mode datasets pass 0.0 — the
        reference's SINR data leg runs the preamp at gain 0
        (generate_maMIMO_LTF_SINR.m:466,488-491).
    """
    if fft_size is None:
        from mamimo_tpu.config import default_fft_size

        fft_size = default_fft_size(cfg, data_leg=True)
    k_rays, k_bits, k_noise = jax.random.split(key, 3)
    ns = cfg.num_sts

    # --- hybrid weights from CSI (generate_maMIMO_LTF.m:408-426) ---
    at = steering_dictionary(cfg, k_rays)
    fbb, frf = omp_hyb_weights(csi, ns, ns, at)
    v = fbb                                            # (C, ns, ntrf=ns)
    m_frf = jnp.mean(frf, axis=0)                      # (ns, Nt)

    # --- coded QPSK frame (:461-492) ---
    bits = jax.random.bernoulli(k_bits, 0.5, (cfg.num_frm_bits,)).astype(
        jnp.int32
    )
    coded = conv_encode(bits, terminated=True)         # (3*(K+6),)
    if cfg.bits_per_subcarrier == 2:
        syms = qpsk_mod(coded)                         # (C*nsym,)
    else:
        from mamimo_tpu.ops.coding import qam_mod

        syms = qam_mod(coded, cfg.mod_order)
    # layer mapping is column-major (carrier fastest, stream slowest):
    # reshape(mappedSym, numCarriers, numDataSymbols, numSTS) at :479-480
    grid = syms.reshape(ns, cfg.num_data_symbols, cfg.num_carriers)
    grid = jnp.transpose(grid, (2, 1, 0))              # (C, nsym, ns)

    # per-carrier precoding with Frobenius-normalized v (:485-492)
    fro = jnp.sqrt(jnp.sum(jnp.abs(v) ** 2, axis=(1, 2), keepdims=True))
    norm_v = v * math.sqrt(cfg.num_tx) / jnp.maximum(fro, 1e-30)
    pre_data = jnp.einsum("cnj,cjo->cno", grid, norm_v)  # (C, nsym, ns)

    pilots = gen_pilots(cfg.num_data_symbols, ns)
    tx_ofdm = ofdm_modulate(cfg, pre_data, pilots)
    tx_ofdm = tx_ofdm * (cfg.fft_length / math.sqrt(cfg.used_sc))

    # data-phase preamble with feedback weights (:505)
    preamble_d = gen_preamble(cfg, ns, v=v)
    tx_sts = jnp.concatenate([preamble_d, tx_ofdm], axis=0)  # (L, ns)
    tx_sig = tx_sts @ m_frf                                  # (L, Nt)

    # --- channel, preamble-primed (helperApplyMUChannel.m:26-35) ---
    pre_sound = gen_preamble(cfg, cfg.num_tx)
    pad = jnp.zeros((cfg.num_pad_zeros, cfg.num_tx), tx_sig.dtype)
    sig_pad = jnp.concatenate(
        [pre_sound, pad, tx_sig, jnp.zeros_like(pad)], axis=0
    )
    faded = apply_channel_model(cfg, sig_pad, chan, fft_size=fft_size)
    faded = faded[pre_sound.shape[0] + cfg.num_pad_zeros :]

    # --- receiver (:538-640, shared with the multi-user loop) ---
    return _receive_and_decode(
        cfg, k_noise, faded,
        gain_db=scen.sp_loss_db if gain_db is None else gain_db,
        noise_db=noise_db,
        chan_delay=chan.chan_delay, n_pre_sym=ns, own_start=0,
        n_own=ns, bits=bits, snr_cs=snr_cs,
    )


def _receive_and_decode(cfg: SimConfig, k_noise, faded, *, gain_db,
                        noise_db, chan_delay, n_pre_sym, own_start,
                        n_own, bits, snr_cs) -> DataTxResult:
    """Receiver chain shared by the single- and multi-user paths
    (generate_maMIMO_LTF.m:538-640): AWGN at the sounding noise power,
    subcarrier scaling, sync, demod, preamble LS, ZF-equalize the own
    stream slice, CSI-weighted approx-LLR demod, Viterbi, metrics.

    Args:
      n_pre_sym: mapped-preamble symbols (numSTS total across users).
      own_start: first stream index of this user (may be traced — the
        vmapped multi-user path passes u·num_sts).
      n_own: static stream count per user.
    """
    sig_pwr = jnp.mean(jnp.abs(faded) ** 2, axis=0)
    snr_dt = 10.0 * jnp.log10(sig_pwr) - noise_db + gain_db
    n_var_time = 10.0 ** (noise_db / 10.0)
    z = jax.random.normal(k_noise, faded.shape + (2,))
    noise = (z[..., 0] + 1j * z[..., 1]) * jnp.sqrt(n_var_time / 2.0)
    y = 10.0 ** (gain_db / 20.0) * faded + noise.astype(jnp.complex64)
    y = y * (math.sqrt(cfg.used_sc) / cfg.fft_length)
    # subcarrier-domain noise variance for the LLRs (:567-569)
    n_var = n_var_time * (cfg.used_sc / cfg.fft_length**2) / cfg.num_tx

    y_sync = sync_slice(cfg, y, chan_delay)
    rx_grid, _ = ofdm_demodulate(
        cfg, y_sync, nsym=n_pre_sym + cfg.num_data_symbols)

    # channel estimate from the mapped preamble (:578)
    h_eff = ls_estimate(cfg, rx_grid[:, :n_pre_sym, :], n_pre_sym)
    h_own = jax.lax.dynamic_slice_in_dim(h_eff, own_start, n_own, axis=1)
    rx_eq, csi_w = mimo_equalize(rx_grid[:, n_pre_sym:, :], h_own)

    # flatten carrier-fastest (MATLAB rxEq(:) column-major, :590). The
    # reference divides by sqrt(numTx) only — exact for its numSTS=1
    # experiments. The mapped preamble is power-normalized per symbol
    # (helperGenPreamble's 1/sqrt(numSTS)), so the preamble-LS channel
    # is G_data/sqrt(numTx·n_pre) (measured: the noiseless equalized
    # constellation lands at sqrt(n_pre) without this term); the extra
    # sqrt(n_pre_sym) puts multi-stream/multi-user symbols back on the
    # unit constellation and is identity for numSTS=1.
    rx_syms = jnp.transpose(rx_eq, (2, 1, 0)).reshape(-1) / math.sqrt(
        cfg.num_tx * n_pre_sym
    )
    if cfg.bits_per_subcarrier == 2:
        llr = qpsk_demod_llr(rx_syms, n_var)           # (2*C*nsym,)
        ref_const = qpsk_constellation()
    else:
        from mamimo_tpu.ops.coding import _qam_tables, qam_demod_approx_llr

        llr = qam_demod_approx_llr(rx_syms, cfg.mod_order, n_var)
        ref_const = jnp.asarray(_qam_tables(cfg.mod_order)[0])
    # CSI scaling per (subcarrier, stream) (:594-598): the symbol order
    # is stream-major / carrier-fastest (rxEq(:) column-major), so the
    # per-stream CSI column broadcasts over the data symbols (csi_w is
    # (C, n_own) — same stream count the h_eff slice above used)
    csi_k = jnp.broadcast_to(
        csi_w.T[:, None, :],
        (n_own, cfg.num_data_symbols, cfg.num_carriers)).reshape(-1)
    llr = (llr.reshape(-1, cfg.bits_per_subcarrier)
           * csi_k[:, None]).reshape(-1)

    decoded = viterbi_decode(llr, cfg.num_frm_bits, terminated=True)
    return DataTxResult(
        ber=bit_error_rate(bits, decoded),
        evm=evm_rms(rx_syms, ref_const),
        snr_dt=snr_dt,
        bf_gain=jnp.mean(snr_dt) - jnp.mean(snr_cs),
    )


def run_data_transmission_mu(
    cfg: SimConfig,
    key,
    scens,
    chans,
    csi_users,
    noise_db_users,
    snr_cs_users,
    fft_size: int | None = None,
):
    """Multi-user closed loop: JSDM precoding + per-user decode
    (the numUsers>1 branch, generate_maMIMO_LTF.m:427-440,531-640).

    Args:
      scens / chans: stacked per-user Scenario / ChannelRealization.
      csi_users: (U, C, num_tx, num_rx) per-user CSI used for precoding.
      noise_db_users: (U,) sounding noise powers.
      snr_cs_users: (U, num_rx) sounding SNRs.

    Returns: DataTxResult with a stacked leading user axis (U,).
    """
    from mamimo_tpu.ops.jsdm import jsdm_transmit_weights, pack_block_diagonal

    if fft_size is None:
        from mamimo_tpu.config import default_fft_size

        fft_size = default_fft_size(cfg, data_leg=True)
    u_cnt = cfg.num_users
    ns = cfg.num_sts
    sts_tot = u_cnt * ns
    k_bits, k_noise = jax.random.split(key)

    fbb, m_frf = jsdm_transmit_weights(csi_users, ns)
    v = pack_block_diagonal(fbb, ns)                   # (C, sts_tot, sts_tot)

    # per-user coded QPSK frames into the block layout (:466-481)
    bits_u = []
    grid = jnp.zeros((cfg.num_carriers, cfg.num_data_symbols, sts_tot),
                     jnp.complex64)
    for u in range(u_cnt):
        bits = jax.random.bernoulli(
            jax.random.fold_in(k_bits, u), 0.5, (cfg.num_frm_bits,)
        ).astype(jnp.int32)
        bits_u.append(bits)
        coded = conv_encode(bits, terminated=True)
        if cfg.bits_per_subcarrier == 2:
            syms = qpsk_mod(coded)
        else:
            from mamimo_tpu.ops.coding import qam_mod

            syms = qam_mod(coded, cfg.mod_order)
        # column-major layer mapping (carrier fastest), :479-480
        gu = jnp.transpose(
            syms.reshape(ns, cfg.num_data_symbols, cfg.num_carriers),
            (2, 1, 0))
        grid = grid.at[:, :, u * ns:(u + 1) * ns].set(gu)

    fro = jnp.sqrt(jnp.sum(jnp.abs(v) ** 2, axis=(1, 2), keepdims=True))
    norm_v = v * math.sqrt(cfg.num_tx) / jnp.maximum(fro, 1e-30)
    pre_data = jnp.einsum("cnj,cjo->cno", grid, norm_v)

    pilots = gen_pilots(cfg.num_data_symbols, sts_tot)
    tx_ofdm = ofdm_modulate(cfg, pre_data, pilots)
    tx_ofdm = tx_ofdm * (cfg.fft_length / math.sqrt(cfg.used_sc))
    preamble_d = gen_preamble(cfg, sts_tot, v=v)
    tx_sts = jnp.concatenate([preamble_d, tx_ofdm], axis=0)
    tx_sig = tx_sts @ m_frf                            # (L, Nt)

    pre_sound = gen_preamble(cfg, cfg.num_tx)
    pad = jnp.zeros((cfg.num_pad_zeros, cfg.num_tx), tx_sig.dtype)
    sig_pad = jnp.concatenate(
        [pre_sound, pad, tx_sig, jnp.zeros_like(pad)], axis=0)

    # per-user receive: one vmapped program over the stacked user axis
    # (channel application + AWGN + demod + equalize + Viterbi), not a
    # Python loop of dispatches
    bits_all = jnp.stack(bits_u)                       # (U, n_bits)
    u_idx = jnp.arange(u_cnt, dtype=jnp.int32)

    def per_user(scen_u, chan_u, u, noise_db_u, snr_cs_u, bits_u1):
        faded = apply_channel_model(cfg, sig_pad, chan_u,
                                    fft_size=fft_size)
        faded = faded[pre_sound.shape[0] + cfg.num_pad_zeros:]
        return _receive_and_decode(
            cfg, jax.random.fold_in(k_noise, u), faded,
            gain_db=scen_u.sp_loss_db, noise_db=noise_db_u,
            chan_delay=chan_u.chan_delay, n_pre_sym=sts_tot,
            own_start=u * ns, n_own=ns, bits=bits_u1,
            snr_cs=snr_cs_u,
        )

    return jax.vmap(per_user)(
        scens, chans, u_idx, jnp.asarray(noise_db_users),
        jnp.asarray(snr_cs_users), bits_all,
    )
