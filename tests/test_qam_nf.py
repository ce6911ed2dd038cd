"""Generic M-QAM and noise-figure receiver tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamimo_tpu.eval.closed_loop import evaluate_closed_loop
from mamimo_tpu.ops.metrics import nmse_subk

from mamimo_tpu.config import SimConfig
from mamimo_tpu.channel.noise import thermal_noise_power
from mamimo_tpu.ops.coding import (
    _qam_tables,
    qam_demod_approx_llr,
    qam_mod,
    qpsk_demod_llr,
    qpsk_mod,
)
from mamimo_tpu.pipeline.dataset import generate_dataset
from mamimo_tpu.pipeline.sounding import sound_packet
from mamimo_tpu.channel.scattering import make_scenario


@pytest.mark.parametrize("m", [4, 16, 64, 256])
def test_qam_unit_power_and_roundtrip(m):
    k = int(np.log2(m))
    rng = np.random.default_rng(m)
    bits = rng.integers(0, 2, 240 * k)
    syms = np.asarray(qam_mod(jnp.asarray(bits), m))
    np.testing.assert_allclose(np.mean(np.abs(syms) ** 2), 1.0, rtol=0.15)
    # clean demod -> hard decisions recover the bits
    llr = np.asarray(qam_demod_approx_llr(jnp.asarray(syms), m, 0.1))
    hard = (llr < 0).astype(int)
    np.testing.assert_array_equal(hard, bits)


def test_qam_gray_property():
    """Neighboring constellation points differ in exactly one bit per
    axis (gray mapping)."""
    const, table = _qam_tables(16)
    # points sharing the same Q, adjacent in I, differ by 1 bit
    for i in range(16):
        for j in range(16):
            d = const[i] - const[j]
            if abs(d.imag) < 1e-6 and abs(abs(d.real) - 2 / np.sqrt(10)) < 1e-6:
                assert np.sum(table[i] != table[j]) == 1


def test_qam4_consistent_with_qpsk_llr_sign():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 64)
    s4 = np.asarray(qam_mod(jnp.asarray(bits), 4))
    llr_q = np.asarray(qam_demod_approx_llr(jnp.asarray(s4), 4, 0.5))
    np.testing.assert_array_equal((llr_q < 0).astype(int), bits)


def test_16qam_closed_loop():
    """Full closed loop decodes with 16-QAM at high SNR."""
    from mamimo_tpu.eval.closed_loop import evaluate_closed_loop

    cfg = SimConfig(num_tx=8, num_rx=2, n_scatterers=12,
                    num_data_symbols=4, bits_per_subcarrier=4)
    assert cfg.num_frm_bits == (4 * cfg.num_carriers * 4) // 3 - 6
    ds = generate_dataset(cfg, seed=6, num_packets=2, snr_db=20.0,
                          chunk=2, fft_size=8192)
    out = evaluate_closed_loop(ds, sources=("perfect",), fft_size=16384)
    assert float(np.mean(out["perfect"].ber)) < 0.05


def test_nf_noise_mode(small_cfg):
    cfg = small_cfg
    np.testing.assert_allclose(
        thermal_noise_power(cfg),
        1.380649e-23 * 290 * cfg.chan_srate * 10 ** (cfg.noise_figure / 10),
    )
    scen = make_scenario(cfg, jax.random.PRNGKey(0))
    res, _ = sound_packet(cfg, jax.random.PRNGKey(1), scen, snr_db=0.0,
                          noise_mode="nf", fft_size=8192)
    assert np.all(np.isfinite(np.asarray(res.snr_cs)))
    # thermal-floor SNR at hundreds of meters should be finite and low
    assert np.all(np.asarray(res.snr_cs) < 60.0)
    # the REALIZED noise must match the reported SNR: preamp noise is
    # referred to the input and amplified with the signal
    # (phased.ReceiverPreamp semantics — the round-3 form amplified the
    # signal only, so h_ls came out ~gain_db too clean), hence the LS
    # NMSE tracks -snr_cs like every other noise mode
    snr = float(np.mean(np.asarray(res.snr_cs)))
    nm = 10 * np.log10(float(nmse_subk(res.h_perfect, res.h_ls)))
    assert abs(nm - (-snr)) < 3.0, (snr, nm)


def test_sinr_mode_scale_contract(small_cfg):
    """SINR mode runs the receiver at preamp gain 0
    (generate_maMIMO_LTF_SINR.m:213,253-261) — the perfect oracle must
    use the SAME convention or NMSE compares different scales (the
    round-3 sinr_sweep artifact initially read NMSE == 1.0 at every
    interference level for exactly this reason)."""
    cfg = small_cfg
    scen = make_scenario(cfg, jax.random.PRNGKey(4))
    sinrs, nmses = [], []
    for intf in (-75.0, -55.0):
        res, _ = sound_packet(cfg, jax.random.PRNGKey(2), scen,
                              snr_db=0.0, noise_mode="sinr",
                              interference_dbm=intf, fft_size=8192)
        sinr = float(np.mean(np.asarray(res.snr_cs)))
        nm = 10 * np.log10(float(
            nmse_subk(res.h_perfect, res.h_ls)))
        # LS NMSE tracks -SINR (within a couple dB at Nt=8)
        assert abs(nm - (-sinr)) < 3.0, (intf, sinr, nm)
        sinrs.append(sinr)
        nmses.append(nm)
    assert sinrs[1] < sinrs[0] - 10     # +20 dBm interference bites
    assert nmses[1] > nmses[0] + 10


def test_sinr_closed_loop_gain_convention(small_cfg):
    """The data-transmission leg of a SINR dataset must run at gain 0
    too (the reference's ReceiverPreamp in the SINR file,
    generate_maMIMO_LTF_SINR.m:488-491): with the spLoss gain a ~60 dB
    amplifier makes every packet noiseless (BER==0 at -20 dB SINR)."""
    cfg = small_cfg
    ds = generate_dataset(cfg, seed=6, num_packets=2, snr_db=0.0,
                          noise_mode="sinr", chunk=2, fft_size=8192,
                          interference_dbm=-45.0)
    assert ds.noise_mode == "sinr"
    # deep in interference (SINR around -20 dB): LS CSI must NOT decode
    out = evaluate_closed_loop(ds, sources=("ls",), fft_size=16384)
    assert float(np.mean(out["ls"].ber)) > 0.05
    # roundtrip keeps the convention
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "ds.npz")
        ds.save(p)
        from mamimo_tpu.pipeline.dataset import CSIDataset

        assert CSIDataset.load(p).noise_mode == "sinr"
