"""Scattering channel + sounding pipeline tests.

Validates the self-consistency contract (SURVEY.md §7): preamble →
channel → receiver → demod → LS must recover the analytic per-subcarrier
channel (up to the known preamble/AGC amplitude scale), and channel power
must track −fspl(range) + 10·log10(Ns) (generate_maMIMO_LTF.m:218-227).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from mamimo_tpu.channel.scattering import (
    analytic_subcarrier_channel,
    apply_channel,
    fspl_db,
    make_scenario,
    realize_channel,
    steering_vectors,
    ula_positions,
)
from mamimo_tpu.ops.ltf import gen_preamble, preamble_scale
from mamimo_tpu.pipeline.sounding import pad_signal, sound_packet


def test_fspl():
    # fspl(1000 m, lambda at 28 GHz) ≈ 121.4 dB
    lam = 299792458.0 / 28e9
    v = float(fspl_db(1000.0, lam))
    assert abs(v - 121.37) < 0.1


def test_steering_vectors_unit_modulus():
    pos = ula_positions(8, 0.5) / 1.0  # already in wavelengths if spacing 0.5
    sv = np.asarray(steering_vectors(jnp.asarray(pos), [0.0, 45.0], [0.0, 10.0]))
    assert sv.shape == (8, 2)
    np.testing.assert_allclose(np.abs(sv), 1.0, atol=1e-6)
    # a plane wave from az=30° gives linear phase progression across the
    # y-axis ULA: Δφ = 2π·0.5·sin(30°) = π/2
    sv2 = np.asarray(steering_vectors(jnp.asarray(pos), [30.0], [0.0]))[:, 0]
    ph = np.angle(sv2[1:] * np.conj(sv2[:-1]))
    np.testing.assert_allclose(ph, np.pi / 2, atol=1e-5)


def test_channel_power_tracks_fspl(small_cfg):
    """E[per-link channel power] ≈ −spLoss + 10log10(Ns) dB."""
    cfg = small_cfg
    key = jax.random.PRNGKey(0)
    scen = make_scenario(cfg, key)
    pows = []
    for p in range(8):
        chan = realize_channel(cfg, jax.random.fold_in(key, p), scen)
        pows.append(float(jnp.mean(jnp.sum(jnp.abs(chan.cr) ** 2, axis=-1))))
    p_db = 10 * math.log10(np.mean(pows))
    expect = -float(scen.sp_loss_db) + 10 * math.log10(cfg.n_scatterers)
    assert abs(p_db - expect) < 2.0  # statistical tolerance


def test_apply_channel_matches_taps(small_cfg):
    """Frequency-domain application equals an explicit per-path delay sum
    on a short probe signal."""
    cfg = small_cfg
    key = jax.random.PRNGKey(1)
    scen = make_scenario(cfg, key)
    chan = realize_channel(cfg, jax.random.fold_in(key, 0), scen)
    rng = np.random.default_rng(0)
    L = 2048
    sig = (rng.standard_normal((L, cfg.num_tx)) +
           1j * rng.standard_normal((L, cfg.num_tx))).astype(np.complex64)
    sig[-cfg.num_pad_zeros:] = 0  # tail padding like the pipeline
    y = np.asarray(apply_channel(cfg, jnp.asarray(sig), chan, fft_size=4096))
    # oracle: per-path circular fractional delay via numpy FFT phase ramps
    d = np.asarray(chan.tau) * cfg.chan_srate
    F = 4096
    k = np.fft.fftfreq(F) * F
    ks = k  # fftfreq already gives signed bins
    X = np.fft.fft(sig, n=F, axis=0)
    CR = np.asarray(chan.cr)
    Y = np.zeros((F, cfg.num_rx), np.complex64)
    ramp = np.exp(-2j * np.pi * ks[:, None] * d[None, :] / F)
    Hf = np.einsum("mns,fs->fmn", CR, ramp)
    Y = np.einsum("fm,fmn->fn", X, Hf)
    y_ref = np.fft.ifft(Y, axis=0)[:L]
    np.testing.assert_allclose(y, y_ref, atol=1e-6 * np.abs(y_ref).max() * 100)


def test_sounding_ls_matches_analytic(small_cfg):
    """Noise-free LS estimate == analytic subcarrier channel × known scale."""
    cfg = small_cfg
    key = jax.random.PRNGKey(2)
    scen = make_scenario(cfg, key)
    res, chan = sound_packet(
        cfg, jax.random.fold_in(key, 0), scen, snr_db=120.0, fft_size=8192
    )
    h_true = np.asarray(analytic_subcarrier_channel(cfg, chan))
    # known amplitude scale: preamble scale × preamp gain × sqrt(usedSC)/fft
    gain_amp = 10.0 ** (float(scen.sp_loss_db) / 20.0)
    scale = (
        preamble_scale(cfg, cfg.num_tx)
        * gain_amp
        * math.sqrt(cfg.used_sc)
        / cfg.fft_length
    )
    h_est = np.asarray(res.h_ls)
    ref = h_true * scale
    err = np.linalg.norm(h_est - ref) / np.linalg.norm(ref)
    # tolerance: the scatterer delay spread (~0.2·range·Fs/c samples) can
    # slightly exceed the 64-sample CP, leaving a small ISI residual —
    # identical physics to the reference simulation.
    assert err < 5e-2, f"relative LS error {err}"
    # the −100 dB 'perfect' pass must agree too
    err_p = np.linalg.norm(np.asarray(res.h_perfect) - ref) / np.linalg.norm(ref)
    assert err_p < 5e-2
    # and LS vs perfect agree tightly (same ISI in both)
    err_lp = np.linalg.norm(h_est - np.asarray(res.h_perfect)) / np.linalg.norm(ref)
    assert err_lp < 1e-3


def test_sounding_snr_realized(small_cfg):
    """Realized per-antenna sounding SNR averages to the target."""
    cfg = small_cfg
    key = jax.random.PRNGKey(3)
    scen = make_scenario(cfg, key)
    res, _ = sound_packet(
        cfg, jax.random.fold_in(key, 0), scen, snr_db=5.0, fft_size=8192
    )
    snr = np.asarray(res.snr_cs)
    assert abs(np.mean(snr) - 5.0) < 1e-3
    # and the measured post-hoc SNR on the received signal is close:
    # estimate noise as ||rx − scaled noiseless rx|| — skipped; the
    # mean-target identity above is the contract the generator prints
    # (generate_maMIMO_LTF.m:264-268).


def test_sounding_seed_reproducible(small_cfg):
    """Same packet key → identical channel + noise (the seeds-in-dataset
    contract, generate_maMIMO_LTF.m:33-41 / BER_test_maMIMO_LTF.m:235)."""
    cfg = small_cfg
    key = jax.random.PRNGKey(4)
    scen = make_scenario(cfg, key)
    r1, c1 = sound_packet(cfg, jax.random.fold_in(key, 7), scen, 0.0,
                          fft_size=8192)
    r2, c2 = sound_packet(cfg, jax.random.fold_in(key, 7), scen, 0.0,
                          fft_size=8192)
    np.testing.assert_array_equal(np.asarray(r1.rx), np.asarray(r2.rx))
    np.testing.assert_array_equal(np.asarray(c1.tau), np.asarray(c2.tau))


def test_sounding_vmap(small_cfg):
    """Packet generation vmaps (the screen-fanout replacement)."""
    cfg = small_cfg
    key = jax.random.PRNGKey(5)
    scen = make_scenario(cfg, key)
    pre = gen_preamble(cfg, cfg.num_tx)

    def one(k):
        res, _ = sound_packet(cfg, k, scen, 0.0, preamble=pre, fft_size=8192)
        return res.h_ls, res.snr_cs

    keys = jax.vmap(jax.random.fold_in, (None, 0))(key, jnp.arange(3))
    h, snr = jax.jit(jax.vmap(one))(keys)
    assert h.shape == (3, cfg.num_carriers, cfg.num_tx, cfg.num_rx)
    assert snr.shape == (3, cfg.num_rx)
    assert np.all(np.isfinite(np.asarray(h).view(np.float32)))


def test_fir_channel_model_first_class(small_cfg):
    """channel_model='fir' (the comm.MIMOChannel 'MIMO' alternate path,
    helperApplyMUChannel.m:145-185) routes sounding through the tapped
    FIR application and matches the exact phase-ramp model to
    band-limitation tolerance — same realization, same physics."""
    import dataclasses

    import jax
    import numpy as np

    from mamimo_tpu.ops.metrics import nmse_subk
    from mamimo_tpu.pipeline.sounding import sound_packet
    from mamimo_tpu.channel.scattering import make_scenario

    cfg = small_cfg
    cfg_fir = dataclasses.replace(cfg, channel_model="fir")
    scen = make_scenario(cfg, jax.random.PRNGKey(42))
    res, _ = sound_packet(cfg, jax.random.PRNGKey(1), scen,
                          snr_db=120.0, fft_size=8192)
    res_f, _ = sound_packet(cfg_fir, jax.random.PRNGKey(1), scen,
                            snr_db=120.0, fft_size=8192)
    a = np.asarray(res.h_ls)
    b = np.asarray(res_f.h_ls)
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 2e-3, rel
    # and the noiseless LS physics oracle still holds on the FIR path
    nm = 10 * np.log10(float(nmse_subk(res_f.h_perfect, res_f.h_ls)))
    assert nm < -55.0, nm
