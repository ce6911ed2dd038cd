"""LMMSE estimator vs a NumPy port of LMMSE_ce.m, and metric definitions."""

import jax
import jax.numpy as jnp
import numpy as np

from mamimo_tpu.ops.estimate import (
    lmmse_eig_factor,
    lmmse_estimate,
    lmmse_estimate_eig,
    lmmse_weight,
)
from mamimo_tpu.ops.metrics import bit_error_rate, evm_rms, mse_abs, nmse_subk


def _lmmse_oracle(h_tilde, nfft, np_, nps, h, snr_db):
    """Direct NumPy transcription of the LMMSE_ce.m math (Cho et al. 2010
    textbook formula, including the reference's delays-as-h quirk)."""
    snr = 10 ** (snr_db * 0.1)
    k = np.arange(len(h))
    hh = np.dot(h, np.conj(h)).real
    tmp = h * np.conj(h) * k
    r = np.sum(tmp).real / hh
    r2 = np.dot(tmp, k).real / hh
    tau_rms = np.sqrt(r2 - r**2)
    df = 1.0 / nfft
    j2 = 1j * 2 * np.pi * tau_rms * df
    K1 = np.tile(np.arange(nfft)[:, None], (1, np_))
    K2 = np.tile(np.arange(np_)[None, :], (nfft, 1))
    rf = 1.0 / (1 + j2 * (K1 - K2 * nps))
    K3 = np.tile(np.arange(np_)[:, None], (1, np_))
    K4 = np.tile(np.arange(np_)[None, :], (np_, 1))
    rf2 = 1.0 / (1 + j2 * nps * (K3 - K4))
    Rhp = rf
    Rpp = rf2 + np.eye(len(h_tilde)) / snr
    return (Rhp @ np.linalg.inv(Rpp) @ h_tilde).T


def test_lmmse_matches_oracle(cfg):
    rng = np.random.default_rng(0)
    ns = cfg.n_scatterers
    tau = (rng.uniform(3e-6, 4e-6, ns)).astype(np.float32)
    n = cfg.num_carriers
    h_ls = (rng.standard_normal((n, 4, 1)) + 1j * rng.standard_normal((n, 4, 1))
            ).astype(np.complex64)
    snr_db = np.asarray([7.0], np.float32)
    out = np.asarray(
        lmmse_estimate(cfg, jnp.asarray(h_ls), jnp.asarray(tau), jnp.asarray(snr_db))
    )
    for j in range(4):
        ref = _lmmse_oracle(h_ls[:, j, 0], n, n, 1, tau.astype(np.float64),
                            float(snr_db[0]))
        np.testing.assert_allclose(out[:, j, 0], ref, atol=2e-3)


def test_lmmse_eig_matches_solve(cfg):
    """The eigenbasis form (one eigh per packet, diagonal rescale per
    rx/SNR) is the same estimator as the dense solve — and the same
    factorization serves different SNRs (the shared-scenario sweep
    amortization)."""
    rng = np.random.default_rng(3)
    tau = rng.uniform(3e-6, 4e-6, cfg.n_scatterers).astype(np.float32)
    n = cfg.num_carriers
    h_ls = (rng.standard_normal((n, 8, 2))
            + 1j * rng.standard_normal((n, 8, 2))).astype(np.complex64)
    snr_db = np.asarray([7.0, -5.0], np.float32)

    ref = np.asarray(lmmse_estimate(
        cfg, jnp.asarray(h_ls), jnp.asarray(tau), jnp.asarray(snr_db)))
    got = np.asarray(lmmse_estimate_eig(
        cfg, jnp.asarray(h_ls), jnp.asarray(tau), jnp.asarray(snr_db)))
    np.testing.assert_allclose(got, ref, atol=2e-3)

    # precomputed factors path (what the sweep amortizes across levels)
    factors = lmmse_eig_factor(cfg, jnp.asarray(tau))
    got2 = np.asarray(lmmse_estimate_eig(
        cfg, jnp.asarray(h_ls), snr_db=jnp.asarray(snr_db + 10.0),
        factors=factors))
    ref2 = np.asarray(lmmse_estimate(
        cfg, jnp.asarray(h_ls), jnp.asarray(tau),
        jnp.asarray(snr_db + 10.0)))
    np.testing.assert_allclose(got2, ref2, atol=2e-3)


def test_lmmse_cg_matches_solve(cfg):
    """The circulant-preconditioned CG form (FFT matvecs through the
    512-point Toeplitz embedding, padded-circulant preconditioner,
    fixed trip count) is the same estimator as the dense solve across
    the whole sounding SNR range, including mixed per-antenna SNRs
    and multi-stream RHS."""
    from mamimo_tpu.ops.estimate import lmmse_estimate_cg

    rng = np.random.default_rng(5)
    n = cfg.num_carriers
    b = 3
    tau = rng.uniform(1e-6, 4e-6, (b, cfg.n_scatterers)).astype(np.float32)
    h_ls = (rng.standard_normal((b, n, 2, 4))
            + 1j * rng.standard_normal((b, n, 2, 4))).astype(np.complex64)
    for snr_db in (-25.0, 0.0, 20.0):
        s = np.full((b, 4), snr_db, np.float32)
        ref = np.asarray(lmmse_estimate(
            cfg, jnp.asarray(h_ls), jnp.asarray(tau), jnp.asarray(s)))
        got = np.asarray(lmmse_estimate_cg(
            cfg, jnp.asarray(h_ls), jnp.asarray(tau), jnp.asarray(s)))
        np.testing.assert_allclose(got, ref, atol=2e-3)
    # mixed per-antenna SNRs (the per-antenna σ² enters the matvec,
    # the preconditioner spectrum, and the final h − σ²·y correction)
    s = rng.uniform(-25.0, 15.0, (b, 4)).astype(np.float32)
    ref = np.asarray(lmmse_estimate(
        cfg, jnp.asarray(h_ls), jnp.asarray(tau), jnp.asarray(s)))
    got = np.asarray(lmmse_estimate_cg(
        cfg, jnp.asarray(h_ls), jnp.asarray(tau), jnp.asarray(s)))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_lmmse_cg_high_snr(cfg):
    """Pin the CG-vs-exact delta in the high-SNR / near-noiseless
    regime (Rpp ≈ Rf near-singular) that production noiseless label
    generation (cli generate --mmse, snr default 120 dB) runs in —
    previously only asserted in comments. Worst case is the +40 dB
    crossover (~4.4e-3 on unit-scale inputs ≈ −47 dB relative); the
    σ² damping in ĥ = h − σ²·y makes +120 dB benign again."""
    from mamimo_tpu.ops.estimate import lmmse_estimate_cg

    rng = np.random.default_rng(5)
    n = cfg.num_carriers
    b = 3
    tau = rng.uniform(1e-6, 4e-6, (b, cfg.n_scatterers)).astype(np.float32)
    h_ls = (rng.standard_normal((b, n, 2, 4))
            + 1j * rng.standard_normal((b, n, 2, 4))).astype(np.complex64)
    from mamimo_tpu.ops.estimate import lmmse_estimate_direct

    bounds = {30.0: 2e-3, 40.0: 8e-3, 120.0: 3e-3}
    for snr_db, atol in bounds.items():
        s = np.full((b, 4), snr_db, np.float32)
        ref = np.asarray(lmmse_estimate_direct(
            cfg, jnp.asarray(h_ls), jnp.asarray(tau), jnp.asarray(s)))
        got = np.asarray(lmmse_estimate_cg(
            cfg, jnp.asarray(h_ls), jnp.asarray(tau), jnp.asarray(s)))
        assert np.abs(got - ref).max() < atol, snr_db


def test_estimate_from_rx_mmse_estimator_dispatch(cfg):
    """The mmse_estimator escape hatch (ADVICE r3): 'direct' gives the
    exact solve on the sounding path, unknown names raise."""
    import pytest

    from mamimo_tpu.ops.estimate import lmmse_estimate_direct, ls_estimate
    from mamimo_tpu.ops.ofdm import ofdm_demodulate
    from mamimo_tpu.pipeline.sounding import estimate_from_rx

    rng = np.random.default_rng(9)
    rx = (rng.standard_normal((cfg.len_ltf, cfg.num_rx))
          + 1j * rng.standard_normal((cfg.len_ltf, cfg.num_rx))
          ).astype(np.complex64)
    tau = rng.uniform(1e-6, 4e-6, cfg.n_scatterers).astype(np.float32)
    snr = np.full((cfg.num_rx,), 40.0, np.float32)
    h_ls, h_direct = estimate_from_rx(
        cfg, jnp.asarray(rx), jnp.asarray(tau), jnp.asarray(snr),
        with_mmse=True, mmse_estimator="direct")
    grid, _ = ofdm_demodulate(cfg, jnp.asarray(rx), nsym=cfg.num_tx)
    want_ls = ls_estimate(cfg, grid, cfg.num_tx)
    want = lmmse_estimate_direct(cfg, want_ls, jnp.asarray(tau),
                                 jnp.asarray(snr))
    np.testing.assert_allclose(np.asarray(h_direct), np.asarray(want),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_ls), np.asarray(want_ls),
                               atol=1e-6)
    with pytest.raises(ValueError):
        estimate_from_rx(cfg, jnp.asarray(rx), jnp.asarray(tau),
                         jnp.asarray(snr), with_mmse=True,
                         mmse_estimator="nope")


def test_lmmse_high_snr_identity(cfg):
    """At very high SNR the LMMSE weight tends to identity."""
    tau = np.linspace(3e-6, 3.5e-6, cfg.n_scatterers).astype(np.float32)
    m = np.asarray(lmmse_weight(cfg, jnp.asarray(tau), jnp.asarray(200.0)))
    np.testing.assert_allclose(m, np.eye(cfg.num_carriers), atol=1e-3)


def test_nmse_subk():
    rng = np.random.default_rng(1)
    ref = rng.standard_normal((234, 4, 2)) + 1j * rng.standard_normal((234, 4, 2))
    assert float(nmse_subk(ref, ref)) == 0.0
    # scaling error of 0.9 → NMSE = 0.01 on every subchannel
    val = float(nmse_subk(ref, 0.9 * ref))
    np.testing.assert_allclose(val, 0.01, rtol=1e-5)
    assert float(mse_abs(ref, 0.9 * ref)) > 0


def test_evm_ber():
    c = np.array([1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j]) / np.sqrt(2)
    # exact constellation points → EVM 0
    rx = np.tile(c, 10)
    assert float(evm_rms(rx, c)) < 1e-3
    # small perturbation → EVM ≈ |eps|/rms * 100
    rx2 = rx + 0.01
    v = float(evm_rms(rx2, c))
    np.testing.assert_allclose(v, 1.0, rtol=0.05)
    tx_bits = np.array([0, 1, 1, 0, 1])
    rx_bits = np.array([0, 1, 0, 0, 1])
    np.testing.assert_allclose(float(bit_error_rate(tx_bits, rx_bits)), 0.2)


def test_lmmse_chunked_equals_dense(small_cfg):
    """lmmse_estimate_chunked streams packet chunks through one scanned
    program and equals the dense batched form (the protocol-scale
    memory guard: dense materializes (B, R, C, C) smoothing matrices,
    ~7 MB/packet at BS32)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mamimo_tpu.ops.estimate import (
        lmmse_estimate,
        lmmse_estimate_chunked,
    )

    cfg = small_cfg
    b = 7                                   # not a chunk multiple
    key = jax.random.PRNGKey(5)
    z = jax.random.normal(
        key, (b, cfg.num_carriers, cfg.num_tx, cfg.num_rx, 2))
    h_ls = jax.lax.complex(z[..., 0], z[..., 1])
    tau = jax.random.uniform(key, (b, cfg.n_scatterers),
                             minval=1e-7, maxval=5e-7)
    snr = jnp.full((b, cfg.num_rx), 5.0)
    dense = np.asarray(lmmse_estimate(cfg, h_ls, tau, snr))
    chunked = np.asarray(lmmse_estimate_chunked(cfg, h_ls, tau, snr,
                                                chunk=3))
    np.testing.assert_allclose(chunked, dense, rtol=2e-5, atol=2e-5)


def test_lmmse_direct_matches_dense(cfg):
    """lmmse_estimate_direct (solve on the actual RHS + Rf matvec, the
    production sounding path) must agree with the dense-M form to f32
    solve noise — both sit ≲1.4e-5 of the float64 answer."""
    from mamimo_tpu.ops.estimate import lmmse_estimate_direct

    k = jax.random.PRNGKey(0)
    B = 2
    h = jax.random.normal(k, (B, cfg.num_carriers, 1, cfg.num_rx, 2))
    h = jax.lax.complex(h[..., 0], h[..., 1])
    tau = jax.random.uniform(jax.random.PRNGKey(1),
                             (B, cfg.n_scatterers),
                             minval=1e-8, maxval=5e-7)
    snr = jax.random.uniform(jax.random.PRNGKey(2), (B, cfg.num_rx),
                             minval=-20.0, maxval=20.0)
    a = np.asarray(lmmse_estimate(cfg, h, tau, snr))
    b = np.asarray(lmmse_estimate_direct(cfg, h, tau, snr))
    assert np.max(np.abs(a - b)) / np.max(np.abs(a)) < 1e-3


def test_lmmse_cg_default_matmul_precision(cfg):
    """The CG form must hold its accuracy under jax's DEFAULT matmul
    precision too (the conftest forces 'highest' globally; on TPU the
    default is single-pass-bf16 MXU, which stalled the round-3 CG at
    ~1e-2 relative until its DFT dots were pinned to HIGHEST —
    results/probe_lmmse_cg_r4.json). No-op on CPU, the real guard when
    the suite runs with MAMIMO_TEST_PLATFORM=tpu."""
    from mamimo_tpu.ops.estimate import (
        lmmse_estimate_cg,
        lmmse_estimate_direct,
    )

    rng = np.random.default_rng(7)
    n = cfg.num_carriers
    b = 2
    tau = rng.uniform(1e-6, 4e-6, (b, cfg.n_scatterers)).astype(np.float32)
    h_ls = (rng.standard_normal((b, n, 2, 4))
            + 1j * rng.standard_normal((b, n, 2, 4))).astype(np.complex64)
    s = rng.uniform(-20.0, 10.0, (b, 4)).astype(np.float32)
    with jax.default_matmul_precision("default"):
        ref = np.asarray(lmmse_estimate_direct(
            cfg, jnp.asarray(h_ls), jnp.asarray(tau), jnp.asarray(s)))
        got = np.asarray(lmmse_estimate_cg(
            cfg, jnp.asarray(h_ls), jnp.asarray(tau), jnp.asarray(s)))
    assert np.abs(got - ref).max() < 2e-3


def test_lmmse_cg_precision_knobs(cfg):
    """Round-5 mixed-precision options: cg with precond_precision /
    matvec_precision must stay within CG-convergence tolerance of the
    full-HIGHEST form (the bf16-pass effects only exist on TPU; the
    on-chip frontier is results/probe_cg_mixed_r5.json and the
    exactness gate scripts/tpu_checks.py)."""
    from mamimo_tpu.ops.estimate import lmmse_estimate_cg

    rng = np.random.default_rng(11)
    n = cfg.num_carriers
    b = 2
    tau = rng.uniform(1e-6, 4e-6, (b, cfg.n_scatterers)).astype(np.float32)
    h_ls = (rng.standard_normal((b, n, 2, 4))
            + 1j * rng.standard_normal((b, n, 2, 4))).astype(np.complex64)
    s = rng.uniform(-20.0, 10.0, (b, 4)).astype(np.float32)
    ref = np.asarray(lmmse_estimate_cg(
        cfg, jnp.asarray(h_ls), jnp.asarray(tau), jnp.asarray(s)))
    for kw in (dict(precond_precision=jax.lax.Precision.DEFAULT),
               dict(precond_precision=jax.lax.Precision.DEFAULT,
                    matvec_precision=jax.lax.Precision.HIGH)):
        got = np.asarray(lmmse_estimate_cg(
            cfg, jnp.asarray(h_ls), jnp.asarray(tau), jnp.asarray(s),
            **kw))
        assert np.abs(got - ref).max() < 2e-3, kw
