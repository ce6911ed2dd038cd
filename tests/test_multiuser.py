"""Multi-user sounding + JSDM closed-loop tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamimo_tpu.config import SimConfig
from mamimo_tpu.ops.jsdm import (
    jsdm_transmit_weights,
    pack_block_diagonal,
    user_covariances,
)
from mamimo_tpu.pipeline.datatx import run_data_transmission_mu
from mamimo_tpu.pipeline.multiuser import (
    index_user,
    make_scenarios,
    sound_packet_mu,
)

MU = SimConfig(num_users=2, num_tx=8, num_rx=2, n_scatterers=12,
               num_data_symbols=4)


@pytest.fixture(scope="module")
def mu_sounding():
    # seed 8 places the users at well-separated broadside directions
    # (u = sin(az)cos(el) of +0.97 vs −0.34) — spatially separable by
    # the 8-element ULA. Nearly-collinear users are physically
    # inseparable and JSDM degenerates gracefully there.
    key = jax.random.PRNGKey(8)
    scens = make_scenarios(MU, key)
    res, chans = sound_packet_mu(MU, jax.random.fold_in(key, 1), scens,
                                 snr_db=10.0, fft_size=8192)
    return scens, res, chans


def test_scenarios_independent():
    scens = make_scenarios(MU, jax.random.PRNGKey(3))
    assert scens.rx_pos.shape == (2, 3)
    assert float(scens.mobile_range[0]) != float(scens.mobile_range[1])
    s0 = index_user(scens, 0)
    assert s0.rx_pos.shape == (3,)


def test_mu_sounding_shapes(mu_sounding):
    _, res, chans = mu_sounding
    assert res.rx.shape == (2, MU.len_ltf, MU.num_rx)
    assert res.h_ls.shape == (2, MU.num_carriers, MU.num_tx, MU.num_rx)
    assert chans.cr.shape == (2, MU.num_tx, MU.num_rx, MU.n_scatterers)
    # users see different channels
    assert not np.allclose(np.asarray(res.h_ls[0]), np.asarray(res.h_ls[1]))


def test_jsdm_weights_synthetic_steering():
    """With users on distinct steering directions, the SLNR beamformer
    puts >10x more energy on the own covariance than on the other's."""
    from mamimo_tpu.channel.scattering import steering_vectors, ula_positions

    nt, C = 16, 32
    pos = jnp.asarray(ula_positions(nt, 0.5))
    a = steering_vectors(pos, [-40.0, 50.0], [0.0, 0.0])   # (nt, 2)
    rng = np.random.default_rng(0)
    h = np.zeros((2, C, nt, 2), np.complex64)
    for u in range(2):
        g = (rng.standard_normal((C, 2)) + 1j * rng.standard_normal((C, 2)))
        h[u] = np.conj(np.asarray(a[:, u]))[None, :, None] * g[:, None, :]
    fbb, m_frf = jsdm_transmit_weights(jnp.asarray(h), 1)
    assert m_frf.shape == (2, nt)
    covs = np.asarray(user_covariances(jnp.asarray(h)))
    for u in range(2):
        row = np.asarray(m_frf[u])           # row = b^H
        # E|row @ h|^2 = row @ R @ row^H
        own = np.real(row @ covs[u] @ np.conj(row))
        other = np.real(row @ covs[1 - u] @ np.conj(row))
        assert own > 5.0 * other, (own, other)
        # beamformer aligns with the user's (conjugate) steering vector
        b = np.conj(row)
        a_u = np.conj(np.asarray(a[:, u]))   # channel rows are conj(a)
        a_o = np.conj(np.asarray(a[:, 1 - u]))
        assert abs(np.vdot(a_u, b)) / np.linalg.norm(a_u) > 0.9
        assert abs(np.vdot(a_o, b)) / np.linalg.norm(a_o) < 0.1


def test_jsdm_weights_separate_users(mu_sounding):
    _, res, _ = mu_sounding
    h = jnp.asarray(res.h_perfect)
    fbb, m_frf = jsdm_transmit_weights(h, 1)
    assert m_frf.shape == (2, MU.num_tx)
    v = pack_block_diagonal(fbb, 1)
    assert v.shape == (MU.num_carriers, 2, 2)
    covs = np.asarray(user_covariances(h))
    for u in range(2):
        row = np.asarray(m_frf[u])
        own = np.real(row @ covs[u] @ np.conj(row))
        other = np.real(row @ covs[1 - u] @ np.conj(row))
        assert own > 2.0 * other, (own, other)


def test_mu_closed_loop_decodes(mu_sounding):
    scens, res, chans = mu_sounding
    out = run_data_transmission_mu(
        MU, jax.random.PRNGKey(9), scens, chans,
        jnp.asarray(res.h_perfect), jnp.asarray(res.noise_db),
        jnp.asarray(res.snr_cs), fft_size=16384,
    )
    # vmapped: stacked leading user axis
    assert out.ber.shape == (2,)
    for u in range(2):
        assert float(out.ber[u]) < 0.1, (u, float(out.ber[u]))
        assert np.isfinite(float(out.evm[u]))


def test_mu_high_snr_zero_interference_oracle():
    """JSDM block-diagonalization oracle (VERDICT r1 #7): two spatially
    well-separated users with perfect CSI at high sounding SNR must
    decode error-free — inter-user interference after BD is negligible,
    so the only residual impairment is the (tiny) AWGN."""
    from mamimo_tpu.pipeline.multiuser import make_scenarios, sound_packet_mu

    key = jax.random.PRNGKey(8)      # separable placement (see fixture)
    scens = make_scenarios(MU, key)
    res, chans = sound_packet_mu(MU, jax.random.fold_in(key, 1), scens,
                                 snr_db=30.0, fft_size=8192)
    out = run_data_transmission_mu(
        MU, jax.random.PRNGKey(10), scens, chans,
        jnp.asarray(res.h_perfect), jnp.asarray(res.noise_db),
        jnp.asarray(res.snr_cs), fft_size=16384,
    )
    for u in range(2):
        assert float(out.ber[u]) == 0.0, (u, float(out.ber[u]))
        # EVM here includes the matched-filter amplitude mismatch (the
        # digital weight is not unitary), not residual interference —
        # QPSK still decodes perfectly; just require it bounded
        assert float(out.evm[u]) < 60.0, (u, float(out.evm[u]))


def test_mu_snr_sweep_smoke():
    """run_mu_snr_sweep end-to-end (tiny): per-(source, user) series
    aligned with the SNR grid, CIs present."""
    from mamimo_tpu.eval.snr_sweep import run_mu_snr_sweep

    out = run_mu_snr_sweep(MU, snr_levels=[10.0], num_packets=2,
                           seed=8, sources=("ls", "perfect"),
                           fft_size=16384, chunk=2, verbose=False)
    assert out["num_users"] == 2
    for s in ("ls", "perfect"):
        d = out["sources"][s]
        assert len(d["ber"]) == 1 and len(d["ber"][0]) == 2
        assert len(d["ber_ci"][0]) == 2
        assert all(np.isfinite(v) for v in d["evm"][0])


def test_mu_snr_sweep_dnn_source():
    """'dnn' as a CSI source in the multi-user loop (the reference's
    BER_test_maMIMO_LTF.m:347 DNN leg inside the numUsers>1 branch):
    per-user stacked models feed jsdm_transmit_weights through
    predict_all_pairs. Untrained nets here — the test pins the plumbing
    (shapes, finiteness, per-user model dispatch), not accuracy."""
    from mamimo_tpu.config import TrainConfig
    from mamimo_tpu.eval.snr_sweep import run_mu_snr_sweep
    from mamimo_tpu.models.mlp import init_stacked

    tcfg = TrainConfig(hidden=(32, 32))
    keys = jax.random.split(jax.random.PRNGKey(0), MU.num_users)
    per_user = [init_stacked(k, MU, tcfg) for k in keys]
    models = (
        jax.tree.map(lambda *l: jnp.stack(l), *[p for p, _ in per_user]),
        jax.tree.map(lambda *l: jnp.stack(l), *[b for _, b in per_user]),
    )
    out = run_mu_snr_sweep(MU, snr_levels=[10.0], num_packets=2,
                           seed=8, sources=("dnn", "perfect"),
                           fft_size=16384, chunk=2, verbose=False,
                           dnn_models=models, tcfg=tcfg)
    d = out["sources"]["dnn"]
    assert len(d["ber"]) == 1 and len(d["ber"][0]) == 2
    assert all(np.isfinite(v) for v in d["ber"][0] + d["evm"][0])
    # untrained CSI precodes garbage: perfect must beat it
    assert (np.mean(out["sources"]["perfect"]["ber"][0])
            <= np.mean(d["ber"][0]) + 1e-9)
