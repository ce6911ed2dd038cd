"""LTF sequence / P matrix / preamble / LS estimator tests.

The crucial self-consistency contract (SURVEY.md §7 "hard parts"):
gen_preamble → channel → ofdmdemod → LS must recover the true channel.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mamimo_tpu.config import SimConfig
from mamimo_tpu.ops.ltf import (
    gen_preamble,
    hadamard,
    ltf_data_carriers,
    ltf_sequence,
    pilot_p_matrix,
    preamble_scale,
)
from mamimo_tpu.ops.ofdm import ofdm_demodulate
from mamimo_tpu.ops.estimate import ls_estimate


def test_ltf_structure(cfg):
    ltf = np.asarray(ltf_sequence(cfg))
    assert ltf.shape == (256,)
    # zeros exactly on null carriers (guards + DC)
    nulls = np.asarray(cfg.null_indices)
    assert np.all(ltf[nulls] == 0)
    used = np.setdiff1d(np.arange(256), nulls)
    assert np.all(np.abs(ltf[used]) == 1)
    # data-carrier restriction is ±1
    ld = np.asarray(ltf_data_carriers(cfg))
    assert ld.shape == (cfg.num_carriers,)
    assert np.all(np.abs(ld) == 1)


def test_hadamard_orthogonal():
    for n in (1, 2, 4, 8, 32):
        h = hadamard(n)
        np.testing.assert_array_equal(h @ h.T, n * np.eye(n))
        assert np.all(np.abs(h) == 1)


def test_preamble_shape_and_power(cfg):
    pre = np.asarray(gen_preamble(cfg))
    assert pre.shape == (cfg.len_ltf, cfg.num_tx)
    # ~unit *total* radiated power: per-antenna power 1/num_sts
    pwr = np.mean(np.abs(pre) ** 2, axis=0)
    np.testing.assert_allclose(np.sum(pwr), 1.0, rtol=0.05)


def test_preamble_ls_identity_channel(cfg):
    """Through an identity channel, LS must recover exactly the preamble
    amplitude scale on every (carrier, tx, rx=tx) entry."""
    pre = gen_preamble(cfg)                     # (len, Nt)
    grid, _ = ofdm_demodulate(cfg, pre, nsym=cfg.num_tx)
    hd = np.asarray(ls_estimate(cfg, grid))
    scale = preamble_scale(cfg, cfg.num_tx)
    eye = np.zeros((cfg.num_carriers, cfg.num_tx, cfg.num_tx), np.complex64)
    idx = np.arange(cfg.num_tx)
    eye[:, idx, idx] = scale
    np.testing.assert_allclose(hd, eye, atol=1e-3 * scale)


def test_ls_linear_mimo_channel(small_cfg):
    """Flat (per-subcarrier-constant) MIMO mixing matrix is recovered."""
    cfg = small_cfg
    pre = gen_preamble(cfg, cfg.num_tx)         # (len, Nt)
    rng = np.random.default_rng(0)
    H = (
        rng.standard_normal((cfg.num_tx, cfg.num_rx))
        + 1j * rng.standard_normal((cfg.num_tx, cfg.num_rx))
    ).astype(np.complex64)
    rx = jnp.asarray(np.asarray(pre) @ H)       # flat channel, no delay
    grid, _ = ofdm_demodulate(cfg, rx, nsym=cfg.num_tx)
    hd = np.asarray(ls_estimate(cfg, grid, cfg.num_tx))
    scale = preamble_scale(cfg, cfg.num_tx)
    expect = np.broadcast_to(H * scale, (cfg.num_carriers,) + H.shape)
    np.testing.assert_allclose(hd, expect, atol=2e-4 * scale * np.abs(H).max())


def test_precoded_preamble(small_cfg):
    """Data-phase preamble (v given): the estimated effective channel is
    the Frobenius-normalized precoder itself through an identity channel."""
    cfg = small_cfg
    ns = 1
    rng = np.random.default_rng(1)
    v = (
        rng.standard_normal((cfg.num_carriers, ns, cfg.num_tx))
        + 1j * rng.standard_normal((cfg.num_carriers, ns, cfg.num_tx))
    ).astype(np.complex64)
    pre = gen_preamble(cfg, ns, v=v)            # (ns*sym_len, Nt)
    assert pre.shape == (ns * cfg.sym_len, cfg.num_tx)
    # pass through identity channel, estimate ns-stream effective channel
    grid, _ = ofdm_demodulate(cfg, pre, nsym=ns)
    hd = np.asarray(ls_estimate(cfg, grid, ns))  # (C, ns, Nt)
    fro = np.sqrt(np.sum(np.abs(v) ** 2, axis=(1, 2), keepdims=True))
    norm_v = v / fro
    expect = norm_v * preamble_scale(cfg, ns)
    np.testing.assert_allclose(hd, expect, atol=2e-3)
