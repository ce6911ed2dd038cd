"""OFDM mod/demod unit tests vs NumPy oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from mamimo_tpu.ops.ofdm import build_grid, ofdm_demodulate, ofdm_modulate


def _rand_grid(cfg, nsym, nsts, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.standard_normal((cfg.num_carriers, nsym, nsts))
        + 1j * rng.standard_normal((cfg.num_carriers, nsym, nsts))
    ).astype(np.complex64)


def test_roundtrip_identity(cfg):
    """demod(mod(x)) == x on data carriers (and pilots)."""
    nsym, nsts = 4, 3
    data = _rand_grid(cfg, nsym, nsts)
    rng = np.random.default_rng(1)
    pilots = (
        rng.standard_normal((len(cfg.pilot_indices), nsym, nsts))
        + 1j * rng.standard_normal((len(cfg.pilot_indices), nsym, nsts))
    ).astype(np.complex64)
    t = ofdm_modulate(cfg, data, pilots)
    assert t.shape == (nsym * cfg.sym_len, nsts)
    d2, p2 = ofdm_demodulate(cfg, t, nsym=nsym)
    np.testing.assert_allclose(np.asarray(d2), data, atol=2e-5)
    np.testing.assert_allclose(np.asarray(p2), pilots, atol=2e-5)


def test_mod_matches_numpy_ifft(cfg):
    """Time samples equal MATLAB-convention ifft(ifftshift(grid))/... ."""
    nsym, nsts = 2, 1
    data = _rand_grid(cfg, nsym, nsts, seed=2)
    t = np.asarray(ofdm_modulate(cfg, data))
    grid = np.zeros((cfg.fft_length, nsym, nsts), np.complex64)
    grid[np.asarray(cfg.carrier_locations)] = data
    ref = np.fft.ifft(np.fft.ifftshift(grid, axes=0), axis=0)
    ref = np.concatenate([ref[-cfg.cp_length:], ref], axis=0)
    ref = np.moveaxis(ref, 1, 0).reshape(-1, nsts)
    np.testing.assert_allclose(t, ref, atol=1e-6)


def test_null_carriers_zero(cfg):
    data = _rand_grid(cfg, 1, 1)
    g = np.asarray(build_grid(cfg, data))
    assert np.all(g[np.asarray(cfg.null_indices)] == 0)


def test_cp_is_cyclic(cfg):
    data = _rand_grid(cfg, 1, 1, seed=3)
    t = np.asarray(ofdm_modulate(cfg, data))[:, 0]
    np.testing.assert_allclose(
        t[: cfg.cp_length], t[cfg.fft_length:], atol=1e-6
    )


def test_batched_demod(cfg):
    """Leading batch dims flow through demod."""
    nsym = 2
    data = _rand_grid(cfg, nsym, 2, seed=4)
    t = ofdm_modulate(cfg, data)
    batched = jnp.stack([t, 2.0 * t])
    d2, _ = ofdm_demodulate(cfg, batched, nsym=nsym)
    assert d2.shape == (2, cfg.num_carriers, nsym, 2)
    np.testing.assert_allclose(np.asarray(d2[1]), 2.0 * data, atol=4e-5)


def test_data_leg_grid_power_accounting(cfg):
    """Unit-power QPSK data + the 802.11 pilots, modulated and scaled by
    fft/sqrt(used_sc) (generate_maMIMO_LTF.m:501-503), must yield a
    unit-average-power time signal — the power bookkeeping the receiver's
    noise/SNR accounting assumes."""
    from mamimo_tpu.ops.coding import gen_pilots, qpsk_mod

    nsym, nsts = 14, 2
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, size=(2 * cfg.num_carriers * nsym * nsts,))
    syms = np.asarray(qpsk_mod(jnp.asarray(bits)))
    data = syms.reshape(cfg.num_carriers, nsym, nsts)
    pilots = np.asarray(gen_pilots(nsym, nsts))
    t = np.asarray(ofdm_modulate(cfg, data, pilots))
    t = t * (cfg.fft_length / np.sqrt(cfg.used_sc))
    power = np.mean(np.abs(t) ** 2)
    # CP repetition keeps the per-sample expectation at 1 exactly
    np.testing.assert_allclose(power, 1.0, rtol=0.05)


def test_jit_compatible(cfg):
    data = _rand_grid(cfg, 2, 1)
    f = jax.jit(lambda d: ofdm_modulate(cfg, d))
    np.testing.assert_allclose(
        np.asarray(f(data)), np.asarray(ofdm_modulate(cfg, data)), atol=1e-6
    )
