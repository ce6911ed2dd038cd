"""CDL clustered-delay-line channel: structure, power accounting, LOS
K-factor, and end-to-end compatibility with the sounding pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamimo_tpu.config import SimConfig
from mamimo_tpu.channel.cdl import (
    NUM_RAYS,
    RAY_OFFSETS,
    get_profile,
    realize_cdl,
)
from mamimo_tpu.channel.scattering import make_scenario, realize_channel


@pytest.fixture(scope="module")
def cdl_cfg():
    return SimConfig(num_tx=8, num_rx=2, channel_model="cdl_nlos")


def test_ray_offset_table():
    # TR 38.901 Table 7.5-3: 20 offsets in ± pairs, zero-mean, unit-ish
    # rms (the table is defined so the 20-ray fan has rms spread 1)
    assert NUM_RAYS == 20
    assert abs(RAY_OFFSETS.sum()) < 1e-6
    assert abs(np.sqrt(np.mean(RAY_OFFSETS ** 2)) - 1.0) < 0.02


def test_realize_shapes_and_delay_contract(cdl_cfg):
    cfg = cdl_cfg
    scen = make_scenario(cfg, jax.random.PRNGKey(0))
    chan = realize_channel(cfg, jax.random.PRNGKey(1), scen)
    C = len(get_profile("cdl_nlos").delays)
    assert chan.cr.shape == (cfg.num_tx, cfg.num_rx, C)
    assert chan.tau.shape == (C,)
    assert np.all(np.isfinite(np.asarray(chan.cr).view(np.float32)))
    # absolute delay = LOS propagation + DS-scaled cluster delays
    t0 = float(scen.mobile_range) / cfg.c_light
    tau = np.asarray(chan.tau)
    assert abs(tau.min() - t0) < 1e-12
    assert tau.max() - t0 <= 12 * cfg.cdl_delay_spread
    assert int(chan.chan_delay) == int(np.floor(tau.min() * cfg.chan_srate))


def test_per_link_power_is_free_space(cdl_cfg):
    """Cluster powers are normalized: E|h|^2 over packets = (λ/4πd)²."""
    cfg = cdl_cfg
    scen = make_scenario(cfg, jax.random.PRNGKey(2))
    pows = []
    for i in range(16):
        chan = realize_cdl(cfg, jax.random.PRNGKey(100 + i), scen)
        pows.append(float(jnp.sum(jnp.abs(chan.cr) ** 2)
                          / (cfg.num_tx * cfg.num_rx)))
    expected = (cfg.lam / (4 * np.pi * float(scen.mobile_range))) ** 2
    db_err = 10 * np.log10(np.mean(pows) / expected)
    assert abs(db_err) < 1.5, db_err


def test_los_k_factor():
    """cdl_los: the deterministic (packet-averaged) component carries
    ≈ K/(K+1) of the total power and lives in the first cluster."""
    cfg = SimConfig(num_tx=8, num_rx=2, channel_model="cdl_los",
                    cdl_k_factor_db=9.0)
    scen = make_scenario(cfg, jax.random.PRNGKey(3))
    crs = [np.asarray(realize_cdl(cfg, jax.random.PRNGKey(200 + i),
                                  scen).cr) for i in range(24)]
    mean_cr = np.mean(crs, axis=0)           # NLOS rays average out
    det_pow = np.sum(np.abs(mean_cr) ** 2) / (cfg.num_tx * cfg.num_rx)
    tot_pow = np.mean([np.sum(np.abs(c) ** 2) for c in crs]) \
        / (cfg.num_tx * cfg.num_rx)
    k_lin = 10 ** (9.0 / 10.0)
    ratio = det_pow / tot_pow
    assert abs(ratio - k_lin / (1 + k_lin)) < 0.12, ratio
    # the deterministic part is concentrated in cluster 0
    assert (np.sum(np.abs(mean_cr[:, :, 0]) ** 2)
            > 0.9 * np.sum(np.abs(mean_cr) ** 2))


def test_unknown_profile_raises():
    cfg = SimConfig(num_tx=8, num_rx=2, channel_model="cdl_bogus")
    scen = make_scenario(cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="cdl_bogus"):
        realize_channel(cfg, jax.random.PRNGKey(1), scen)


def test_cdl_end_to_end_sounding(cdl_cfg):
    """The full sounding pipeline runs on the CDL channel and the
    noiseless LS estimate matches the analytic subcarrier channel —
    same oracle the scattering model is held to."""
    import math

    from mamimo_tpu.channel.scattering import analytic_subcarrier_channel
    from mamimo_tpu.ops.ltf import preamble_scale
    from mamimo_tpu.pipeline.sounding import sound_packet

    cfg = cdl_cfg
    scen = make_scenario(cfg, jax.random.PRNGKey(4))
    res, chan = sound_packet(cfg, jax.random.PRNGKey(5), scen,
                             snr_db=120.0, fft_size=8192)
    h_true = np.asarray(analytic_subcarrier_channel(cfg, chan))
    # known amplitude scale (see test_channel.py::test_sounding_ls_...)
    gain_amp = 10.0 ** (float(scen.sp_loss_db) / 20.0)
    scale = (preamble_scale(cfg, cfg.num_tx) * gain_amp
             * math.sqrt(cfg.used_sc) / cfg.fft_length)
    ref = h_true * scale
    err = (np.linalg.norm(np.asarray(res.h_ls) - ref)
           / np.linalg.norm(ref))
    assert err < 5e-2, err


def test_cdl_seed_reproducible(cdl_cfg):
    cfg = cdl_cfg
    scen = make_scenario(cfg, jax.random.PRNGKey(6))
    a = realize_cdl(cfg, jax.random.PRNGKey(7), scen)
    b = realize_cdl(cfg, jax.random.PRNGKey(7), scen)
    np.testing.assert_array_equal(np.asarray(a.cr), np.asarray(b.cr))
