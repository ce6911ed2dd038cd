"""Aux subsystem tests: resume, profiling, plots, URA geometry,
datasource registry, predictor wrapper."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamimo_tpu.config import SimConfig, TrainConfig
from mamimo_tpu.channel.scattering import array_positions, ura_positions
from mamimo_tpu.data.sources import get_datasource
from mamimo_tpu.pipeline.dataset import generate_dataset
from mamimo_tpu.train.loop import fit
from mamimo_tpu.utils.profiling import StepsPerSecond, time_inference

TINY = SimConfig(num_tx=4, num_rx=2, n_scatterers=10)
TTC = TrainConfig(hidden=(32, 32), batch_size=16, epochs=2,
                  early_stop_patience=50, seed=1)


@pytest.fixture(scope="module")
def tiny_ds():
    return generate_dataset(TINY, seed=0, num_packets=10, snr_db=120.0,
                            chunk=5, fft_size=4096)


def test_resume_continues(tiny_ds, tmp_path):
    wd = str(tmp_path)
    r1 = fit(TINY, TTC, tiny_ds, workdir=wd, verbose=False)
    assert r1.epochs_ran == 2
    # resume with a larger epoch budget continues from epoch 2
    r2 = fit(TINY, TTC.replace(epochs=4), tiny_ds, workdir=wd,
             verbose=False, resume=True)
    assert r2.epochs_ran == 4
    # full run history: the pre-resume epochs are preserved from the
    # workdir's history.json, then the resumed epochs append
    assert len(r2.history["loss_real"]) == 4


def test_ura_positions():
    p = ura_positions(8, 2, 0.5)
    assert p.shape == (3, 8)
    assert np.all(p[0] == 0)              # y-z plane
    assert len(np.unique(p[1])) == 2      # 2 columns
    assert len(np.unique(p[2])) == 4      # 4 rows
    p2 = array_positions(8, "ula", 0.5)
    assert np.all(p2[2] == 0)


def test_ura_scenario_pipeline():
    cfg = SimConfig(num_tx=8, num_rx=2, n_scatterers=8,
                    tx_geometry="ura", num_sts=2)
    ds = generate_dataset(cfg, seed=1, num_packets=2, snr_db=0.0,
                          chunk=2, fft_size=4096)
    assert np.all(np.isfinite(ds.h_ls.view(np.float32)))


def test_helper_array_info_dispatch():
    """helperArrayInfo parity (generate_maMIMO_LTF.m:123-136): ULA for
    single-stream, URA [n/numSTS × numSTS] when numSTS>1, with the
    divisibility validation."""
    from mamimo_tpu.channel.scattering import (
        helper_array_info,
        resolve_geometry,
    )

    # the paper's default (numSTSVec=[1]): ULA both ends
    tx_ura, exp_tx, rx_ura, exp_rx = helper_array_info(32, 4, 1)
    assert (tx_ura, rx_ura) == (False, False)
    assert (exp_tx, exp_rx) == (32, 4)
    # multi-stream: URA with [expFactor × numSTS] partitioning
    tx_ura, exp_tx, rx_ura, exp_rx = helper_array_info(32, 4, 2)
    assert (tx_ura, rx_ura) == (True, True)
    assert (exp_tx, exp_rx) == (16, 2)
    with pytest.raises(ValueError):
        helper_array_info(30, 4, 4)      # numTx not a multiple of numSTS
    with pytest.raises(ValueError):
        helper_array_info(32, 1, 2)      # numRx < numSTS
    assert resolve_geometry("auto", 1) == "ula"
    assert resolve_geometry("auto", 2) == "ura"
    assert resolve_geometry("ula", 2) == "ula"    # manual override wins


def test_auto_geometry_positions():
    """'auto' (the config default) derives the URA layout from num_sts
    without a manual flag."""
    p_auto = array_positions(8, "auto", 0.5, ncols=2)
    p_ura = ura_positions(8, 2, 0.5)
    assert np.allclose(p_auto, p_ura)
    # single-stream auto = ULA (z stays 0)
    p1 = array_positions(8, "auto", 0.5, ncols=1)
    assert np.all(p1[2] == 0)


def test_profiling_helpers():
    f = jax.jit(lambda x: x * 2.0)
    stats = time_inference(f, (jnp.ones((8, 8)),), iters=3)
    assert stats["seconds_per_call"] > 0
    c = StepsPerSecond()
    c.step(5)
    assert c.rate() > 0


def test_plots(tiny_ds, tmp_path):
    from mamimo_tpu.eval.plots import plot_mimo_channel, plot_predictions

    plot_predictions(str(tmp_path), tiny_ds.h_ls[:1], tiny_ds.h_perfect[:1],
                     n_pics=2)
    assert os.path.exists(os.path.join(str(tmp_path), "0_real_bluePred.png"))
    plot_mimo_channel(os.path.join(str(tmp_path), "chan.png"),
                      tiny_ds.h_ls[0])
    assert os.path.exists(os.path.join(str(tmp_path), "chan.png"))


def test_datasource_registry(tiny_ds, tmp_path):
    # native npz roundtrip through the registry
    path = os.path.join(str(tmp_path), "ds.npz")
    tiny_ds.save(path)
    d = get_datasource("mamimo_npz")(path)
    np.testing.assert_array_equal(d["rx"], tiny_ds.rx)
    with pytest.raises(KeyError):
        get_datasource("nope")
    # pickle path through matlab_maMimo loader
    from mamimo_tpu.data.matlab_io import save_pickle_dataset

    pkl = os.path.join(str(tmp_path), "ds.b")
    save_pickle_dataset(tiny_ds.rx, tiny_ds.h_ls, tiny_ds.pilot_matrix(),
                        d["sim_params"], pkl, seed=0)
    d2 = get_datasource("matlab_maMimo")(pkl)
    np.testing.assert_allclose(d2["rx"], tiny_ds.rx, atol=1e-6)
    np.testing.assert_allclose(d2["h_ls"], tiny_ds.h_ls, atol=1e-6)


def test_csi_predictor_wrapper(tiny_ds, tmp_path):
    from mamimo_tpu.models.predictor import CSIPredictor

    wd = str(tmp_path / "model")
    fit(TINY, TTC, tiny_ds, workdir=wd, verbose=False)
    pred = CSIPredictor(wd)
    P = tiny_ds.pilot_matrix()
    out = pred.inference(tiny_ds.rx[:1, :, 0], P[:, :1].T)
    assert out.shape == (1, TINY.num_carriers)
    assert out.dtype == np.complex64
    # all-pairs deploy call: f32 vs int8 quantized path
    planes = tiny_ds.rx_planes().reshape(
        2, tiny_ds.num_packets, TINY.num_rx, TINY.len_ltf)
    f32 = pred.all_pairs(planes)
    q8 = pred.all_pairs(planes, int8=True)
    assert f32.shape == (tiny_ds.num_packets, TINY.num_rx,
                         TINY.num_tx, TINY.num_carriers)
    rel = (np.abs(q8 - f32) ** 2).mean() / (np.abs(f32) ** 2).mean()
    assert 10 * np.log10(rel + 1e-30) < -25.0
    # full serving call (LS + DNN, the benched production path): LS
    # must match the reference estimator, DNN must match all_pairs
    from mamimo_tpu.ops.estimate import ls_estimate_planes

    flat = tiny_ds.rx_planes()                      # (2, S, L)
    h_ls, h_dnn = pred.estimate_full(flat)
    s = flat.shape[1]
    assert h_ls.shape == (s, TINY.num_tx, TINY.num_carriers)
    assert h_dnn.shape == (s, TINY.num_tx, TINY.num_carriers)
    ref_ls = np.asarray(ls_estimate_planes(TINY, flat))
    np.testing.assert_allclose(h_ls, ref_ls, atol=1e-4)
    # all_pairs returns (B, R, Nt, C); flatten to rx-major S
    ref_dnn = f32.reshape(s, TINY.num_tx, TINY.num_carriers)
    np.testing.assert_allclose(h_dnn, ref_dnn, atol=1e-4)


def test_bs64_scaled_config():
    """BASELINE config 3: Nt=64, Nr=8 (512 antenna pairs) generates,
    estimates and runs factored inference at the scaled shapes."""
    import jax
    import jax.numpy as jnp

    from mamimo_tpu.models.mlp import init_stacked, predict_all_pairs

    cfg = SimConfig(num_tx=64, num_rx=8, n_scatterers=16)
    assert cfg.len_ltf == 64 * 320
    ds = generate_dataset(cfg, seed=4, num_packets=1, snr_db=0.0,
                          chunk=1, fft_size=32768)
    assert ds.h_ls.shape == (1, 234, 64, 8)
    tc = TrainConfig(hidden=(64, 32))
    params, bn = init_stacked(jax.random.PRNGKey(0), cfg, tc)
    out = predict_all_pairs(cfg, tc, params, bn, jnp.asarray(ds.rx))
    assert out.shape == (1, 234, 64, 8)
    assert np.all(np.isfinite(np.asarray(out).view(np.float32)))
