"""Closed-loop data-transmission tests: perfect CSI at good SNR decodes
cleanly; the estimator ranking is physically sensible."""

import jax
import numpy as np
import pytest

from mamimo_tpu.config import SimConfig
from mamimo_tpu.eval.closed_loop import evaluate_closed_loop, nmse_vs_snr
from mamimo_tpu.eval.snr_sweep import compute_ci, run_snr_sweep
from mamimo_tpu.pipeline.dataset import generate_dataset

CL_CFG = SimConfig(num_tx=8, num_rx=2, n_scatterers=16, n_rays=64,
                   num_data_symbols=4)


@pytest.fixture(scope="module")
def cl_ds():
    return generate_dataset(CL_CFG, seed=5, num_packets=4, snr_db=10.0,
                            with_mmse=True, chunk=4, fft_size=8192)


def test_closed_loop_perfect_csi_decodes(cl_ds):
    out = evaluate_closed_loop(cl_ds, sources=("perfect",), fft_size=16384)
    m = out["perfect"]
    assert m.ber.shape == (4,)
    # At 10 dB sounding SNR with beamforming gain, decoding should be clean
    assert np.mean(m.ber) < 0.05, m.ber
    assert np.all(m.evm > 0)
    # beamforming gain should be strongly positive (Nt=8 array gain)
    assert np.mean(m.bf_gain) > 3.0, m.bf_gain


def test_closed_loop_all_sources(cl_ds):
    # fake "DNN" = heavily shrunk LS (0.9x would *improve* NMSE via
    # MMSE-like shrinkage; 0.5x is clearly worse)
    preds = cl_ds.h_ls * 0.5
    out = evaluate_closed_loop(
        cl_ds, predictions=preds, max_packets=2, fft_size=16384
    )
    assert set(out.keys()) == {"ls", "lmmse", "dnn", "perfect"}
    # NMSE ordering: perfect < ls; dnn (0.9*ls) worse than ls
    s = {k: v.summary() for k, v in out.items()}
    assert s["ls"]["nmse"] < s["dnn"]["nmse"]
    for k in s:
        assert np.isfinite(s[k]["ber"])


def test_closed_loop_multistream_ura():
    """num_sts=2 end-to-end with the auto-dispatched URA geometry
    (helperArrayInfo parity: URA [numTx/numSTS × numSTS] when numSTS>1,
    generate_maMIMO_LTF.m:123-136): two spatial streams precoded,
    transmitted and decoded through the [4×2]-URA BS array."""
    from mamimo_tpu.channel.scattering import resolve_geometry

    cfg = SimConfig(num_tx=8, num_rx=4, num_sts=2, n_scatterers=16,
                    n_rays=64, num_data_symbols=4)
    assert resolve_geometry(cfg.tx_geometry, cfg.num_sts) == "ura"
    ds = generate_dataset(cfg, seed=7, num_packets=3, snr_db=15.0,
                          chunk=3, fft_size=8192)
    out = evaluate_closed_loop(ds, sources=("perfect", "ls"),
                               fft_size=16384)
    m = out["perfect"]
    assert m.ber.shape == (3,)
    assert np.all(np.isfinite(m.ber)) and np.all(np.isfinite(m.evm))
    # perfect CSI at 15 dB sounding SNR decodes the 2-stream frame on
    # most packets (a weak second eigenchannel on an unlucky scenario
    # draw is ZF physics, not a chain defect — noiseless BER is 0)
    assert np.median(m.ber) < 0.01, m.ber
    assert np.min(m.ber) < 0.005, m.ber
    assert np.mean(m.bf_gain) > 0.0, m.bf_gain
    # the corrected constellation scale keeps RMS EVM physical (<100%)
    assert np.all(m.evm < 100.0), m.evm


def test_nmse_vs_snr_ranking():
    ds_hi = generate_dataset(CL_CFG, seed=5, num_packets=4, snr_db=10.0,
                             with_mmse=True, chunk=4, fft_size=8192)
    ds_lo = generate_dataset(CL_CFG, seed=5, num_packets=4, snr_db=-10.0,
                             with_mmse=True, chunk=4, fft_size=8192)
    hi = nmse_vs_snr(ds_hi)
    lo = nmse_vs_snr(ds_lo)
    assert np.mean(lo["ls"]) > np.mean(hi["ls"])     # noisier => worse
    assert np.mean(lo["lmmse"]) < np.mean(lo["ls"])  # LMMSE denoises


def test_compute_ci():
    x = np.asarray([1.0, 2.0, 3.0, 4.0, 5.0])
    lo, hi = compute_ci(x)
    assert lo < 3.0 < hi
    assert abs((3.0 - lo) - (hi - 3.0)) < 1e-9       # symmetric


def test_run_snr_sweep_smoke(tmp_path):
    res = run_snr_sweep(
        CL_CFG, snr_levels=[0.0, 10.0], num_packets=3, seed=5,
        with_mmse=False, chunk=4, verbose=False,
    )
    assert len(res.nmse["ls"]) == 2
    assert res.nmse["ls"][0] > res.nmse["ls"][1]     # NMSE improves w/ SNR
    from mamimo_tpu.eval.snr_sweep import plot_sweep
    plot_sweep(res, str(tmp_path))
    import os
    assert os.path.exists(os.path.join(str(tmp_path), "MSE.png"))
    res.save(os.path.join(str(tmp_path), "sweep.json"))


def test_sweep_handles_missing_mmse(tmp_path):
    """Caller-supplied datasets without h_mmse degrade to NaN series."""
    ds = generate_dataset(CL_CFG, seed=5, num_packets=3, snr_db=0.0,
                          with_mmse=False, chunk=3, fft_size=8192)
    res = run_snr_sweep(CL_CFG, snr_levels=[0.0], num_packets=3,
                        datasets={0.0: ds}, verbose=False)
    assert np.isnan(res.nmse["lmmse"][0])
    assert np.isfinite(res.nmse["ls"][0])
