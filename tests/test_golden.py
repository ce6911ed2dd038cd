"""Seed-pinned golden-value regression (SURVEY.md §4 item 2): the
generation pipeline must keep producing the same physics for a fixed
seed. Tolerances are loose enough for cross-context float32
reassociation (the d/λ phase amplification, see
tests/test_model_train.py::test_packet_key_reproduces_channel) but tight
enough to catch any semantic drift in the preamble/channel/noise/
estimator chain."""

import os

import numpy as np

from mamimo_tpu.config import SimConfig
from mamimo_tpu.pipeline.dataset import generate_dataset

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "bs8_seed777.npz")


def test_golden_generation():
    cfg = SimConfig(num_tx=8, num_rx=2, n_scatterers=16)
    ds = generate_dataset(cfg, seed=777, num_packets=2, snr_db=5.0,
                          with_mmse=True, chunk=2, fft_size=8192)
    g = np.load(GOLDEN)

    def rel(a, b):
        return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)

    assert rel(ds.rx, g["rx"]) < 2e-2
    assert rel(ds.h_ls, g["h_ls"]) < 2e-2
    assert rel(ds.h_perfect, g["h_perfect"]) < 2e-2
    assert rel(ds.h_mmse, g["h_mmse"]) < 2e-2
    np.testing.assert_allclose(ds.tau, g["tau"], rtol=1e-5)
    np.testing.assert_allclose(ds.snr_cs, g["snr_cs"], atol=1e-3)
    np.testing.assert_allclose(ds.noise_db, g["noise_db"], atol=1e-3)
