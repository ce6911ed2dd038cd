#!/usr/bin/env python
"""Generate ``reference_semantics.npz``: pinned inputs + float64 oracle
outputs for the reference-semantics fidelity contract
(tests/test_reference_oracles.py). Run once and commit the npz;
re-run only when the contract itself is extended.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from mamimo_tpu.config import SimConfig                      # noqa: E402
from tests.golden.reference_oracles import (                 # noqa: E402
    lmmse_oracle,
    ls_oracle,
    omp_decomp_oracle,
    receiver_oracle,
)


def main(out_path):
    rng = np.random.default_rng(20260819)
    cfg = SimConfig(num_tx=8, num_rx=2)
    c = cfg.num_carriers
    carr_1based = np.asarray(cfg.carrier_locations, np.int64) + 1

    data = {}

    # --- LS despread (helperMIMOChannelEstimate.m:24-41)
    rx_grid = (rng.standard_normal((c, cfg.num_tx, cfg.num_rx))
               + 1j * rng.standard_normal((c, cfg.num_tx, cfg.num_rx)))
    data["ls_rx_grid"] = rx_grid
    data["ls_carriers_1based"] = carr_1based
    data["ls_out"] = ls_oracle(rx_grid, cfg.num_tx, carr_1based)

    # --- LMMSE (LMMSE_ce.m:23-39), two regimes of the delays-as-h quirk
    h_tilde = (rng.standard_normal(c) + 1j * rng.standard_normal(c))
    tau_small = np.sort(rng.uniform(3e-7, 5e-7, 24))   # pipeline scale
    tau_big = np.sort(rng.uniform(0.5, 3.0, 24))       # strong corr.
    data["lmmse_h_tilde"] = h_tilde
    data["lmmse_tau_small"] = tau_small
    data["lmmse_tau_big"] = tau_big
    data["lmmse_snr_db"] = np.float64(5.0)
    data["lmmse_out_small"] = lmmse_oracle(h_tilde, c, c, 1, tau_small, 5.0)
    data["lmmse_out_big"] = lmmse_oracle(h_tilde, c, c, 1, tau_big, 5.0)

    # --- OMP greedy decomposition (ompdecomp.m:105-116)
    nt, ns, na, nrf = 8, 2, 32, 4
    wopt = (rng.standard_normal((nt, ns))
            + 1j * rng.standard_normal((nt, ns)))
    ang = rng.uniform(-np.pi / 2, np.pi / 2, na)
    adict = np.exp(1j * np.pi * np.arange(nt)[:, None]
                   * np.sin(ang)[None, :]) / np.sqrt(nt)
    coeff, atoms, idx, err = omp_decomp_oracle(wopt, adict, nrf)
    data["omp_wopt"] = wopt
    data["omp_adict"] = adict
    data["omp_nrf"] = np.int64(nrf)
    data["omp_coeff"] = coeff
    data["omp_atoms"] = atoms
    data["omp_idx"] = idx
    data["omp_err"] = np.float64(err)

    # --- receiver power bookkeeping (generate_maMIMO_LTF.m:239-332)
    nsamp = 1400
    rx_sig = 1e-4 * (rng.standard_normal((nsamp, cfg.num_rx))
                     + 1j * rng.standard_normal((nsamp, cfg.num_rx)))
    y_sync, snr_cs, noise_db = receiver_oracle(
        rx_sig, snr_db=5.0, gain_db=60.0, used_sc=cfg.used_sc,
        fft_length=cfg.fft_length, num_pad_zeros=cfg.num_pad_zeros,
        chan_delay=13)
    data["rcv_rx_sig"] = rx_sig
    data["rcv_snr_db"] = np.float64(5.0)
    data["rcv_gain_db"] = np.float64(60.0)
    data["rcv_chan_delay"] = np.int64(13)
    data["rcv_y_sync"] = y_sync
    data["rcv_snr_cs"] = snr_cs
    data["rcv_noise_db"] = np.float64(noise_db)

    np.savez_compressed(out_path, **data)
    print(f"wrote {out_path}: "
          f"{', '.join(sorted(data))}")


if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    main(os.path.join(here, "reference_semantics.npz"))
