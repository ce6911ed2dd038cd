"""Closed-loop evaluation of CSI estimators.

Replaces ``BER_test_maMIMO_LTF.m``: for each packet of a test dataset and
each estimator source ∈ {LS, LMMSE, DNN, perfect}, run the full data
transmission (OMP precoding → coded QPSK → channel → decode) and record
BER, RMS EVM, NMSE vs the perfect estimate, and beamforming gain.

Design deltas from the reference (justified by the saved-artifact
contract, see tests/test_model_train.py::test_packet_reproduces_channel):
the LS/LMMSE/perfect estimates and path delays are taken from the
*dataset* (computed at generation time from the same rx signal the
reference saves), and the channel realization for the data leg is
regenerated from the per-packet key.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mamimo_tpu.config import SimConfig
from mamimo_tpu.ops.metrics import nmse_subk
from mamimo_tpu.pipeline.dataset import CSIDataset
from mamimo_tpu.pipeline.datatx import run_data_transmission
from mamimo_tpu.channel.scattering import realize_channel
from mamimo_tpu.utils.numerics import put_complex


@dataclasses.dataclass
class ClosedLoopMetrics:
    """Per-packet metric arrays for one estimator source
    (the metrics.mat contents, BER_test_maMIMO_LTF.m:652-668)."""

    ber: np.ndarray       # (B,)
    evm: np.ndarray       # (B,)
    nmse: np.ndarray      # (B,) NMSE_subk vs perfect CSI
    bf_gain: np.ndarray   # (B,)

    def summary(self) -> Dict[str, float]:
        return {
            "ber": float(np.mean(self.ber)),
            "evm": float(np.mean(self.evm)),
            "nmse": float(np.mean(self.nmse)),
            "nmse_db": float(10 * np.log10(np.mean(self.nmse) + 1e-30)),
            "bf_gain": float(np.mean(self.bf_gain)),
        }


def nmse_vs_snr(ds: CSIDataset, predictions: Optional[np.ndarray] = None):
    """Fast (sounding-only) NMSE summary for each estimator source."""
    ref = put_complex(ds.h_perfect)
    out = {"ls": np.asarray(nmse_subk(ref, put_complex(ds.h_ls)))}
    if ds.h_mmse is not None:
        out["lmmse"] = np.asarray(nmse_subk(ref, put_complex(ds.h_mmse)))
    if predictions is not None:
        out["dnn"] = np.asarray(nmse_subk(ref, put_complex(predictions)))
    return out


def evaluate_closed_loop(
    ds: CSIDataset,
    predictions: Optional[np.ndarray] = None,
    sources: tuple = ("ls", "lmmse", "dnn", "perfect"),
    max_packets: Optional[int] = None,
    fft_size: int | None = None,
    seed: int = 1234,
) -> Dict[str, ClosedLoopMetrics]:
    """Run the closed loop over a test dataset.

    Args:
      ds: test dataset (must carry h_mmse if 'lmmse' is requested).
      predictions: (B, C, Nt, Nr) DNN CSI (required for 'dnn').
      max_packets: evaluate only the first N packets.

    Returns: {source: ClosedLoopMetrics}
    """
    cfg = ds.cfg
    n = ds.num_packets if max_packets is None else min(
        max_packets, ds.num_packets
    )
    srcs = [s for s in sources
            if not (s == "dnn" and predictions is None)
            and not (s == "lmmse" and ds.h_mmse is None)]

    def one_packet(pkt_key, eval_key, csi, snr_cs, noise_db):
        chan = realize_channel(
            cfg, jax.random.split(pkt_key, 3)[0], ds.scenario
        )
        return run_data_transmission(
            cfg, eval_key, ds.scenario, chan, csi, noise_db, snr_cs,
            fft_size=fft_size,
        )

    run = jax.jit(one_packet)

    results = {s: {"ber": [], "evm": [], "nmse": [], "bf": []}
               for s in srcs}
    base_eval = jax.random.PRNGKey(seed)
    ref = put_complex(ds.h_perfect[:n])

    for s in srcs:
        if s == "ls":
            csi_all = ds.h_ls
        elif s == "lmmse":
            csi_all = ds.h_mmse
        elif s == "dnn":
            csi_all = predictions
        else:
            csi_all = ds.h_perfect
        nm = np.asarray(nmse_subk(ref, put_complex(csi_all[:n])))
        for p in range(n):
            # same random draws (rays/bits/noise) for every source at a
            # given packet, like the single rng stream in the reference
            r = run(
                ds.packet_key(p),
                jax.random.fold_in(base_eval, p),
                put_complex(csi_all[p]),
                jnp.asarray(ds.snr_cs[p]),
                jnp.asarray(ds.noise_db[p]),
            )
            results[s]["ber"].append(float(r.ber))
            results[s]["evm"].append(float(r.evm))
            results[s]["bf"].append(float(r.bf_gain))
        results[s]["nmse"] = nm

    return {
        s: ClosedLoopMetrics(
            ber=np.asarray(results[s]["ber"]),
            evm=np.asarray(results[s]["evm"]),
            nmse=np.asarray(results[s]["nmse"]),
            bf_gain=np.asarray(results[s]["bf"]),
        )
        for s in srcs
    }
