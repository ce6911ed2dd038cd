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
    chunk: int = 32,
) -> Dict[str, ClosedLoopMetrics]:
    """Run the closed loop over a test dataset, BATCHED.

    The reference runs one MATLAB iteration per (packet × source)
    (``BER_test_maMIMO_LTF.m:177,347``); the round-1 port kept that as
    one jit dispatch each — 2,000 dispatches per SNR at protocol scale.
    Here the whole (packet × source) grid is vmapped: one dispatch per
    `chunk` packets runs ALL sources for those packets, with the channel
    realization and the (rays/bits/noise) draws shared across sources at
    a given packet exactly like the single rng stream of the reference.

    Args:
      ds: test dataset (must carry h_mmse if 'lmmse' is requested).
      predictions: (B, C, Nt, Nr) DNN CSI (required for 'dnn').
      max_packets: evaluate only the first N packets.
      chunk: packets per dispatch (bounds peak memory: each in-flight
        packet carries ~(n_src × fft × Nt) complex workspaces).

    Returns: {source: ClosedLoopMetrics}
    """
    cfg = ds.cfg
    n = ds.num_packets if max_packets is None else min(
        max_packets, ds.num_packets
    )
    srcs = [s for s in sources
            if not (s == "dnn" and predictions is None)
            and not (s == "lmmse" and ds.h_mmse is None)]

    pools = {"ls": ds.h_ls, "lmmse": ds.h_mmse, "dnn": predictions,
             "perfect": ds.h_perfect}
    # (n, n_src, C, Nt, Nr) host stack — per-chunk device transfer below
    csi_host = np.stack([pools[s][:n] for s in srcs], axis=1)

    def one_packet(pkt_key, eval_key, csi_srcs, snr_cs, noise_db):
        chan = realize_channel(
            cfg, jax.random.split(pkt_key, 3)[0], ds.scenario
        )

        def one_source(csi):
            # SINR-mode datasets were sounded at preamp gain 0; the
            # data leg must follow the same convention (ds.noise_db is
            # the absolute noise+interference floor, not spLoss-scaled)
            gain = 0.0 if ds.noise_mode == "sinr" else None
            return run_data_transmission(
                cfg, eval_key, ds.scenario, chan, csi, noise_db, snr_cs,
                fft_size=fft_size, gain_db=gain,
            )

        return jax.vmap(one_source)(csi_srcs)

    @jax.jit
    def run_chunk(pkt_keys, eval_keys, csi, snr_cs, noise_db):
        return jax.vmap(one_packet)(pkt_keys, eval_keys, csi, snr_cs,
                                    noise_db)

    base_eval = jax.random.PRNGKey(seed)
    ref = put_complex(ds.h_perfect[:n])

    ber = np.zeros((n, len(srcs)))
    evm = np.zeros((n, len(srcs)))
    bf = np.zeros((n, len(srcs)))
    for start in range(0, n, chunk):
        stop = min(start + chunk, n)
        ps = jnp.arange(start, stop)
        pkt_keys = jax.vmap(ds.packet_key)(ps)
        eval_keys = jax.vmap(lambda p: jax.random.fold_in(base_eval, p))(ps)
        r = run_chunk(
            pkt_keys, eval_keys,
            put_complex(csi_host[start:stop]),
            jnp.asarray(ds.snr_cs[start:stop]),
            jnp.asarray(ds.noise_db[start:stop]),
        )
        ber[start:stop] = np.asarray(r.ber)
        evm[start:stop] = np.asarray(r.evm)
        bf[start:stop] = np.asarray(r.bf_gain)

    out = {}
    for i, s in enumerate(srcs):
        nm = np.asarray(nmse_subk(ref, put_complex(pools[s][:n])))
        out[s] = ClosedLoopMetrics(
            ber=ber[:, i], evm=evm[:, i], nmse=nm, bf_gain=bf[:, i]
        )
    return out
