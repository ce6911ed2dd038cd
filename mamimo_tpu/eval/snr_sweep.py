"""SNR sweep driver + aggregation + plots.

Replaces the `screen`-fanout per-SNR MATLAB jobs and
``snr_loop_testing.m``: generate (or load) a test set per SNR level, run
the DNN and the closed loop, aggregate means with 95% t-confidence
intervals (``compute_CI``, snr_loop_testing.m:112-116), and emit the four
reference plots (BER / EVM / MSE / beamforming gain vs SNR).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from mamimo_tpu.config import SimConfig, TrainConfig
from mamimo_tpu.eval.closed_loop import evaluate_closed_loop, nmse_vs_snr
from mamimo_tpu.pipeline.dataset import CSIDataset, generate_dataset


def compute_ci(x: np.ndarray, alpha: float = 0.05):
    """95% t-distribution confidence interval of the mean
    (snr_loop_testing.m:112-116)."""
    x = np.asarray(x, np.float64)
    n = len(x)
    sem = np.std(x, ddof=1) / np.sqrt(n) if n > 1 else 0.0
    try:
        from scipy import stats
        ts = stats.t.ppf([alpha / 2, 1 - alpha / 2], n - 1)
    except Exception:                                   # pragma: no cover
        ts = np.asarray([-1.96, 1.96])
    return (float(np.mean(x) + ts[0] * sem), float(np.mean(x) + ts[1] * sem))


@dataclasses.dataclass
class SweepResult:
    snr_levels: List[float]
    # metric[source][snr_index]
    nmse: Dict[str, List[float]]
    nmse_ci: Dict[str, List[tuple]]
    ber: Dict[str, List[float]]
    evm: Dict[str, List[float]]
    bf_gain: Dict[str, List[float]]

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())


def run_snr_sweep(
    cfg: SimConfig,
    snr_levels: Sequence[float],
    num_packets: int,
    seed: int = 0,
    predictor=None,
    closed_loop: bool = False,
    max_cl_packets: int = 50,
    with_mmse: bool = True,
    chunk: int = 16,
    datasets: Optional[Dict[float, CSIDataset]] = None,
    verbose: bool = True,
    scenario=None,
) -> SweepResult:
    """Evaluate estimators across an SNR sweep.

    Args:
      predictor: optional callable ds -> (B, C, Nt, Nr) complex DNN CSI.
      closed_loop: also run the (slow) BER/EVM/BF-gain loop.
      datasets: optional pre-generated {snr: dataset} (else generated
        here with the SAME experiment seed per level, mirroring the
        shared-scenario SNR loop of snr_loop.m).
      scenario: optional fixed user placement — pass the TRAINING
        scenario to reproduce the reference's shared-placement contract
        (its rng(67) fixes mobileRanges/Angles across train and every
        test set, generate_maMIMO_LTF.m:43-51) while the packet channel
        seeds still come from `seed`.
    """
    sources = ["ls"] + (["lmmse"] if with_mmse else []) + (
        ["dnn"] if predictor is not None else []
    )
    out = SweepResult(
        snr_levels=list(map(float, snr_levels)),
        nmse={s: [] for s in sources},
        nmse_ci={s: [] for s in sources},
        ber={s: [] for s in sources + ["perfect"]},
        evm={s: [] for s in sources + ["perfect"]},
        bf_gain={s: [] for s in sources + ["perfect"]},
    )
    for snr in snr_levels:
        if datasets is not None and snr in datasets:
            ds = datasets[snr]
        else:
            ds = generate_dataset(
                cfg, seed=seed, num_packets=num_packets, snr_db=snr,
                with_mmse=with_mmse, chunk=chunk, scenario=scenario,
            )
        preds = predictor(ds) if predictor is not None else None
        per_pkt = nmse_vs_snr(ds, preds)
        for s in sources:
            if s not in per_pkt:
                # e.g. caller-supplied dataset without h_mmse: keep the
                # series aligned with NaNs rather than KeyError-ing
                out.nmse[s].append(float("nan"))
                out.nmse_ci[s].append((float("nan"), float("nan")))
                continue
            vals = per_pkt[s]
            out.nmse[s].append(float(np.mean(vals)))
            out.nmse_ci[s].append(compute_ci(vals))
        if closed_loop:
            cl = evaluate_closed_loop(
                ds, predictions=preds,
                sources=tuple(sources) + ("perfect",),
                max_packets=max_cl_packets,
            )
            # NaN-pad skipped sources so every series stays aligned
            # with snr_levels (same policy as the NMSE branch above)
            for s in out.ber:
                if s in cl:
                    out.ber[s].append(float(np.mean(cl[s].ber)))
                    out.evm[s].append(float(np.mean(cl[s].evm)))
                    out.bf_gain[s].append(float(np.mean(cl[s].bf_gain)))
                else:
                    out.ber[s].append(float("nan"))
                    out.evm[s].append(float("nan"))
                    out.bf_gain[s].append(float("nan"))
        if verbose:
            msg = f"[sweep] SNR {snr:+.0f} dB: " + "  ".join(
                f"{s} NMSE {10*np.log10(out.nmse[s][-1]+1e-30):.2f} dB"
                for s in sources
            )
            print(msg)
    return out


def plot_sweep(result: SweepResult, outdir: str) -> None:
    """The four reference plots (snr_loop_testing.m:67-107)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:                                   # pragma: no cover
        return
    os.makedirs(outdir, exist_ok=True)
    snr = result.snr_levels
    styles = {"ls": "-o", "lmmse": "-x", "dnn": "-*", "perfect": "-s"}
    labels = {"ls": "LS", "lmmse": "MMSE", "dnn": "Proposed",
              "perfect": "Perfect"}

    def plot(metric: Dict[str, list], name: str, ylabel: str, logy: bool):
        if not any(len(v) for v in metric.values()):
            return
        plt.figure()
        for s, vals in metric.items():
            if not vals:
                continue
            if logy:
                plt.semilogy(snr, vals, styles.get(s, "-"),
                             label=labels.get(s, s))
            else:
                plt.plot(snr, vals, styles.get(s, "-"),
                         label=labels.get(s, s))
        plt.grid(True)
        plt.xlabel("SNR (dB)")
        plt.ylabel(ylabel)
        plt.legend()
        plt.savefig(os.path.join(outdir, name + ".png"))
        plt.close()

    plot(result.nmse, "MSE", "NMSE", logy=True)
    plot(result.ber, "BER", "Bit error rate (BER)", logy=True)
    plot(result.evm, "EVM", "EVM RMS (%)", logy=False)
    plot(result.bf_gain, "BeamformGain", "Beamforming gain (dB)", logy=False)


def run_mu_snr_sweep(
    cfg: SimConfig,
    snr_levels: Sequence[float],
    num_packets: int,
    seed: int = 0,
    sources: Sequence[str] = ("ls", "perfect"),
    fft_size: int = 16384,
    chunk: int = 8,
    verbose: bool = True,
    dnn_models=None,
    tcfg: Optional[TrainConfig] = None,
) -> dict:
    """Multi-user closed-loop sweep (the numUsers>1 branch the CLI now
    reaches, generate_maMIMO_LTF.m:427-440,531-640): per SNR level,
    sound `num_packets` packets to all users, JSDM-precode from each CSI
    source, decode every user, and aggregate per-(source, user)
    BER/EVM/BF-gain with 95% CIs. The (packet × user) grid is one
    vmapped program per chunk.

    Note: JSDM block-diagonalization assumes spatially separable users
    (as does the MathWorks example this re-derives). For nearly
    collinear placements the interference null eats the own-signal gain
    and closed-loop results become placement-dominated — pick the seed
    (user placement) accordingly (see tests/test_multiuser.py fixture).

    Args (beyond the single-user sweep):
      dnn_models: per-user DNN CSI source (the reference evaluates the
        DNN inside the full beamforming loop, BER_test_maMIMO_LTF.m:347;
        its generator trains per-user models on per-user channels,
        generate_maMIMO_LTF.m:427-440): stacked (params, bn_state)
        pytrees whose leaves carry a LEADING user axis (one trained
        model per user, trained on generate_dataset(user=u)). Required
        when 'dnn' ∈ sources.
      tcfg: the TrainConfig the models were trained with.

    Returns a JSON-ready dict
      {"snr": [...], "num_users": U,
       "sources": {src: {"ber": [[per-user]...], "evm": ..,
                         "bf_gain": .., "ber_ci": ..}}}
    """
    import jax
    import jax.numpy as jnp

    from mamimo_tpu.pipeline.datatx import run_data_transmission_mu
    from mamimo_tpu.pipeline.multiuser import make_scenarios, sound_packet_mu

    assert cfg.num_users > 1, "run_mu_snr_sweep needs num_users > 1"
    srcs = tuple(sources)
    if "dnn" in srcs and dnn_models is None:
        raise ValueError("'dnn' source needs dnn_models=(params, bn) "
                         "with a leading per-user axis")
    base = jax.random.PRNGKey(seed)
    scens = make_scenarios(cfg, base)
    with_mmse = "lmmse" in srcs

    def one_packet(k, snr, models):
        res, chans = sound_packet_mu(cfg, k, scens, snr_db=snr,
                                     with_mmse=with_mmse,
                                     fft_size=fft_size)
        pools = {"ls": res.h_ls, "perfect": res.h_perfect,
                 "lmmse": res.h_mmse}
        if "dnn" in srcs:
            from mamimo_tpu.models.mlp import predict_all_pairs

            mp, mb = models
            pools["dnn"] = jax.vmap(
                lambda p, b, rx: predict_all_pairs(
                    cfg, tcfg or TrainConfig(), p, b, rx[None])[0]
            )(mp, mb, res.rx)                  # (U, C, Nt, Nr)
        return {
            s: run_data_transmission_mu(
                cfg, jax.random.fold_in(k, 77), scens, chans, pools[s],
                res.noise_db, res.snr_cs, fft_size=fft_size)
            for s in srcs
        }

    run_chunk = jax.jit(jax.vmap(one_packet, in_axes=(0, None, None)))

    out = {"snr": list(map(float, snr_levels)),
           "num_users": cfg.num_users,
           "sources": {s: {"ber": [], "evm": [], "bf_gain": [],
                           "ber_ci": []} for s in srcs}}
    for snr in snr_levels:
        accum = {s: {"ber": [], "evm": [], "bf": []} for s in srcs}
        for start in range(0, num_packets, chunk):
            n = min(chunk, num_packets - start)
            keys = jax.vmap(
                lambda p: jax.random.fold_in(base, 10_000 + p)
            )(jnp.arange(start, start + n))
            r = run_chunk(keys, float(snr), dnn_models)
            for s in srcs:
                accum[s]["ber"].append(np.asarray(r[s].ber))   # (n, U)
                accum[s]["evm"].append(np.asarray(r[s].evm))
                accum[s]["bf"].append(np.asarray(r[s].bf_gain))
        for s in srcs:
            ber = np.concatenate(accum[s]["ber"])              # (P, U)
            evm = np.concatenate(accum[s]["evm"])
            bf = np.concatenate(accum[s]["bf"])
            out["sources"][s]["ber"].append(ber.mean(0).tolist())
            out["sources"][s]["evm"].append(evm.mean(0).tolist())
            out["sources"][s]["bf_gain"].append(bf.mean(0).tolist())
            out["sources"][s]["ber_ci"].append(
                [list(compute_ci(ber[:, u])) for u in range(ber.shape[1])])
        if verbose:
            print(f"[mu-sweep] SNR {snr:+.0f} dB: " + "  ".join(
                f"{s} BER {np.mean(out['sources'][s]['ber'][-1]):.4f}"
                for s in srcs))
    return out
