"""On-device dataset generation + container.

Replaces the reference's three-stage filesystem pipeline —
MATLAB ``generate_maMIMO_LTF`` → .mat → ``create_massiveMIMO_CSIest_dnn_dataset.py``
→ pickle → per-sample Python dict lookups in ``DataGenerator``
(massiveMIMO_dataGenerator.py:294-316) — with a single on-device
generator whose output arrays are gathered into batches *inside jit*.

Sample ordering contract (must match the reference converter so the
closed-loop evaluator can reshape predictions,
create_massiveMIMO_CSIest_dnn_dataset.py:62):

    sample_ix = pkt * (num_rx * num_tx) + i_rx * num_tx + i_tx
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mamimo_tpu.config import SimConfig
from mamimo_tpu.channel.scattering import Scenario, make_scenario
from mamimo_tpu.ops.ltf import gen_preamble, pilot_p_matrix
from mamimo_tpu.pipeline.sounding import sound_packet


@dataclasses.dataclass
class CSIDataset:
    """Generated sounding dataset (the ``usr_data`` + pickle ``dataset.b``
    equivalent, kept as dense arrays)."""

    cfg: SimConfig
    rx: np.ndarray           # (B, len_ltf, num_rx) complex64 received LTFs
    h_ls: np.ndarray         # (B, C, num_tx, num_rx) complex64 LS labels
    h_perfect: np.ndarray    # (B, C, num_tx, num_rx) oracle CSI
    snr_cs: np.ndarray       # (B, num_rx) realized sounding SNR [dB]
    noise_db: np.ndarray     # (B,) applied noise power [dB]
    tau: np.ndarray          # (B, n_scatterers) path delays [s]
    chan_delay: np.ndarray   # (B,) int32
    snr_target: float
    seed: int
    scenario: Scenario
    h_mmse: Optional[np.ndarray] = None   # (B, C, num_tx, num_rx) or None
    ber: Optional[np.ndarray] = None      # (B,) per-packet LS-CSI BER
                                          # (usr_data{u,5}, the
                                          # isOnlyCSI=false leg)
    user: int = 0                         # which user (multi-user gen)
    noise_mode: str = "snr"               # receiver convention used at
                                          # generation (the SINR mode's
                                          # gain-0 preamp must carry
                                          # into the data-leg evaluator)

    # ------------------------------------------------------------------
    @property
    def num_packets(self) -> int:
        return self.rx.shape[0]

    @property
    def num_samples(self) -> int:
        return self.num_packets * self.cfg.num_tx * self.cfg.num_rx

    def decompose_index(self, idx):
        """sample index -> (packet, i_tx, i_rx), vector-safe."""
        per_pkt = self.cfg.num_tx * self.cfg.num_rx
        p = idx // per_pkt
        rem = idx % per_pkt
        i_rx = rem // self.cfg.num_tx
        i_tx = rem % self.cfg.num_tx
        return p, i_tx, i_rx

    def pilot_matrix(self) -> np.ndarray:
        return np.asarray(pilot_p_matrix(self.cfg.num_tx))

    def rx_planes(self, dtype=np.float32) -> np.ndarray:
        """The received preambles in the framework's CANONICAL deploy
        layout: FLAT rx-major planes (2, B·num_rx, len_ltf) —
        [0]=real, [1]=imag, sample s = packet·num_rx + rx_antenna.

        This is the layout every device loader actually ships (complex
        arrays cannot cross the host↔device boundary on the TPU
        backend — see utils.numerics.put_complex) and the hot
        estimation paths consume without any transpose or relayout
        (ls_estimate_planes / predict_all_pairs_planes_flat /
        ls_planes_pallas). dtype=np.float32 default; bfloat16 via
        ml_dtypes is the half-traffic deploy option.
        """
        b, L, r = self.rx.shape
        rxm = np.transpose(self.rx, (0, 2, 1)).reshape(b * r, L)
        return np.stack([np.real(rxm), np.imag(rxm)]).astype(dtype)

    # ------------------------------------------------------------------
    def packet_key(self, p: int):
        """Regenerate the per-packet channel key (the prm.seed_p contract:
        seeds persisted with the dataset, generate_maMIMO_LTF.m:33-41).
        For multi-user experiments the per-user fold used at generation
        (pipeline.multiuser.user_packet_key) is applied too."""
        base = jax.random.PRNGKey(self.seed)
        _, key_pkts = jax.random.split(base)
        k = jax.random.fold_in(key_pkts, p)
        if self.cfg.num_users > 1:
            from mamimo_tpu.pipeline.multiuser import user_packet_key

            k = user_packet_key(k, self.user)
        return k

    # ------------------------------------------------------------------
    def extract_packets(self, n: int, reverse: bool = True) -> "CSIDataset":
        """Slice the first (or last) n packets — ``extract_pkt.m``.

        The BER evaluator takes the *last* n packets (isReverse=true,
        BER_test_maMIMO_LTF.m:5), matching the by-packet tail val split.
        """
        if reverse:
            sl = slice(self.num_packets - n, self.num_packets)
        else:
            sl = slice(0, n)
        kw = {}
        if self.h_mmse is not None:
            kw["h_mmse"] = self.h_mmse[sl]
        if self.ber is not None:
            kw["ber"] = self.ber[sl]
        return dataclasses.replace(
            self,
            rx=self.rx[sl],
            h_ls=self.h_ls[sl],
            h_perfect=self.h_perfect[sl],
            snr_cs=self.snr_cs[sl],
            noise_db=self.noise_db[sl],
            tau=self.tau[sl],
            chan_delay=self.chan_delay[sl],
            **kw,
        )

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        scen = {f"scenario_{k}": np.asarray(v)
                for k, v in self.scenario._asdict().items()}
        np.savez_compressed(
            path,
            rx=self.rx,
            h_ls=self.h_ls,
            h_perfect=self.h_perfect,
            snr_cs=self.snr_cs,
            noise_db=self.noise_db,
            tau=self.tau,
            chan_delay=self.chan_delay,
            h_mmse=(self.h_mmse if self.h_mmse is not None
                    else np.zeros(0, np.complex64)),
            meta=np.frombuffer(
                json.dumps(
                    {"cfg": json.loads(self.cfg.to_json()),
                     "snr_target": self.snr_target,
                     "seed": self.seed,
                     "user": self.user,
                     "noise_mode": self.noise_mode}
                ).encode(), dtype=np.uint8),
            **scen,
        )

    def save_raw(self, path: str) -> None:
        """Write the mmap-friendly raw container consumed by the native
        C++ streaming loader (data/native_loader.py)."""
        from mamimo_tpu.data.native_loader import write_raw

        write_raw(path, self.rx, self.h_ls)

    @classmethod
    def load(cls, path: str) -> "CSIDataset":
        z = np.load(path)
        meta = json.loads(bytes(z["meta"]).decode())
        cfg = SimConfig(**meta["cfg"])
        scen = Scenario(**{
            k[len("scenario_"):] : jnp.asarray(z[k])
            for k in z.files if k.startswith("scenario_")
        })
        h_mmse = z["h_mmse"] if z["h_mmse"].size else None
        return cls(
            cfg=cfg,
            rx=z["rx"],
            h_ls=z["h_ls"],
            h_perfect=z["h_perfect"],
            snr_cs=z["snr_cs"],
            noise_db=z["noise_db"],
            tau=z["tau"],
            chan_delay=z["chan_delay"],
            snr_target=meta["snr_target"],
            seed=meta["seed"],
            scenario=scen,
            h_mmse=h_mmse,
            user=int(meta.get("user", 0)),
            noise_mode=meta.get("noise_mode", "snr"),
        )


def generate_dataset(
    cfg: SimConfig,
    seed: int,
    num_packets: int,
    snr_db: float,
    with_mmse: bool = False,
    noise_mode: str = "snr",
    chunk: int = 32,
    fft_size: int | None = None,
    scenario: Scenario | None = None,
    user: int = 0,
    with_ber: bool = False,
    interference_dbm: float = -55.0,
    mmse_estimator: str = "cg",
    mmse_n_iter: int = 16,
    fetch_dtype: str = "f32",
) -> CSIDataset:
    """Generate a sounding dataset on device.

    One experiment = one fixed user placement (scenario) + per-packet
    channel realizations (generate_maMIMO_LTF.m:33-51). Packets are
    produced in jit-compiled vmapped chunks (the `screen` process fanout
    of full_pipeline_maMIMO_DNNEst.sh:14-17 becomes a batch axis).

    Args:
      user: with cfg.num_users > 1, which user's dataset to emit (the
        converter's --user flag; per-user channels drawn per the
        prm.seed_p{u} contract).
      with_ber: also run the data-transmission leg per packet with the
        LS CSI and record its BER (the isOnlyCSI=false path,
        generate_maMIMO_LTF.m:403-640 + usr_data{u,5}).
      fetch_dtype: 'f32' (exact) or 'bf16' — drain the complex corpus
        planes at bfloat16, halving device→host bytes on tunnel-bound
        fetches (−50 dB quantization, below any operating noise floor;
        measured end-to-end in results/gen_bench_r5.json). Refused for
        noiseless (SNR ≥ 60 dB) label generation, where −50 dB is NOT
        below the floor.
    """
    from mamimo_tpu.utils.numerics import put_complex

    base = jax.random.PRNGKey(seed)
    key_scen, key_pkts = jax.random.split(base)
    if scenario is not None:
        scen = scenario
    elif cfg.num_users > 1:
        from mamimo_tpu.pipeline.multiuser import index_user, make_scenarios

        scen = index_user(make_scenarios(cfg, key_scen), user)
    else:
        scen = make_scenario(cfg, key_scen)
    # host NumPy preamble, placed on device via float-plane transfer and
    # passed as a jit argument (complex device_put is unimplemented on
    # the tunneled TPU backend; no multi-MB literals in the program)
    preamble = put_complex(gen_preamble(cfg, cfg.num_tx))

    def one(k, pre):
        if cfg.num_users > 1:
            from mamimo_tpu.pipeline.multiuser import user_packet_key

            k_chan = user_packet_key(k, user)
        else:
            k_chan = k
        res, chan = sound_packet(
            cfg, k_chan, scen, snr_db, preamble=pre, with_mmse=with_mmse,
            noise_mode=noise_mode, fft_size=fft_size,
            interference_dbm=interference_dbm,
            mmse_estimator=mmse_estimator, mmse_n_iter=mmse_n_iter,
        )
        if with_ber:
            from mamimo_tpu.config import default_fft_size
            from mamimo_tpu.pipeline.datatx import run_data_transmission

            # the data leg carries preamble + data frame: resolve the
            # default here (2*None would crash; None means "auto")
            data_fft = (default_fft_size(cfg, data_leg=True)
                        if fft_size is None else 2 * fft_size)
            dt = run_data_transmission(
                cfg, jax.random.fold_in(k, 7777), scen, chan, res.h_ls,
                res.noise_db, res.snr_cs, fft_size=data_fft,
                # SINR-mode sounding runs at preamp gain 0 — the data
                # leg must too (generate_maMIMO_LTF_SINR.m:466,488-491)
                gain_db=0.0 if noise_mode == "sinr" else None,
            )
            ber = dt.ber
        else:
            ber = jnp.zeros(())
        return res, ber

    batched = jax.jit(jax.vmap(one, in_axes=(0, None)))

    from mamimo_tpu.utils.numerics import fetch_tree

    assert fetch_dtype in ("f32", "bf16"), fetch_dtype
    if fetch_dtype == "bf16":
        # −50 dB quantization is below the noise floor only at
        # operating SNRs; noiseless label corpora must stay exact
        assert snr_db < 60.0, (
            "bf16 fetch would quantize noiseless labels; use f32")
    fdt = jnp.bfloat16 if fetch_dtype == "bf16" else None

    outs = []
    bers = []
    pending = None
    for start in range(0, num_packets, chunk):
        n = min(chunk, num_packets - start)
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            key_pkts, jnp.arange(start, start + n)
        )
        # double-buffered: dispatch chunk k (async) BEFORE fetching
        # chunk k-1, so the device computes while the host drains the
        # previous chunk's arrays — wall becomes max(compute, fetch)
        # instead of their sum. fetch_tree: complex leaves come back as
        # float-plane transfers (complex host<->device copies are
        # unimplemented on the tunneled TPU backend).
        dev = batched(keys, preamble)
        if pending is not None:
            res, ber = fetch_tree(pending, fetch_dtype=fdt)
            outs.append(res)
            bers.append(ber)
        pending = dev
    if pending is not None:
        res, ber = fetch_tree(pending, fetch_dtype=fdt)
        outs.append(res)
        bers.append(ber)

    def cat(name):
        return np.concatenate([getattr(o, name) for o in outs], axis=0)

    return CSIDataset(
        cfg=cfg,
        rx=cat("rx"),
        h_ls=cat("h_ls"),
        h_perfect=cat("h_perfect"),
        h_mmse=cat("h_mmse") if with_mmse else None,
        snr_cs=cat("snr_cs"),
        noise_db=cat("noise_db"),
        tau=cat("tau"),
        chan_delay=cat("chan_delay"),
        snr_target=float(snr_db),
        seed=seed,
        scenario=scen,
        ber=np.concatenate(bers) if with_ber else None,
        user=user,
        noise_mode=noise_mode,
    )
