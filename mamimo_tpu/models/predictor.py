"""Deployment inference wrapper — the ``CSIPredictor`` capability of
``inference.py:6-68``: load a trained checkpoint, run complex-valued
prediction through the two real-plane networks, with per-experiment
pre/post-processing hooks (including the RICE_RENEW null-subcarrier
reinsertion + ifftshift of ``inference.py:48-68``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from mamimo_tpu.config import SimConfig, TrainConfig
from mamimo_tpu.models.mlp import predict_complex
from mamimo_tpu.utils.numerics import get_complex, put_complex
from mamimo_tpu.train.ckpt import load_checkpoint


class CSIPredictor:
    """Load a trained model directory and serve complex CSI predictions."""

    def __init__(self, model_path: str, experiment: str = "matlab_maMimo",
                 verbose: bool = False):
        self.path = model_path
        self.experiment = experiment
        self.verbose = verbose
        ck = load_checkpoint(os.path.join(model_path, "best"))
        self.cfg: SimConfig = ck["cfg"]
        self.tcfg: TrainConfig = ck["tcfg"]
        self.params = ck["params"]
        self.bn_state = ck["bn_state"]
        self._qparams = None
        self._serve_fn = None
        self._serve_consts = None
        if verbose:
            n = sum(int(np.prod(l.shape))
                    for l in jax.tree.leaves(self.params))
            print(f"[CSIPredictor] loaded {model_path}: {n} params")

    def all_pairs(self, rx_planes: np.ndarray,
                  int8: bool = False) -> np.ndarray:
        """All-pairs CSI from rx-major planes (2, B, num_rx, len_ltf)
        float32 — the deployment estimation call (one factored layer-1
        matmul shared by every pilot head).

        int8=True serves the quantized path (models/quant.py): int8
        weights folded once on first use. NOTE: measured round 3, int8
        arithmetic is NOT faster than bf16 on this TPU stack (1.0× in
        an identical Pallas kernel structure, PERF.md) — it remains a
        weight/activation MEMORY option (<0.05 dB NMSE impact,
        tests/test_quant.py).

        Returns:
          (B, num_rx, num_tx, num_carriers) complex64.
        """
        from mamimo_tpu.models.mlp import predict_all_pairs_planes

        x = jnp.asarray(rx_planes, jnp.float32)
        if int8:
            from mamimo_tpu.models.quant import (
                predict_all_pairs_planes_int8,
                quantize_params_int8,
            )

            if self._qparams is None:
                self._qparams = jax.jit(
                    lambda p, b: quantize_params_int8(
                        self.tcfg, p, b, sig_len=self.cfg.len_ltf)
                )(self.params, self.bn_state)
            y = predict_all_pairs_planes_int8(
                self.cfg, self.tcfg, self._qparams, x)
        else:
            y = predict_all_pairs_planes(
                self.cfg, self.tcfg, self.params, self.bn_state, x)
        return get_complex(y)

    def estimate_full(self, rx_planes_flat: np.ndarray):
        """The round-3 PRODUCTION serving call: fused LS + DNN from the
        canonical FLAT planes layout (2, S, len_ltf), S = B·num_rx —
        the path `bench.py` measures at 22.7–24.8 M estimates/s/chip
        (`pallas_ls_v2_serving_r3`).

        On TPU the LS half runs the v2 Pallas kernel
        (ops/pallas/fused_ls.py::ls_planes_pallas_v2, bf16 in, merged
        complex dots, decoupled DMA/despread blocks); elsewhere it falls
        back to the algebraically identical XLA planes form. The DNN
        half is the factored all-pairs bf16 MLP.

        Returns:
          (h_ls, h_dnn): each (S, num_tx, num_carriers) complex64.
        """
        from mamimo_tpu.models.mlp import _factored_all_pairs

        cfg, tcfg = self.cfg, self.tcfg
        on_tpu = jax.devices()[0].platform not in ("cpu",)
        if self._serve_fn is None:
            nsym, nc = cfg.num_tx, cfg.num_carriers
            if on_tpu:
                from mamimo_tpu.ops.pallas import (
                    ls_planes_pallas_v2_constants,
                )
                from mamimo_tpu.ops.pallas.fused_ls import (
                    ls_planes_pallas_v2,
                )

                block = 8
                dma = max(block, 1024 // cfg.num_tx)
                consts = ls_planes_pallas_v2_constants(
                    cfg, block, dtype=jnp.bfloat16)

                @jax.jit
                def serve(p, bn, c, planes):
                    s = planes.shape[1]
                    pl16 = planes.astype(jnp.bfloat16)
                    h, _ = ls_planes_pallas_v2(
                        cfg, pl16, c, block_samples=block,
                        dma_samples=dma)
                    cp_ = h.shape[1] // 2
                    ls2 = jnp.stack([
                        h[: s * nsym, :nc].reshape(s, nsym, nc),
                        h[: s * nsym, cp_:cp_ + nc].reshape(s, nsym, nc),
                    ]).astype(jnp.float32)
                    y2 = _factored_all_pairs(cfg, tcfg, p, bn, pl16,
                                             dtype=jnp.bfloat16)
                    return ls2, y2.astype(jnp.float32)
            else:
                from mamimo_tpu.ops.estimate import (
                    ls_estimate_planes,
                    ls_planes_constants,
                )

                consts = ls_planes_constants(cfg)

                @jax.jit
                def serve(p, bn, c, planes):
                    h = ls_estimate_planes(cfg, planes, c)
                    ls2 = jnp.stack([jnp.real(h), jnp.imag(h)])
                    y2 = _factored_all_pairs(cfg, tcfg, p, bn, planes)
                    return ls2, y2

            self._serve_consts = consts
            self._serve_fn = serve
        x = jnp.asarray(rx_planes_flat, jnp.float32)
        ls2, y2 = self._serve_fn(self.params, self.bn_state,
                                 self._serve_consts, x)
        to_c = lambda a: (np.asarray(a[0], np.float32)
                          + 1j * np.asarray(a[1], np.float32))
        return to_c(ls2), to_c(y2)

    def inference(self, input_batch: np.ndarray, pilot: np.ndarray):
        """input_batch: (B, len_ltf) complex; pilot: (B, num_tx).

        Returns post-processed (B, out) complex prediction.
        """
        x = self.preprocess_data(input_batch)
        y = predict_complex(
            self.cfg, self.tcfg, self.params, self.bn_state,
            put_complex(x), jnp.asarray(pilot, jnp.float32),
        )
        return self.postprocess_data(get_complex(y))

    # ------------------------------------------------------------------
    def preprocess_data(self, input_batch: np.ndarray) -> np.ndarray:
        if self.experiment == "RICE_RENEW":
            if input_batch.dtype != np.complex128:
                raise TypeError(
                    "[CSIPredictor] input batch must be complex128 for "
                    "RICE_RENEW (inference.py:41-43)"
                )
        return input_batch

    def postprocess_data(self, out: np.ndarray) -> np.ndarray:
        if self.experiment == "RICE_RENEW":
            # reinsert null subcarriers and undo the fftshift
            # (inference.py:52-66; assumes FFT 64 / 52 active tones)
            if out.shape[1] != 52:
                raise ValueError(
                    "[CSIPredictor] RICE_RENEW output must have 52 tones"
                )
            b = out.shape[0]
            tmp = np.concatenate(
                [np.zeros((b, 6), out.dtype), out[:, :26],
                 np.zeros((b, 1), out.dtype), out[:, 26:],
                 np.zeros((b, 5), out.dtype)], axis=1,
            )
            return np.fft.ifftshift(tmp, axes=1)
        return out
